"""Round-5 VERDICT item 6: reduced reproducer for the VGG16 b32 @1024
compile-helper OOM, plus workaround attempts.

Compiles (never runs) the production u8 extraction program for
vgg16+netvlad at increasing batch, recording pass/fail + error class, then
retries b32 with candidate workarounds (lower scoped-VMEM, f32->bf16 only,
no pallas head).
"""
import json
import os
import sys
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
assert jax.default_backend() == "tpu"

import image_retrieval_for_image_based_localization_tpu.utils.tuning as tuning
from image_retrieval_for_image_based_localization_tpu.api import Extractor
from image_retrieval_for_image_based_localization_tpu.utils.config import (
    ExtractConfig,
    ModelConfig,
)


def try_compile(batch, pallas=True, vmem_kib=None, size=1024):
    if vmem_kib is not None:
        tuning.tpu_compiler_options = (
            lambda v=vmem_kib:
            None if v == 0 else {"xla_tpu_scoped_vmem_limit_kib": str(v)})
    else:
        tuning.tpu_compiler_options = (
            lambda: {"xla_tpu_scoped_vmem_limit_kib": "49152"})
    try:
        ex = Extractor(
            ExtractConfig(
                model=ModelConfig(arch="vgg16", pooling="netvlad",
                                  dtype="bfloat16", use_pallas=pallas),
                image_size=size, batch_size=batch,
            ),
            rng=1,
        )
        px = jnp.zeros((batch, size, size, 3), jnp.uint8)
        sz = jnp.full((batch, 2), size, jnp.int32)
        ex._forward_u8.lower(ex.variables, px, sz).compile()
        return "ok", ""
    except Exception as e:
        tb = traceback.format_exc()
        return type(e).__name__, (str(e)[:300] or tb[-300:])


cases = [
    ("b24_baseline", dict(batch=24)),
    ("b32_baseline", dict(batch=32)),
    ("b32_vmem16mib", dict(batch=32, vmem_kib=16384)),
    ("b32_vmem0", dict(batch=32, vmem_kib=0)),
    ("b32_no_pallas", dict(batch=32, pallas=False)),
    ("b40_baseline", dict(batch=40)),
]
for name, kw in cases:
    status, err = try_compile(**kw)
    print(json.dumps({"case": name, "status": status, "err": err}),
          flush=True)
