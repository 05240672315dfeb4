"""Model zoo/meta factory, debug guards, prefetch + resumable extraction."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from irtpu.models.zoo import (
    MODEL_ZOO,
    create_model_from_meta,
    create_model_from_zoo,
    model_to_meta,
    load_model,
)
from irtpu.utils.debug import debug_checks, assert_deterministic


def test_meta_roundtrip():
    m = create_model_from_zoo("resnet18-gem")
    meta = model_to_meta(m)
    m2 = create_model_from_meta(meta)
    assert m2.arch == m.arch and m2.pooling == m.pooling


def test_zoo_unknown_raises():
    with pytest.raises(KeyError, match="unknown zoo model"):
        create_model_from_zoo("nope")


def test_zoo_all_entries_buildable():
    for name in MODEL_ZOO:
        m = create_model_from_zoo(name)
        assert m.out_dim > 0


def test_load_model_torch_pth(tmp_path):
    import torch
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_oracles import resnet18_trunk

    tm = resnet18_trunk()
    sd = {f"features.{k}": v for k, v in tm.state_dict().items()}
    sd["pool.p"] = torch.tensor(3.0)
    path = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": sd, "meta": {"arch": "resnet18"}}, path)
    model, variables = load_model({"arch": "resnet18", "pooling": "gem"}, checkpoint=path)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.tree.map(jnp.asarray, variables)
    d = model.apply(variables, x)
    assert d.shape == (1, 512)


def test_debug_checks_catches_nan():
    with pytest.raises(FloatingPointError):
        with debug_checks():
            jax.jit(lambda x: x / x)(jnp.zeros(4)).block_until_ready()


def test_assert_deterministic():
    f = jax.jit(lambda x: x * 2)
    assert_deterministic(f, jnp.arange(8.0))
    calls = [0]

    def flaky(x):
        calls[0] += 1
        return x + calls[0]

    with pytest.raises(AssertionError, match="nondeterministic"):
        assert_deterministic(flaky, np.zeros(3))


def test_prefetched_iterator():
    from irtpu.api import _prefetched

    assert list(_prefetched(iter(range(10)), 3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("decode failed")

    it = _prefetched(boom(), 2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        list(it)


def test_extract_resumable(tmp_path):
    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    cfg = ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=64, batch_size=2)
    ex = Extractor(cfg)
    rng = np.random.RandomState(0)
    imgs = [rng.rand(48, 64, 3).astype(np.float32) for _ in range(5)]
    d1 = ex.extract_resumable(imgs, str(tmp_path / "cache"), shard_size=2)
    assert d1.shape == (5, 512)
    shards = sorted(os.listdir(tmp_path / "cache"))
    assert len(shards) == 3
    # delete one shard; resume recomputes only it and results are identical
    os.remove(tmp_path / "cache" / shards[1])
    d2 = ex.extract_resumable(imgs, str(tmp_path / "cache"), shard_size=2)
    np.testing.assert_array_equal(d1, d2)
