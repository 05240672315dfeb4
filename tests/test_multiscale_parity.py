"""Multi-scale extraction parity vs a torch oracle implementing the
reference's ``extract_ms`` semantics (SURVEY.md §7 hard parts: "order of L2N
vs sum changes results"): per-scale descriptors are raised to ``msp``
(GeM's p for whitening-free GeM nets), MEAN-ed over scales, root-ed, then
L2-normalized once.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from irtpu.api import Extractor
from irtpu.models.torch_port import port_retrieval_net
from irtpu.utils.config import ExtractConfig, ModelConfig


def _torch_ms_descriptor(tm, x_nchw, scales, p):
    """cirtorch extract_ms semantics with a GeM head, torch CPU."""
    import torch
    import torch.nn.functional as F

    def net(inp):
        f = tm(inp)
        pooled = F.avg_pool2d(f.clamp(min=1e-6).pow(p), f.shape[-2:]).pow(1.0 / p)
        pooled = pooled.squeeze(-1).squeeze(-1)
        return pooled / (pooled.norm(dim=1, keepdim=True) + 1e-6)

    with torch.no_grad():
        v = torch.zeros(1, 512)
        for s in scales:
            if s == 1.0:
                inp = x_nchw
            else:
                inp = F.interpolate(
                    x_nchw, scale_factor=s, mode="bilinear", align_corners=False
                )
            v += net(inp).pow(p)
        v /= len(scales)
        v = v.pow(1.0 / p)
        v = v / (v.norm(dim=1, keepdim=True) + 1e-6)
        return v.numpy()


@pytest.mark.parametrize("scales", [(1.0, 2 ** -0.5), (1.0, 2 ** -0.5, 0.5)])
def test_multiscale_matches_torch_oracle(scales):
    import torch

    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_oracles import resnet18_trunk, randomize_bn_stats

    tm = randomize_bn_stats(resnet18_trunk(), 5).eval()
    p = 3.0
    rng = np.random.RandomState(0)
    x = rng.rand(1, 96, 128, 3).astype(np.float32)

    want = _torch_ms_descriptor(
        tm, torch.from_numpy(x.transpose(0, 3, 1, 2)), scales, p
    )

    sd = {f"features.{k}": v for k, v in tm.state_dict().items()}
    sd["pool.p"] = torch.tensor(p)
    variables = jax.tree.map(jnp.asarray, port_retrieval_net(sd, "resnet18"))

    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="gem"),
        image_size=128,
        batch_size=1,
        scales=scales,
    )
    ex = Extractor(cfg, variables=variables)
    got = ex(x)  # direct batched call, full-valid mask
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
