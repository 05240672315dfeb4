"""Model layer: shapes, mask invariance, and torch-oracle weight-port parity.

"Same weights ⇒ same descriptors" (SURVEY.md §7 hard parts: parity without
torchvision) — randomized torch trunks are ported through
``models.torch_port`` and must reproduce outputs to f32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from irtpu.models import RetrievalNet, create_model
from irtpu.models.torch_port import port_resnet_trunk, port_vgg_trunk


def _np_input(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestShapes:
    @pytest.mark.parametrize(
        "arch,dim", [("resnet18", 512), ("resnet50", 2048), ("vgg16", 512)]
    )
    def test_descriptor_shape(self, arch, dim):
        model = create_model(arch=arch, pooling="gem")
        x = jnp.asarray(_np_input((2, 64, 64, 3)))
        variables = model.init(jax.random.PRNGKey(0), x)
        d = model.apply(variables, x)
        assert d.shape == (2, dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-4
        )

    def test_netvlad_shape(self):
        model = create_model(arch="resnet18", pooling="netvlad", netvlad_clusters=8)
        x = jnp.asarray(_np_input((1, 64, 64, 3)))
        variables = model.init(jax.random.PRNGKey(0), x)
        d = model.apply(variables, x)
        assert d.shape == (1, 512 * 8)

    def test_whiten_fc(self):
        model = create_model(arch="resnet18", pooling="gem", whiten_dim=128)
        x = jnp.asarray(_np_input((1, 64, 64, 3)))
        variables = model.init(jax.random.PRNGKey(0), x)
        d = model.apply(variables, x)
        assert d.shape == (1, 128)


class TestMaskInvariance:
    def test_padded_equals_unpadded(self):
        """A padded+masked image must produce the same descriptor as unpadded."""
        model = create_model(arch="resnet18", pooling="gem")
        img = _np_input((1, 64, 96, 3), 1)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img))

        d_ref = model.apply(variables, jnp.asarray(img))

        padded = np.zeros((1, 96, 96, 3), np.float32)
        padded[:, :64, :96] = img
        mask = np.zeros((1, 96, 96), bool)
        mask[:, :64, :96] = True
        d_pad = model.apply(variables, jnp.asarray(padded), mask=jnp.asarray(mask))

        # Feature bleed at the pad boundary (conv receptive field) makes this
        # approximate, not bitwise. This is the worst case by construction: a
        # 64x96 input gives a 2x3 feature map where every cell touches the
        # pad; at production sizes (1024px -> 32x32 cells) only the boundary
        # ring is affected. Descriptors are unit-norm: cosine must be ~1,
        # and crucially far above the ~0 cosine of unrelated random images.
        cos = float(np.sum(np.asarray(d_ref) * np.asarray(d_pad)))
        assert cos > 0.97, cos


class TestTorchParity:
    def _compare_trunk(self, torch_model, flax_variables, arch, seed=0, tol=2e-4):
        import torch

        from irtpu.models import ResNetTrunk, VGGTrunk

        x = _np_input((1, 64, 64, 3), seed)
        with torch.no_grad():
            torch_model.eval()
            want = (
                torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        trunk = (
            ResNetTrunk(arch) if arch.startswith("resnet") else VGGTrunk(arch)
        )
        got = np.asarray(trunk.apply(flax_variables, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def test_resnet18_trunk_parity(self):
        from torch_oracles import resnet18_trunk, randomize_bn_stats

        tm = randomize_bn_stats(resnet18_trunk(), 0)
        v = port_resnet_trunk(tm.state_dict(), "resnet18")
        self._compare_trunk(tm, {"params": v["params"], "batch_stats": v["batch_stats"]}, "resnet18")

    def test_resnet50_trunk_parity(self):
        from torch_oracles import resnet50_trunk, randomize_bn_stats

        tm = randomize_bn_stats(resnet50_trunk(), 1)
        v = port_resnet_trunk(tm.state_dict(), "resnet50")
        self._compare_trunk(tm, {"params": v["params"], "batch_stats": v["batch_stats"]}, "resnet50", tol=5e-4)

    def test_vgg16_trunk_parity(self):
        from torch_oracles import VGG16Torch

        tm = VGG16Torch()
        v = port_vgg_trunk(tm.state_dict())
        self._compare_trunk(tm, {"params": v["params"]}, "vgg16", tol=5e-4)

    def test_full_descriptor_parity_resnet18_gem(self):
        """Trunk port + GeM + L2N: full-descriptor torch-vs-jax parity."""
        import torch
        import torch.nn.functional as F

        from torch_oracles import resnet18_trunk, randomize_bn_stats
        from irtpu.models.torch_port import port_retrieval_net

        tm = randomize_bn_stats(resnet18_trunk(), 2).eval()
        p = 3.0
        x = _np_input((1, 64, 64, 3), 3)
        with torch.no_grad():
            f = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            pooled = F.avg_pool2d(f.clamp(min=1e-6).pow(p), f.shape[-2:]).pow(1.0 / p)
            pooled = pooled.squeeze(-1).squeeze(-1)
            want = (pooled / (pooled.norm(dim=1, keepdim=True) + 1e-6)).numpy()

        sd = {f"features.{k}": v for k, v in tm.state_dict().items()}
        sd["pool.p"] = torch.tensor(p)
        variables = port_retrieval_net(sd, "resnet18")
        variables = jax.tree.map(jnp.asarray, variables)
        model = RetrievalNet(arch="resnet18", pooling="gem")
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


    def test_cirtorch_numeric_keys_port_identically(self):
        """cirtorch wraps the trunk in nn.Sequential, renaming resnet keys to
        numeric indices (features.0 = conv1, features.4.0 = layer1.0, ...);
        porting such a checkpoint must produce the same variables as the
        torchvision-named layout."""
        import torch

        from torch_oracles import resnet18_trunk, randomize_bn_stats
        from irtpu.models.torch_port import port_retrieval_net

        tm = randomize_bn_stats(resnet18_trunk(), 4).eval()
        sd_tv = {f"features.{k}": v for k, v in tm.state_dict().items()}
        sd_tv["pool.p"] = torch.tensor(2.7)

        seq = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}
        sd_ct = {}
        for k, v in sd_tv.items():
            if k.startswith("features."):
                rest = k[len("features."):]
                head, _, tail = rest.partition(".")
                k = f"features.{seq[head]}" + ("." + tail if tail else "")
            sd_ct[k] = v

        v_tv = port_retrieval_net(sd_tv, "resnet18")
        v_ct = port_retrieval_net(sd_ct, "resnet18")
        assert jax.tree.structure(v_tv) == jax.tree.structure(v_ct)
        for a, b in zip(jax.tree.leaves(v_tv), jax.tree.leaves(v_ct)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestExtraArchParity:
    def test_alexnet_trunk_parity(self):
        from torch_oracles import AlexNetTorch
        from irtpu.models.torch_port import port_alexnet_trunk
        from irtpu.models.alexnet import AlexNetTrunk
        import torch

        tm = AlexNetTorch().eval()
        v = port_alexnet_trunk(tm.state_dict())
        x = _np_input((1, 128, 128, 3), 20)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(AlexNetTrunk().apply({"params": v["params"]}, jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    def test_squeezenet_trunk_parity_including_ceil_pool(self):
        from torch_oracles import SqueezeNetTorch
        from irtpu.models.torch_port import port_squeezenet_trunk
        from irtpu.models.squeezenet import SqueezeNetTrunk
        import torch

        tm = SqueezeNetTorch().eval()
        v = port_squeezenet_trunk(tm.state_dict())
        # 114: (114-3)=111 odd after conv -> exercises ceil_mode emulation
        for size in (128, 114):
            x = _np_input((1, size, size, 3), 21)
            with torch.no_grad():
                want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
            got = np.asarray(
                SqueezeNetTrunk().apply({"params": v["params"]}, jnp.asarray(x))
            )
            assert got.shape == want.shape, (got.shape, want.shape)
            np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    def test_full_model_shapes(self):
        for arch, dim in (("alexnet", 256), ("squeezenet1_1", 512)):
            model = create_model(arch=arch, pooling="gem")
            x = jnp.asarray(_np_input((1, 128, 128, 3)))
            variables = model.init(jax.random.PRNGKey(0), x)
            d = model.apply(variables, x)
            assert d.shape == (1, dim)


def test_densenet_trunk_parity():
    import torch
    from torch_oracles import densenet121_trunk, randomize_bn_stats
    from irtpu.models.torch_port import port_densenet_trunk
    from irtpu.models.densenet import DenseNetTrunk

    # a slimmed densenet121 (same structure, fewer layers) keeps the CPU
    # test fast; the port walks the same naming contract
    tm = randomize_bn_stats(densenet121_trunk(), 30).eval()
    v = port_densenet_trunk(tm.state_dict(), "densenet121")
    x = _np_input((1, 64, 64, 3), 31)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        DenseNetTrunk("densenet121").apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]}, jnp.asarray(x)
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_golden_descriptor_snapshot():
    """Cross-round regression anchor (SURVEY.md §4): a fixed deterministic
    image through a PRNGKey(42)-initialized resnet18+GeM must reproduce the
    pinned descriptor head values. Any silent change to init, trunk math,
    pooling, or normalization semantics trips this."""
    from irtpu.models import RetrievalNet

    m = RetrievalNet(arch="resnet18", pooling="gem")
    x = jnp.asarray((np.indices((1, 32, 32, 3)).sum(0) % 7 / 7.0).astype(np.float32))
    v = m.init(jax.random.PRNGKey(42), x)
    d = np.asarray(m.apply(v, x))
    assert d.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)
    golden = np.array(
        [0.0, 0.0, 0.058713, 0.000678, 0.0, 0.003501, 0.035502, 0.025343],
        np.float32,
    )
    np.testing.assert_allclose(d[0, :8], golden, atol=2e-4)


def test_gemmp_checkpoint_ports_vector_p():
    """A cirtorch GeMmp checkpoint (pool.p of shape [C]) ports to a [C]
    gem_p param and the gemmp head reproduces the torch math."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from torch_oracles import resnet18_trunk, randomize_bn_stats
    from irtpu.models.retrieval_net import RetrievalNet
    from irtpu.models.torch_port import port_retrieval_net

    tm = randomize_bn_stats(resnet18_trunk(), 7).eval()
    rngp = np.random.RandomState(7)
    pvec = (2.0 + rngp.rand(512)).astype(np.float32)
    x = np.random.RandomState(8).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        f = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        pt = torch.from_numpy(pvec).view(1, -1, 1, 1)
        pooled = F.avg_pool2d(
            f.clamp(min=1e-6).pow(pt), f.shape[-2:]).pow(1.0 / pt)
        pooled = pooled.squeeze(-1).squeeze(-1)
        want = (pooled / (pooled.norm(dim=1, keepdim=True) + 1e-6)).numpy()

    sd = {f"features.{k}": v for k, v in tm.state_dict().items()}
    sd["pool.p"] = torch.from_numpy(pvec)
    variables = port_retrieval_net(sd, "resnet18")
    assert np.asarray(variables["params"]["gem_p"]).shape == (512,)
    variables = jax.tree.map(jnp.asarray, variables)
    model = RetrievalNet(arch="resnet18", pooling="gemmp")
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


class TestS2DStem:
    """Space-to-depth stem rewrite (models.resnet._S2DConv7x7s2): exact —
    same parameter tree, same math up to f32 accumulation order."""

    def test_s2d_stem_matches_direct_conv(self):
        from irtpu.models.resnet import ResNetTrunk

        x = jnp.asarray(_np_input((2, 64, 96, 3), seed=3))
        ref = ResNetTrunk("resnet50")
        variables = ref.init(jax.random.PRNGKey(0), x)
        want = np.asarray(ref.apply(variables, x))
        # identical variables drive the rewritten stem (param tree equal)
        got = np.asarray(
            ResNetTrunk("resnet50", s2d_stem=True).apply(variables, x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_s2d_param_tree_identical(self):
        from irtpu.models.resnet import ResNetTrunk

        x = jnp.zeros((1, 64, 64, 3))
        v_ref = ResNetTrunk("resnet18").init(jax.random.PRNGKey(1), x)
        v_s2d = ResNetTrunk("resnet18", s2d_stem=True).init(
            jax.random.PRNGKey(1), x)
        ref_tree = jax.tree.structure(v_ref)
        assert jax.tree.structure(v_s2d) == ref_tree
        for a, b in zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_s2d)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_s2d_odd_shape_fallback(self):
        from irtpu.models.resnet import ResNetTrunk

        x = jnp.asarray(_np_input((1, 63, 65, 3), seed=4))
        ref = ResNetTrunk("resnet18")
        variables = ref.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
        want = np.asarray(ref.apply(variables, x))
        got = np.asarray(
            ResNetTrunk("resnet18", s2d_stem=True).apply(variables, x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_s2d_descriptor_through_extractor(self):
        """End to end at the package boundary: an Extractor forced onto the
        rewrite produces the same descriptors as the reference path (shared
        variables; u8 ingestion, masks, GeM head all live)."""
        from irtpu.api import Extractor
        from irtpu.utils.config import ExtractConfig, ModelConfig

        rng = np.random.RandomState(5)
        imgs = [rng.randint(0, 255, (60, 80, 3), np.uint8) for _ in range(3)]
        cfg = ExtractConfig(model=ModelConfig(arch="resnet18"),
                            image_size=80, batch_size=4)
        ex_ref = Extractor(cfg, rng=0)
        cfg2 = ExtractConfig(model=ModelConfig(arch="resnet18", s2d_stem=True),
                             image_size=80, batch_size=4)
        ex_s2d = Extractor(cfg2, rng=0, variables=ex_ref.variables)
        a = np.asarray(ex_ref.extract(imgs))
        b = np.asarray(ex_s2d.extract(imgs))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
