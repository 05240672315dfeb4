"""End-to-end API: extract_features -> build_index -> query -> mAP.

The minimum end-to-end slice of SURVEY.md §7 as a test: synthetic images,
ResNet-18 + GeM, brute-force kNN, ranking parity with the NumPy pipeline.
"""

import numpy as np
import pytest

from irtpu import build_index, query, Extractor
from irtpu import ExtractConfig, IndexConfig, ModelConfig
from irtpu.evaluation import compute_map
from irtpu.retrieval import Index


CFG = ExtractConfig(
    model=ModelConfig(arch="resnet18", pooling="gem"),
    image_size=64,
    batch_size=4,
)


def synth_images(n, seed=0, size=60):
    rng = np.random.RandomState(seed)
    return [rng.rand(size, size + (i % 3) * 8, 3).astype(np.float32) for i in range(n)]


def test_end_to_end_pipeline():
    ex = Extractor(CFG)
    db = ex.extract(synth_images(10))
    q = ex.extract(synth_images(3, seed=7))
    assert db.shape == (10, 512) and q.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(db, axis=1), 1.0, atol=1e-3)

    index = build_index(db, IndexConfig(whitening=None))
    scores, idx = query(index, q, k=5)
    assert scores.shape == (3, 5) and idx.shape == (3, 5)

    # ranking parity with the NumPy pipeline
    want = np.argsort(-(q @ db.T), axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx, want)


def test_self_retrieval():
    """An image must retrieve itself at rank 0."""
    ex = Extractor(CFG)
    imgs = synth_images(8, seed=1)
    db = ex.extract(imgs)
    index = build_index(db, IndexConfig(whitening=None))
    _, idx = query(index, db, k=1)
    np.testing.assert_array_equal(idx[:, 0], np.arange(8))


def test_extraction_deterministic():
    ex = Extractor(CFG)
    imgs = synth_images(4, seed=2)
    d1 = ex.extract(imgs)
    d2 = ex.extract(imgs)
    np.testing.assert_array_equal(d1, d2)


def test_whitened_index_end_to_end():
    ex = Extractor(CFG)
    db = ex.extract(synth_images(12, seed=3))
    index = build_index(db, IndexConfig(whitening="pca", whiten_dims=64))
    q = ex.extract(synth_images(2, seed=4))
    scores, idx = query(index, q, k=3)
    assert idx.shape == (2, 3)
    # whitened gallery is L2-normalized; with N=12 samples the PCA rank is
    # 12, so the requested 64 dims clamp to 12 (dual-form whitening)
    assert index.gallery.shape == (12, 12)
    np.testing.assert_allclose(np.linalg.norm(index.gallery, axis=1), 1.0, atol=1e-3)


def test_index_save_load_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    db = rng.randn(20, 32).astype(np.float32)
    index = build_index(db, IndexConfig(whitening="pca"), ids=np.arange(20))
    path = str(tmp_path / "index.npz")
    index.save(path)
    loaded = Index.load(path)
    np.testing.assert_array_equal(loaded.gallery, index.gallery)
    np.testing.assert_array_equal(loaded.ids, index.ids)
    q = rng.randn(3, 32).astype(np.float32)
    np.testing.assert_array_equal(index.query(q, 5)[1], loaded.query(q, 5)[1])


def test_multiscale_extraction():
    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="gem"),
        image_size=64,
        batch_size=2,
        scales=(1.0, 2 ** -0.5, 0.5),
    )
    ex = Extractor(cfg)
    imgs = synth_images(2, seed=5)
    d = ex.extract(imgs)
    assert d.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
    # multi-scale differs from single-scale
    d1 = Extractor(CFG, variables=ex.variables).extract(imgs)
    assert np.abs(d - d1).max() > 1e-4


def test_map_on_synthetic_clusters():
    """Descriptors of noisy copies must retrieve their source cluster."""
    rng = np.random.RandomState(6)
    protos = [rng.rand(60, 60, 3).astype(np.float32) for _ in range(3)]
    db_imgs, gnd_ok = [], {i: [] for i in range(3)}
    for k in range(4):
        for i, p in enumerate(protos):
            gnd_ok[i].append(len(db_imgs))
            db_imgs.append(np.clip(p + rng.randn(60, 60, 3) * 0.02, 0, 1).astype(np.float32))
    q_imgs = [np.clip(p + rng.randn(60, 60, 3) * 0.02, 0, 1).astype(np.float32) for p in protos]

    ex = Extractor(CFG)
    db = ex.extract(db_imgs)
    qd = ex.extract(q_imgs)
    index = build_index(db, IndexConfig(whitening=None))
    ranks = index.ranks(qd)
    gnd = [{"ok": np.array(gnd_ok[i]), "junk": np.array([])} for i in range(3)]
    m, _, _, _ = compute_map(ranks, gnd)
    assert m > 0.95, m


def test_extractor_data_parallel_mesh():
    """DP extraction over the mesh 'data' axis matches single-device."""
    from irtpu.parallel import create_mesh

    mesh = create_mesh([8, 1])
    ex1 = Extractor(CFG)
    ex8 = Extractor(CFG, variables=ex1.variables, mesh=mesh)
    imgs = synth_images(8, seed=11, size=64)
    d1 = ex1.extract(imgs)
    d8 = ex8.extract(imgs)
    np.testing.assert_allclose(d1, d8, rtol=1e-4, atol=1e-5)


def test_extract_vectors_alias():
    from irtpu.api import extract_vectors

    ex = Extractor(CFG)
    imgs = synth_images(2, seed=12)
    d1 = extract_vectors(ex, imgs)
    assert d1.shape == (2, 512)


def test_localization_recall():
    """recall@k of a shortlist under revisited + classic gnd contracts."""
    from irtpu.localization import localization_recall

    # q0: first positive at rank 0; q1: first positive (hard) at rank 4;
    # q2: no medium positives (excluded); q3: classic gnd, positive at rank 9
    shortlist = np.array([
        [7, 1, 2, 3, 4, 5, 6, 0, 8, 9],
        [1, 2, 3, 4, 7, 5, 6, 0, 8, 9],
        [1, 2, 3, 4, 5, 6, 0, 8, 9, 7],
        [1, 2, 3, 4, 5, 6, 0, 8, 9, 7],
    ])
    gnd = [
        {"easy": [7], "hard": [], "junk": [1]},
        {"easy": [], "hard": [7], "junk": []},
        {"easy": [], "hard": [], "junk": [2]},
        {"ok": [7], "junk": []},
    ]
    r = localization_recall(shortlist, gnd, ks=(1, 5, 10))
    assert r["n_queries"] == 3
    assert r["recall"][1] == pytest.approx(1 / 3)
    assert r["recall"][5] == pytest.approx(2 / 3)
    assert r["recall"][10] == pytest.approx(1.0)
    # easy protocol: q1's hard positive no longer counts, q1 stays scored
    # as a miss only if it has easy positives -> it has none, so excluded
    r_easy = localization_recall(shortlist, gnd, ks=(1,), protocol="easy")
    assert r_easy["n_queries"] == 2
    assert r_easy["recall"][1] == pytest.approx(1 / 2)
    # shortlist shallower than max(ks) is an error, not a silent clamp
    with pytest.raises(ValueError):
        localization_recall(shortlist[:, :5], gnd, ks=(10,))


def test_localization_pairs_output(tmp_path):
    from irtpu.localization import localize_shortlist

    rng = np.random.RandomState(13)
    db = rng.randn(20, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = build_index(db, IndexConfig(whitening=None),
                        ids=[f"db/{i:03d}.jpg" for i in range(20)])
    q = db[[3, 7]] + rng.randn(2, 16).astype(np.float32) * 0.01
    path = str(tmp_path / "pairs.txt")
    pairs, scores = localize_shortlist(
        index, q, ["q/a.jpg", "q/b.jpg"], k=5, out_path=path
    )
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 10
    assert lines[0].split() == ["q/a.jpg", "db/003.jpg"]
    assert lines[5].split() == ["q/b.jpg", "db/007.jpg"]


def test_localization_shortlist_reranked(tmp_path):
    """QE and diffusion re-ranking flow through localize_shortlist; the
    self-match stays the top pair and the pairs-file shape is unchanged."""
    from irtpu.localization import localize_shortlist

    rng = np.random.RandomState(13)
    db = rng.randn(20, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = build_index(db, IndexConfig(whitening=None),
                        ids=[f"db/{i:03d}.jpg" for i in range(20)])
    q = db[[3, 7]] + rng.randn(2, 16).astype(np.float32) * 0.01
    for kw in ({"qe_nqe": 3}, {"diffusion": True},
               {"diffusion": True, "qe_nqe": 3}):
        path = str(tmp_path / "pairs.txt")
        pairs, _ = localize_shortlist(
            index, q, ["q/a.jpg", "q/b.jpg"], k=5, out_path=path, **kw
        )
        lines = open(path).read().strip().splitlines()
        assert len(lines) == 10, kw
        assert lines[0].split() == ["q/a.jpg", "db/003.jpg"], kw
        assert lines[5].split() == ["q/b.jpg", "db/007.jpg"], kw


def test_u8_entry_matches_float_entry():
    """extract()'s uint8 device path == the float/mask path, bitwise-close."""
    from irtpu.data.images import make_batches

    ex = Extractor(CFG)
    imgs = synth_images(3, seed=14)
    (batch,) = list(make_batches(imgs, image_size=64, batch_size=4,
                                 upscale=CFG.upscale,
                                 resize_filter=CFG.resize_filter))
    d_float = ex(batch.pixels, batch.mask)           # float entry
    d_u8 = ex.extract(imgs)                          # u8 device entry
    np.testing.assert_allclose(
        d_u8[batch.indices], d_float[: len(batch.indices)], rtol=1e-4, atol=1e-5
    )


def test_exact_mode_matches_single_image_runs():
    """ExtractConfig(exact=True) descriptors == one-image-at-a-time exact
    descriptors (the bucketed-vs-exact delta harness relies on this)."""
    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    rng = np.random.RandomState(17)
    imgs = [rng.rand(60, 90, 3).astype(np.float32) for _ in range(3)]
    imgs += [rng.rand(48, 48, 3).astype(np.float32)]
    cfg = ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=96,
                        batch_size=4, exact=True)
    ex = Extractor(cfg)
    batched = ex.extract(imgs)
    for i, im in enumerate(imgs):
        one = ex.extract([im])
        np.testing.assert_allclose(batched[i], one[0], rtol=2e-5, atol=2e-6)


def test_extractor_fuse_blocks_matches_flax_trunk():
    """ExtractConfig(fuse_blocks=True): the BN-folded fused trunk produces
    the same descriptors as the flax trunk through the public extract API
    (bucketed batch with masks)."""
    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    rng = np.random.RandomState(18)
    imgs = [rng.rand(64, 96, 3).astype(np.float32),
            rng.rand(48, 64, 3).astype(np.float32)]
    base = ExtractConfig(model=ModelConfig(arch="resnet50"), image_size=96,
                         batch_size=2)
    ex_flax = Extractor(base)
    import dataclasses
    ex_fused = Extractor(dataclasses.replace(base, fuse_blocks=True),
                         variables=ex_flax.variables)
    d_flax = ex_flax.extract(imgs)
    d_fused = ex_fused.extract(imgs)
    cos = np.sum(d_flax * d_fused, axis=1)
    assert (cos > 0.9999).all(), cos


def test_rmac_bucketed_extractor_matches_exact():
    """R-MAC through the bucketed Extractor path (previously a hard error)
    must match the exact-shape path (VERDICT r3 item 8)."""
    import dataclasses

    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    rng = np.random.RandomState(4)
    imgs = [rng.rand(h, w, 3).astype(np.float32)
            for h, w in [(96, 128), (128, 96), (80, 128)]]
    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="rmac"),
        image_size=128, batch_size=2,
    )
    ex_b = Extractor(cfg)  # bucketed: must not raise anymore
    ex_e = Extractor(dataclasses.replace(cfg, exact=True),
                     variables=ex_b.variables)
    d_b = ex_b.extract(imgs)
    d_e = ex_e.extract(imgs)
    cos = np.sum(d_b * d_e, axis=1)
    # images whose resized shape fills the bucket exactly (96x128, 128x96)
    # must match the exact path to float noise — the region grids are
    # identical by construction; the 80-row image pads to a 96-row bucket
    # and inherits the generic bucketed-boundary activation approximation
    # (trunk features near the pad differ; same corridor as GeM's
    # stress_cos in benchmarks.measure_bucketing_delta), NOT a grid error.
    assert (cos[:2] > 0.9999).all(), cos
    assert (cos > 0.99).all(), cos


def test_extract_regional_vectors():
    """extract_regional: per-image [R_i, D] region vectors, each unit-norm,
    consistent with the aggregated regional descriptor (sum + L2N)."""
    import jax.numpy as jnp

    from irtpu.api import Extractor
    from irtpu.ops.normalization import l2n
    from irtpu.utils.config import ExtractConfig, ModelConfig

    cfg = ExtractConfig(model=ModelConfig(arch="resnet18", regional=True,
                                          whiten_dim=64),
                        image_size=64, batch_size=2)
    ex = Extractor(cfg)
    rng = np.random.RandomState(5)
    imgs = [rng.rand(64, 64, 3).astype(np.float32),
            rng.rand(48, 64, 3).astype(np.float32)]
    regs = ex.extract_regional(imgs)
    assert len(regs) == 2
    assert regs[0].shape[1] == 64  # whiten_dim
    # different aspect => possibly different region count; both unit-norm
    for r in regs:
        np.testing.assert_allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-5)
    # aggregated descriptor == l2n(sum of regions)
    agg = ex.extract(imgs)
    for i in range(2):
        want = np.asarray(l2n(jnp.asarray(regs[i].sum(axis=0))))
        np.testing.assert_allclose(agg[i], want, rtol=1e-4, atol=1e-5)


def test_extract_regional_requires_regional_model():
    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    ex = Extractor(ExtractConfig(model=ModelConfig(arch="resnet18"),
                                 image_size=64, batch_size=2))
    with pytest.raises(ValueError, match="regional"):
        ex.extract_regional([np.zeros((64, 64, 3), np.float32)])


def test_extract_local_vectors():
    """extract_local: per-image [h, w, C] unit-norm local features."""
    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    ex = Extractor(ExtractConfig(model=ModelConfig(arch="resnet18"),
                                 image_size=64, batch_size=2))
    rng = np.random.RandomState(6)
    imgs = [rng.rand(64, 64, 3).astype(np.float32),
            rng.rand(32, 64, 3).astype(np.float32)]
    locs = ex.extract_local(imgs)
    assert len(locs) == 2
    assert locs[0].shape == (4, 512)  # (64/32)*(64/32) positions, flattened
    assert locs[1].shape == (2, 512)
    for f in locs:
        norms = np.linalg.norm(f, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_extract_regional_multiscale_concats_scales():
    """Multi-scale regional vectors = concatenation of per-scale region
    vectors; repeated calls reuse the cached jit program."""
    import dataclasses

    from irtpu.api import Extractor
    from irtpu.utils.config import DEFAULT_SCALES, ExtractConfig, ModelConfig

    cfg = ExtractConfig(model=ModelConfig(arch="resnet18", regional=True),
                        image_size=64, batch_size=1, scales=DEFAULT_SCALES)
    ex = Extractor(cfg)
    rng = np.random.RandomState(9)
    img = rng.rand(64, 64, 3).astype(np.float32)
    regs = ex.extract_regional([img])[0]

    per_scale = []
    for s in sorted(DEFAULT_SCALES, reverse=True):
        c1 = dataclasses.replace(cfg, scales=(s,))
        per_scale.append(
            Extractor(c1, variables=ex.variables).extract_regional([img])[0])
    want = np.concatenate(per_scale, axis=0)
    np.testing.assert_allclose(regs, want, rtol=1e-4, atol=1e-5)
    # cached program: second call hits self._structured_fwd
    assert len(ex._structured_fwd) == 1
    ex.extract_regional([img])
    assert len(ex._structured_fwd) == 1


def test_stem_channel_pad_is_exact():
    """The round-5 C=3->4 stem pad (zero-padded kernel + padded input)
    must be EXACTLY the unpadded forward — f32 sums over appended zeros
    are bitwise unchanged."""
    import irtpu.api as api
    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    rng = np.random.RandomState(11)
    px = (rng.rand(2, 3, 64, 48, 3) * 255).astype(np.uint8)  # unused shape guard
    cfg = ExtractConfig(model=ModelConfig(arch="resnet18"),
                        image_size=64, batch_size=2)
    imgs = [(rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(3)]

    ex_pad = Extractor(cfg, rng=7)
    d_pad = ex_pad.extract(imgs)
    old = api._STEM_PAD_ENABLED
    api._STEM_PAD_ENABLED = False
    try:
        ex_raw = Extractor(cfg, rng=7)
        d_raw = ex_raw.extract(imgs)
    finally:
        api._STEM_PAD_ENABLED = old
    np.testing.assert_array_equal(d_pad, d_raw)
