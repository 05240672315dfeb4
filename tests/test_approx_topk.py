"""approx_topk: the TPU hardware approximate-selection search tier.

On the CPU test platform ``lax.approx_max_k`` lowers to exact ``top_k``,
so these tests pin the EXACT-backend contracts (result-set equality with
the exact path, chunk invariance, mixed-precision galleries, harness
wiring); the recall-vs-QPS behavior on real hardware is measured in
bench-ann / PERF.md, not asserted here.
"""

import numpy as np
import jax.numpy as jnp

from irtpu.retrieval import approx_topk, knn_search


def _sets(idx):
    return [set(int(v) for v in row) for row in np.asarray(idx)]


def test_recall_one_vs_exact_on_cpu():
    rng = np.random.RandomState(0)
    g = rng.randn(3000, 64).astype(np.float32)
    q = rng.randn(9, 64).astype(np.float32)
    _, ei = knn_search(jnp.asarray(g), jnp.asarray(q), k=20)
    aps, ai = approx_topk(jnp.asarray(g), jnp.asarray(q), k=20)
    # set equality (tie order is not part of the approx contract)
    for a, e in zip(_sets(ai), _sets(ei)):
        assert a == e
    # scores sorted descending, like the exact path
    aps = np.asarray(aps)
    assert np.all(np.diff(aps, axis=1) <= 1e-6)


def test_chunked_streaming_matches_dense():
    rng = np.random.RandomState(1)
    g = rng.randn(1500, 32).astype(np.float32)
    q = rng.randn(5, 32).astype(np.float32)
    _, i1 = approx_topk(jnp.asarray(g), jnp.asarray(q), k=17, chunk=256)
    _, i2 = approx_topk(jnp.asarray(g), jnp.asarray(q), k=17, chunk=1500)
    for a, b in zip(_sets(i1), _sets(i2)):
        assert a == b


def test_k_clamped_to_gallery():
    rng = np.random.RandomState(2)
    g = rng.randn(8, 16).astype(np.float32)
    q = rng.randn(3, 16).astype(np.float32)
    s, i = approx_topk(jnp.asarray(g), jnp.asarray(q), k=50)
    assert s.shape == (3, 8) and i.shape == (3, 8)
    for row in _sets(i):
        assert row == set(range(8))


def test_int8_gallery_dequant():
    rng = np.random.RandomState(3)
    g = rng.randn(400, 32).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:4] + 0.01 * rng.randn(4, 32).astype(np.float32)
    g8 = np.clip(np.round(g * 127.0), -127, 127).astype(np.int8)
    _, ei = knn_search(jnp.asarray(g8), jnp.asarray(q), k=5)
    _, ai = approx_topk(jnp.asarray(g8), jnp.asarray(q), k=5)
    for a, e in zip(_sets(ai), _sets(ei)):
        assert a == e


def test_recall_target_is_static_and_retraceable():
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.randn(600, 16).astype(np.float32))
    q = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    for rt in (0.9, 0.99):
        s, i = approx_topk(g, q, k=4, recall_target=rt)
        assert i.shape == (2, 4)


def test_index_query_method_approx():
    from irtpu.retrieval import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(5)
    db = rng.randn(300, 64).astype(np.float32)
    qd = db[:6] + 0.01 * rng.randn(6, 64).astype(np.float32)
    index = Index.build(db, IndexConfig(whitening=None))
    es, ei = index.query(qd, k=8)
    as_, ai = index.query(qd, k=8, method="approx", recall_target=0.95)
    for a, e in zip(_sets(ai), _sets(ei)):
        assert a == e  # exact CPU lowering
    # QE composes with approximate selection
    qs, qi = index.query(qd, k=8, qe_nqe=2, method="approx")
    qes, qei = index.query(qd, k=8, qe_nqe=2)
    for a, e in zip(_sets(qi), _sets(qei)):
        assert a == e
    import pytest
    with pytest.raises(ValueError, match="unknown query method"):
        index.query(qd, k=8, method="blah")


def test_cli_query_approx_flag(tmp_path):
    from image_retrieval_for_image_based_localization_tpu import cli

    rng = np.random.RandomState(6)
    db = rng.randn(120, 32).astype(np.float32)
    qd = db[:3] + 0.01 * rng.randn(3, 32).astype(np.float32)
    from irtpu.retrieval import Index
    from irtpu.utils.config import IndexConfig

    idx_path = str(tmp_path / "idx.npz")
    Index.build(db, IndexConfig(whitening=None)).save(idx_path)
    qpath = str(tmp_path / "q.npy")
    np.save(qpath, qd)
    out = str(tmp_path / "res.npz")
    cli.main(["query", "--index", idx_path, "--queries", qpath, "-k", "5",
              "--approx", "--out", out])
    z = np.load(out)
    exact_s, exact_i = Index.load(idx_path).query(qd, k=5)
    assert {int(v) for v in z["indices"].ravel()} == {
        int(v) for v in exact_i.ravel()}

    import pytest
    with pytest.raises(SystemExit):
        cli.main(["query", "--index", idx_path, "--queries", qpath,
                  "--approx", "--sharded"])


def test_harness_ann_approx_mode(tmp_path):
    # --ann approx end-to-end: full-depth shortlist + exact CPU lowering
    # of approx_max_k -> mAP equals the exact evaluation path.
    from irtpu.api import Extractor
    from irtpu.data.test_datasets import configdataset, make_synthetic_dataset
    from irtpu.evaluation.harness import evaluate_dataset
    from irtpu.utils.config import ExtractConfig, IndexConfig, ModelConfig

    make_synthetic_dataset(str(tmp_path), "approxsynth", n_scenes=4,
                           views_per_scene=4, n_distractors=6,
                           image_hw=(48, 64))
    ds = configdataset("approxsynth", str(tmp_path))
    cfg = ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=64,
                        batch_size=8)
    ex = Extractor(cfg)
    icfg = IndexConfig(whitening=None)

    exact = evaluate_dataset(ds, cfg, icfg, extractor=ex)
    approx = evaluate_dataset(
        ds, cfg, icfg, extractor=ex, ann="approx",
        ann_kwargs={"recall_target": 0.95}, shortlist_k=ds.n)
    key = "medium" if "medium" in exact["results"] else None
    get = (lambda r: r["results"][key]["map"]) if key else (
        lambda r: r["results"]["map"])
    np.testing.assert_allclose(get(approx), get(exact), atol=1e-9)


def test_k_exceeds_chunk():
    # per-chunk selection must clamp to the chunk width (approx_max_k
    # requires k <= reduction dim); the cross-chunk merge fills the k slots
    rng = np.random.RandomState(7)
    g = rng.randn(1000, 16).astype(np.float32)
    q = rng.randn(3, 16).astype(np.float32)
    _, ei = knn_search(jnp.asarray(g), jnp.asarray(q), k=300)
    _, ai = approx_topk(jnp.asarray(g), jnp.asarray(q), k=300, chunk=256)
    for a, e in zip(_sets(ai), _sets(ei)):
        assert a == e


def test_recall_target_range_validated():
    import pytest

    g = jnp.zeros((10, 4), jnp.float32)
    q = jnp.zeros((2, 4), jnp.float32)
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="recall_target"):
            approx_topk(g, q, k=2, recall_target=bad)


def test_harness_rejects_unknown_approx_kwargs(tmp_path):
    import pytest

    from irtpu.api import Extractor
    from irtpu.data.test_datasets import configdataset, make_synthetic_dataset
    from irtpu.evaluation.harness import evaluate_dataset
    from irtpu.utils.config import ExtractConfig, IndexConfig, ModelConfig

    make_synthetic_dataset(str(tmp_path), "kwsynth", n_scenes=2,
                           views_per_scene=3, n_distractors=2,
                           image_hw=(48, 64))
    ds = configdataset("kwsynth", str(tmp_path))
    cfg = ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=64,
                        batch_size=8)
    with pytest.raises(ValueError, match="unknown ann kwargs"):
        evaluate_dataset(ds, cfg, IndexConfig(whitening=None),
                         extractor=Extractor(cfg), ann="approx",
                         ann_kwargs={"recall": 0.9})
