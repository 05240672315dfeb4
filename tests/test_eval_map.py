"""mAP oracle tests: hand-computed APs on tiny synthetic gnd (SURVEY.md §4)."""

import numpy as np

from irtpu.evaluation import compute_ap, compute_map, compute_map_revisited


def test_compute_ap_perfect():
    # positives at ranks 0,1,2 out of 3 -> AP = 1
    assert abs(compute_ap(np.array([0, 1, 2]), 3) - 1.0) < 1e-9


def test_compute_ap_hand_computed():
    # one positive at rank 1 (0-based): trapezoidal AP
    # precision_0 = 0/1 = 0, precision_1 = 1/2 -> ap = (0 + 0.5)/2 = 0.25
    assert abs(compute_ap(np.array([1]), 1) - 0.25) < 1e-9


def test_compute_map_single_query():
    # 5 db images; query's positives are {0, 3}; ranking: [2, 0, 4, 3, 1]
    ranks = np.array([[2], [0], [4], [3], [1]])
    gnd = [{"ok": np.array([0, 3]), "junk": np.array([])}]
    m, aps, _, _ = compute_map(ranks, gnd)
    # positives at 0-based positions 1 and 3
    want = compute_ap(np.array([1, 3]), 2)
    assert abs(m - want) < 1e-9


def test_junk_removal():
    # junk image ranked before the positive must not count against it
    ranks = np.array([[2], [0], [1]])  # db order: 2 (junk), 0 (pos), 1
    gnd = [{"ok": np.array([0]), "junk": np.array([2])}]
    m, _, _, _ = compute_map(ranks, gnd)
    # after junk removal the positive is at position 0 -> AP 1
    assert abs(m - 1.0) < 1e-9


def test_empty_query_excluded():
    ranks = np.array([[0, 0], [1, 1]])
    gnd = [{"ok": np.array([0])}, {"ok": np.array([])}]
    m, aps, _, _ = compute_map(ranks, gnd)
    assert abs(m - 1.0) < 1e-9
    assert np.isnan(aps[1])


def test_revisited_protocols():
    ranks = np.tile(np.arange(4)[:, None], (1, 1))  # identity ranking
    gnd = [{"easy": [0], "hard": [1], "junk": [2]}]
    res = compute_map_revisited(ranks, gnd)
    # easy: ok={0} at rank 0 -> AP 1
    assert abs(res["easy"]["map"] - 1.0) < 1e-9
    # hard: ok={1}, junk={2, 0}; after removing junk, 1 is at position 0 -> AP 1
    assert abs(res["hard"]["map"] - 1.0) < 1e-9
    # medium: ok={0,1}, junk={2}: positions 0 and 1 -> AP 1
    assert abs(res["medium"]["map"] - 1.0) < 1e-9


def test_precision_at_k():
    ranks = np.array([[0], [1], [2], [3]])
    gnd = [{"ok": np.array([0, 2])}]
    _, _, pr, _ = compute_map(ranks, gnd, kappas=[1, 3])
    assert abs(pr[0] - 1.0) < 1e-9          # p@1 = 1
    assert abs(pr[1] - 2.0 / 3.0) < 1e-9     # p@3 = 2/3


def test_ann_evaluation_shortlist_lower_bound(tmp_path):
    """evaluate(ann=...): full-coverage shortlist (nprobe=C, K=N) equals
    the exact mAP; a starved probe only lowers it (honest lower bound)."""
    from irtpu.api import Extractor
    from irtpu.data.test_datasets import configdataset, make_synthetic_dataset
    from irtpu.evaluation.harness import evaluate_dataset
    from irtpu.utils.config import ExtractConfig, IndexConfig, ModelConfig

    make_synthetic_dataset(str(tmp_path), "annsynth", n_scenes=4,
                           views_per_scene=4, n_distractors=6,
                           image_hw=(48, 64))
    ds = configdataset("annsynth", str(tmp_path))
    cfg = ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=64,
                        batch_size=8)
    ex = Extractor(cfg)
    icfg = IndexConfig(whitening=None)

    exact = evaluate_dataset(ds, cfg, icfg, extractor=ex, recall_ks=(1, 5))
    full = evaluate_dataset(
        ds, cfg, icfg, extractor=ex, ann="ivf",
        ann_kwargs={"n_clusters": 4, "nprobe": 4}, shortlist_k=ds.n,
        recall_ks=(1, 5))
    key = "medium" if "medium" in exact["results"] else None
    get = (lambda r: r["results"][key]["map"]) if key else (
        lambda r: r["results"]["map"])
    np.testing.assert_allclose(get(full), get(exact), atol=1e-9)
    # full-coverage ANN shortlist: recall@k equals the exact path's
    assert full["recall"]["recall"] == exact["recall"]["recall"]

    starved = evaluate_dataset(
        ds, cfg, icfg, extractor=ex, ann="ivf",
        ann_kwargs={"n_clusters": 8, "nprobe": 1}, shortlist_k=5)
    assert get(starved) <= get(exact) + 1e-9

    # PQ path runs end-to-end too (full refine + K=N == exact)
    pq_full = evaluate_dataset(
        ds, cfg, icfg, extractor=ex, ann="pq",
        ann_kwargs={"m": 8, "refine": ds.n}, shortlist_k=ds.n)
    np.testing.assert_allclose(get(pq_full), get(exact), atol=1e-9)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="ann evaluation"):
        evaluate_dataset(ds, cfg, icfg, extractor=ex, ann="ivf", qe_nqe=3)
