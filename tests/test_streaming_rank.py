"""Streaming candidate ranking (rank-by-count) vs the full-rank oracle.

The scale-correct eval path: mAP is computed from candidate rank positions
counted over streamed gallery chunks (``knn.rank_candidates``), never
materializing the [Ng, Nq] score matrix. These tests pin exact equality —
including stable lower-index-wins tie semantics on duplicate galleries —
against NumPy full argsort, single-device and sharded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from irtpu.retrieval.knn import rank_candidates
from irtpu.evaluation.map import (
    candidate_matrix,
    compute_map_and_print,
    compute_map_streaming_and_print,
)


def _np_ranks_of(gallery, queries, cand):
    """Oracle: candidate positions in the stable descending argsort."""
    scores = queries @ gallery.T
    order = np.argsort(-scores, axis=1, kind="stable")  # [Nq, Ng]
    pos = np.empty_like(order)
    Nq, Ng = order.shape
    rows = np.arange(Nq)[:, None]
    pos[rows, order] = np.arange(Ng)[None, :]
    return pos[rows, cand]


def test_rank_candidates_matches_argsort():
    rng = np.random.RandomState(0)
    g = rng.randn(500, 32).astype(np.float32)
    q = rng.randn(7, 32).astype(np.float32)
    cand = rng.randint(0, 500, size=(7, 13)).astype(np.int32)
    got = np.asarray(rank_candidates(jnp.asarray(g), jnp.asarray(q), jnp.asarray(cand)))
    want = _np_ranks_of(g, q, cand)
    np.testing.assert_array_equal(got, want)


def test_rank_candidates_ties_duplicate_gallery():
    """Adversarial exact ties: heavy duplicate rows. Lower index must win."""
    rng = np.random.RandomState(1)
    base = rng.randn(20, 16).astype(np.float32)
    g = np.repeat(base, 25, axis=0)  # 500 rows, 25-way exact ties
    q = rng.randn(4, 16).astype(np.float32)
    cand = rng.randint(0, 500, size=(4, 21)).astype(np.int32)
    got = np.asarray(
        rank_candidates(jnp.asarray(g), jnp.asarray(q), jnp.asarray(cand), chunk=128)
    )
    want = _np_ranks_of(g, q, cand)
    np.testing.assert_array_equal(got, want)


def test_rank_candidates_chunked_negative_scores():
    rng = np.random.RandomState(2)
    g = -np.abs(rng.randn(300, 24)).astype(np.float32)
    q = np.abs(rng.randn(5, 24)).astype(np.float32)
    cand = rng.randint(0, 300, size=(5, 9)).astype(np.int32)
    got = np.asarray(
        rank_candidates(jnp.asarray(g), jnp.asarray(q), jnp.asarray(cand), chunk=64)
    )
    want = _np_ranks_of(g, q, cand)
    np.testing.assert_array_equal(got, want)


def test_sharded_rank_candidates_matches_single_device():
    from irtpu.parallel.mesh import create_mesh
    from irtpu.parallel.sharded_index import ShardedIndex

    if len(jax.devices()) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = create_mesh([2, 4])
    rng = np.random.RandomState(3)
    g = rng.randn(501, 32).astype(np.float32)  # odd: forces shard padding
    q = rng.randn(6, 32).astype(np.float32)
    cand = rng.randint(0, 501, size=(6, 11)).astype(np.int32)
    sindex = ShardedIndex(g, mesh=mesh)
    got = sindex.rank_candidates(q, cand)
    want = _np_ranks_of(g, q, cand)
    np.testing.assert_array_equal(got, want)


def _synthetic_gnd(rng, n_db, nq, revisited):
    gnd = []
    for _ in range(nq):
        perm = rng.permutation(n_db)
        if revisited:
            gnd.append(
                {
                    "easy": perm[:4],
                    "hard": perm[4:9],
                    "junk": perm[9:15],
                    "bbx": [0, 0, 10, 10],
                }
            )
        else:
            gnd.append({"ok": perm[:6], "junk": perm[6:10]})
    return gnd


@pytest.mark.parametrize("revisited", [True, False])
def test_streaming_map_equals_full_rank_map(revisited, capsys):
    rng = np.random.RandomState(4)
    n_db, nq = 400, 9
    g = rng.randn(n_db, 24).astype(np.float32)
    # include exact duplicates so junk/positive ties exercise tie-breaking
    g[50:60] = g[0:10]
    q = rng.randn(nq, 24).astype(np.float32)
    gnd = _synthetic_gnd(rng, n_db, nq, revisited)

    scores = q @ g.T
    ranks_full = np.argsort(-scores, axis=1, kind="stable").T  # [Ng, Nq]
    want = compute_map_and_print("synth", ranks_full, gnd)

    cand = candidate_matrix(gnd)
    ranks_all = np.asarray(
        rank_candidates(jnp.asarray(g), jnp.asarray(q), jnp.asarray(cand), chunk=128)
    )
    got = compute_map_streaming_and_print("synth", ranks_all, gnd)

    if revisited:
        for proto in ("easy", "medium", "hard"):
            assert got[proto]["map"] == pytest.approx(want[proto]["map"], abs=0)
            np.testing.assert_allclose(got[proto]["aps"], want[proto]["aps"])
            np.testing.assert_allclose(got[proto]["mprk"], want[proto]["mprk"])
    else:
        assert got["map"] == pytest.approx(want["map"], abs=0)
        np.testing.assert_allclose(got["aps"], want["aps"])
        np.testing.assert_allclose(got["mprk"], want["mprk"])


def test_harness_streaming_dense_limit_matches_full_rank(tmp_path):
    """evaluate_dataset's single-device streaming path (gallery >
    dense_rank_limit) must reproduce the dense full-rank mAP exactly."""
    from irtpu.data.test_datasets import make_synthetic_dataset
    from irtpu.evaluation.harness import evaluate_dataset
    from irtpu.utils.config import ExtractConfig, IndexConfig, ModelConfig

    ds = make_synthetic_dataset(
        str(tmp_path), n_scenes=2, views_per_scene=3, n_distractors=2,
        image_hw=(64, 80), seed=6,
    )
    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="gem"),
        image_size=80, batch_size=4,
    )
    dense = evaluate_dataset(ds, cfg, IndexConfig(whitening=None))
    stream = evaluate_dataset(
        ds, cfg, IndexConfig(whitening=None), dense_rank_limit=0
    )
    for p in ("easy", "medium", "hard"):
        assert stream["results"][p]["map"] == dense["results"][p]["map"]


def test_sharded_rank_candidates_whitened_index():
    """Whitening transform applied identically in the streaming rank path."""
    from irtpu.parallel.mesh import create_mesh
    from irtpu.parallel.sharded_index import ShardedIndex
    from irtpu.retrieval.index import Index
    from irtpu.utils.config import IndexConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = create_mesh([2, 4])
    rng = np.random.RandomState(5)
    db = rng.randn(200, 32).astype(np.float32)
    q = rng.randn(5, 32).astype(np.float32)
    index = Index.build(db, IndexConfig(whitening="pca", whiten_dims=16))
    sindex = ShardedIndex.from_index(index, mesh=mesh)
    cand = rng.randint(0, 200, size=(5, 8)).astype(np.int32)
    got = sindex.rank_candidates(q, cand)
    # oracle: whitened queries against the (already whitened) stored gallery
    qw = np.asarray(sindex.transform_queries(q))
    want = _np_ranks_of(np.asarray(index.gallery), qw, cand)
    np.testing.assert_array_equal(got, want)


def test_streaming_map_empty_ok_queries():
    """Queries with empty 'ok' lists are nan-excluded from the mean in the
    streaming path exactly as in the dense path."""
    rng = np.random.RandomState(7)
    n_db = 50
    g = rng.randn(n_db, 8).astype(np.float32)
    q = rng.randn(3, 8).astype(np.float32)
    gnd = [
        {"ok": rng.permutation(n_db)[:4], "junk": []},
        {"ok": np.array([], np.int64), "junk": []},  # empty query
        {"ok": rng.permutation(n_db)[:3], "junk": rng.permutation(n_db)[10:14]},
    ]
    scores = q @ g.T
    ranks_full = np.argsort(-scores, axis=1, kind="stable").T
    want = compute_map_and_print("synth", ranks_full, gnd)

    cand = candidate_matrix(gnd)
    ranks_all = np.asarray(
        rank_candidates(jnp.asarray(g), jnp.asarray(q), jnp.asarray(cand))
    )
    got = compute_map_streaming_and_print("synth", ranks_all, gnd)
    assert got["map"] == want["map"]
    assert np.isnan(got["aps"][1]) and np.isnan(want["aps"][1])
    np.testing.assert_allclose(got["aps"][[0, 2]], want["aps"][[0, 2]])
