"""Training subsystem: mining semantics, train step, loss descent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from irtpu.models import RetrievalNet
from irtpu.training import (
    TrainConfig,
    create_train_state,
    make_train_step,
    mine_hard_negatives,
    train_epoch,
)


class TestMining:
    def test_hardest_negatives_excluded_clusters(self):
        # pool: 3 clusters of 3; query in cluster 0 -> negatives never from 0
        rng = np.random.RandomState(0)
        centers = np.eye(3, 8, dtype=np.float32)
        vecs, clusters = [], []
        for c in range(3):
            for _ in range(3):
                v = centers[c] + rng.randn(8) * 0.05
                vecs.append(v / np.linalg.norm(v))
                clusters.append(c)
        vecs = np.asarray(vecs, np.float32)
        clusters = np.asarray(clusters)
        ts = mine_hard_negatives(vecs, [0], [1], clusters=clusters, n_neg=2)
        assert ts.nidxs.shape == (1, 2)
        assert all(clusters[n] != 0 for n in ts.nidxs[0])

    def test_negatives_are_hardest(self):
        # negatives must be the most similar non-cluster items
        vecs = np.array(
            [
                [1, 0, 0, 0],    # query (cluster 0)
                [0.99, 0.1, 0, 0],  # positive (cluster 0)
                [0.9, 0.4, 0, 0],   # hard negative (cluster 1)
                [0, 1, 0, 0],       # easy negative (cluster 2)
                [0, 0, 1, 0],       # easier (cluster 3)
            ],
            np.float32,
        )
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        clusters = np.array([0, 0, 1, 2, 3])
        ts = mine_hard_negatives(vecs, [0], [1], clusters=clusters, n_neg=2)
        assert list(ts.nidxs[0]) == [2, 3]

    def test_one_negative_per_cluster(self):
        vecs = np.array(
            [[1, 0, 0], [0.9, 0.1, 0], [0.8, 0.2, 0], [0.7, 0.3, 0], [0, 1, 0]],
            np.float32,
        )
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        clusters = np.array([0, 0, 1, 1, 2])
        ts = mine_hard_negatives(vecs, [0], [1], clusters=clusters, n_neg=2)
        # both hard negatives (2,3) are cluster 1; only one may be picked
        assert clusters[ts.nidxs[0][0]] != clusters[ts.nidxs[0][1]]


    def test_degenerate_pool_mining_terminates(self):
        # neg_pool containing only {query, positive} used to spin forever in
        # the random-filler loop (ADVICE r2); now it falls back to any
        # non-q/p global index after a bounded number of draws.
        vecs = np.eye(3, 4, dtype=np.float32)
        ts = mine_hard_negatives(
            vecs, [0], [1], n_neg=2, neg_pool=np.array([0, 1])
        )
        assert ts.nidxs.shape == (1, 2)
        assert all(n == 2 for n in ts.nidxs[0])

    def test_pool_of_only_query_and_positive_raises(self):
        vecs = np.eye(2, 4, dtype=np.float32)
        with np.testing.assert_raises(ValueError):
            mine_hard_negatives(vecs, [0], [1], n_neg=2)

    def test_vectorized_filter_matches_sequential_reference(self):
        """The vectorized candidate filter must reproduce the reference's
        sequential scan (skip self/positive/same-cluster, one per cluster,
        first n_neg in rank order) on randomized inputs."""
        from irtpu.training.mining import _filter_candidates

        def sequential(cand, qidxs, pidxs, clusters, n_neg):
            out = np.full((len(qidxs), n_neg), -1, np.int64)
            for qi in range(len(qidxs)):
                picked, seen = [], []
                for c in cand[qi]:
                    if c == qidxs[qi] or c == pidxs[qi]:
                        continue
                    if clusters is not None:
                        if clusters[c] == clusters[qidxs[qi]]:
                            continue
                        if clusters[c] in seen:
                            continue
                    picked.append(c)
                    if clusters is not None:
                        seen.append(clusters[c])
                    if len(picked) == n_neg:
                        break
                out[qi, : len(picked)] = picked
            return out

        rng = np.random.RandomState(7)
        for trial in range(20):
            N, k, nq, n_neg = 60, 25, 8, 5
            clusters = rng.randint(0, 6, N) if trial % 3 else None
            qidxs = rng.choice(N, nq, replace=False)
            pidxs = np.asarray(
                [rng.choice([v for v in range(N) if v != q]) for q in qidxs]
            )
            cand = np.stack([rng.permutation(N)[:k] for _ in range(nq)]).astype(
                np.int64
            )
            got = _filter_candidates(cand, qidxs, pidxs, clusters, n_neg)
            want = sequential(cand, qidxs, pidxs, clusters, n_neg)
            np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

    def test_mine_epoch_tuples_sampling(self):
        """qsize/poolsize sampling: only the union is extracted; negatives
        come from the sampled pool; indices are global."""
        from irtpu.training.mining import mine_epoch_tuples

        rng = np.random.RandomState(8)
        N, D = 40, 16
        vecs = rng.randn(N, D).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        paths = [f"img_{i}" for i in range(N)]
        clusters = np.arange(N) // 4
        qidxs = np.arange(0, N - 1, 4)
        pidxs = qidxs + 1
        extracted = []

        def extract(subset):
            extracted.append(len(subset))
            ids = [int(p.split("_")[1]) for p in subset]
            return vecs[ids]

        ts = mine_epoch_tuples(
            extract, paths, qidxs, pidxs, clusters=clusters, n_neg=2,
            seed=3, qsize=4, poolsize=16,
        )
        assert ts.qidxs.shape == (4,) and ts.nidxs.shape == (4, 2)
        assert extracted[0] <= 4 + 4 + 16  # union only, not the full pool
        for r in range(4):
            q = ts.qidxs[r]
            assert ts.pidxs[r] != q
            for n in ts.nidxs[r]:
                assert clusters[n] != clusters[q]


class TestTrainStep:
    def _setup(self, mesh=None):
        model = RetrievalNet(arch="resnet18", pooling="gem")
        cfg = TrainConfig(n_neg=1, lr=1e-3)
        state, tx = create_train_state(
            model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
        )
        return model, cfg, state, make_train_step(model, tx, cfg, mesh=mesh)

    def test_loss_decreases(self):
        model, cfg, state, step = self._setup()
        rng = np.random.RandomState(0)
        pixels = jnp.asarray(rng.rand(2, 3, 32, 32, 3).astype(np.float32))
        labels = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)))
        losses = []
        for _ in range(8):
            state, loss = step(state, pixels, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8

    def test_batch_stats_update(self):
        model, cfg, state, step = self._setup()
        rng = np.random.RandomState(1)
        pixels = jnp.asarray(rng.rand(1, 3, 32, 32, 3).astype(np.float32))
        labels = jnp.asarray(np.array([[0, 1, -1]], np.int32))
        before = np.asarray(
            jax.tree.leaves(state.batch_stats)[0]
        ).copy()
        state, _ = step(state, pixels, labels)
        after = np.asarray(jax.tree.leaves(state.batch_stats)[0])
        assert not np.array_equal(before, after)

    def test_data_parallel_matches_single_device(self):
        from irtpu.parallel import create_mesh

        mesh = create_mesh([8, 1])
        rng = np.random.RandomState(2)
        pixels = jnp.asarray(rng.rand(8, 3, 32, 32, 3).astype(np.float32))
        labels = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (8, 1)))

        _, _, state1, step1 = self._setup()
        _, _, state8, step8 = self._setup(mesh=mesh)
        s1, l1 = step1(state1, pixels, labels)
        s8, l8 = step8(state8, pixels, labels)
        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
        p1 = jax.tree.leaves(s1.params)[0]
        p8 = jax.tree.leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-4, atol=1e-6)


def test_train_step_remat_matches_no_remat():
    """jax.checkpoint rematerialization is semantically identity: one step
    with remat=True must produce the same loss and parameters."""

    def setup(remat):
        model = RetrievalNet(arch="resnet18", pooling="gem")
        cfg = TrainConfig(n_neg=1, lr=1e-3, remat=remat)
        state, tx = create_train_state(
            model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
        )
        return state, make_train_step(model, tx, cfg)

    rng = np.random.RandomState(9)
    pixels = jnp.asarray(rng.rand(2, 3, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)))
    s_r, step_r = setup(True)
    s_n, step_n = setup(False)
    s_r, l_r = step_r(s_r, pixels, labels)
    s_n, l_n = step_n(s_n, pixels, labels)
    np.testing.assert_allclose(float(l_r), float(l_n), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_r.params), jax.tree.leaves(s_n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_train_step_use_pallas_matches_xla_head():
    """With the custom VJP, use_pallas=True trains and matches the XLA head."""

    def setup(use_pallas):
        model = RetrievalNet(arch="resnet18", pooling="gem", use_pallas=use_pallas)
        cfg = TrainConfig(n_neg=1, lr=1e-3)
        state, tx = create_train_state(
            model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
        )
        return state, make_train_step(model, tx, cfg)

    rng = np.random.RandomState(5)
    pixels = jnp.asarray(rng.rand(2, 3, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)))
    s_p, step_p = setup(True)
    s_x, step_x = setup(False)
    s_p, l_p = step_p(s_p, pixels, labels)
    s_x, l_x = step_x(s_x, pixels, labels)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_p.params), jax.tree.leaves(s_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_train_step_from_u8_masked():
    """uint8+sizes tuple path: on-device normalize + mask-aware pooling."""
    model = RetrievalNet(arch="resnet18", pooling="gem")
    cfg = TrainConfig(n_neg=1, lr=1e-3)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
    )
    step = make_train_step(model, tx, cfg, from_u8=True)
    rng = np.random.RandomState(6)
    px = (rng.rand(2, 3, 32, 32, 3) * 255).astype(np.uint8)
    sizes = np.tile(np.array([[32, 32], [24, 32], [32, 16]], np.int32), (2, 1, 1))
    # zero padding beyond valid extents (builder invariant)
    for b in range(2):
        for t in range(3):
            h, w = sizes[b, t]
            px[b, t, h:, :] = 0
            px[b, t, :, w:] = 0
    labels = np.tile(np.array([[0, 1, -1]], np.int32), (2, 1))
    losses = []
    for _ in range(4):
        state, loss = step(state, jnp.asarray(px), jnp.asarray(sizes), jnp.asarray(labels))
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses


def test_lr_schedule_decays_per_epoch():
    """lr_decay applies per epoch (steps_per_epoch), not per step."""
    import optax

    cfg = TrainConfig(lr=1.0, lr_decay=0.5, steps_per_epoch=3, weight_decay=0.0)
    model = RetrievalNet(arch="resnet18", pooling="gem")
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
    )
    # scale_by_schedule is the last element of the chain; probe it directly
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3)}
    opt_state = tx.init(params)
    scales = []
    for _ in range(7):
        updates, opt_state = tx.update(grads, opt_state, params)
        scales.append(float(-updates["w"][0]))
    # Adam normalizes constant grads to ~1, so update magnitude tracks lr:
    # steps 0-2 -> 1.0, steps 3-5 -> 0.5, step 6 -> 0.25
    np.testing.assert_allclose(scales[0:3], [1.0] * 3, rtol=1e-3)
    np.testing.assert_allclose(scales[3:6], [0.5] * 3, rtol=1e-3)
    np.testing.assert_allclose(scales[6], 0.25, rtol=1e-3)


def test_train_epoch_runs():
    model = RetrievalNet(arch="resnet18", pooling="gem")
    cfg = TrainConfig(n_neg=1, lr=1e-4)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
    )
    step = make_train_step(model, tx, cfg)
    rng = np.random.RandomState(3)
    batches = [
        (
            rng.rand(2, 3, 32, 32, 3).astype(np.float32),
            np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)),
        )
        for _ in range(2)
    ]
    state, mean_loss = train_epoch(state, step, batches)
    assert np.isfinite(mean_loss)


def test_validation_loop():
    from irtpu.training import make_val_step, validate

    model = RetrievalNet(arch="resnet18", pooling="gem")
    cfg = TrainConfig(n_neg=1)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
    )
    val_step = make_val_step(model, cfg)
    rng = np.random.RandomState(4)
    batches = [
        (
            rng.rand(2, 3, 32, 32, 3).astype(np.float32),
            np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)),
        )
    ]
    v1 = validate(state, val_step, batches)
    v2 = validate(state, val_step, batches)
    assert np.isfinite(v1) and v1 == v2  # eval mode: deterministic


def test_run_training_resume(tmp_path):
    """Full training loop + resume from checkpoint (reference --resume)."""
    import argparse

    from irtpu.training.loop import run_training

    def mkargs(epochs, resume=None, out=None):
        return argparse.Namespace(
            arch="resnet18", pooling="gem", whiten_dim=None,
            loss="contrastive", margin=0.7, lr=1e-4, epochs=epochs,
            n_neg=1, batch_tuples=2, image_size=64,
            out_dir=out or str(tmp_path / "run"),
            data_root=str(tmp_path / "data"), resume=resume, synthetic=True,
        )

    r1 = run_training(mkargs(1))
    assert np.isfinite(r1["best_loss"])
    # resume continues at epoch 1 and completes epoch budget 2
    r2 = run_training(mkargs(2, resume=str(tmp_path / "run")))
    assert r2["epochs"] == 2
    import json, os

    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    resumed = [l for l in lines if l.get("event") == "resumed"]
    assert resumed and resumed[0]["start_epoch"] == 1
    epochs_logged = [l["epoch"] for l in lines if "epoch" in l and "train_loss" in l]
    assert epochs_logged.count(1) == 1  # epoch 1 ran exactly once post-resume


def test_sgd_optimizer_matches_torch_semantics():
    """make_optimizer('sgd') == torch.optim.SGD(momentum, weight_decay):
    wd folds into the gradient BEFORE the momentum trace; verified on a
    synthetic two-step trajectory against the hand-computed update."""
    import optax

    from irtpu.training.trainer import TrainConfig, make_optimizer

    cfg = TrainConfig(optimizer="sgd", momentum=0.9, weight_decay=0.01,
                      lr=0.1, lr_decay=1.0)
    tx = make_optimizer(cfg)
    p = {"w": jnp.asarray([1.0, -2.0], jnp.float32)}
    st = tx.init(p)
    buf = np.zeros(2, np.float32)
    w = np.array([1.0, -2.0], np.float32)
    for step, g in enumerate([np.array([0.5, 0.25], np.float32),
                              np.array([-0.1, 0.3], np.float32)]):
        upd, st = tx.update({"w": jnp.asarray(g)}, st, p)
        p = optax.apply_updates(p, upd)
        geff = g + 0.01 * w          # wd into grad first
        buf = 0.9 * buf + geff       # torch momentum buffer
        w = w - 0.1 * buf
        np.testing.assert_allclose(np.asarray(p["w"]), w, rtol=1e-6,
                                   atol=1e-7)


def test_sgd_train_step_runs():
    from irtpu.models.retrieval_net import RetrievalNet
    from irtpu.training.trainer import (
        TrainConfig, create_train_state, make_train_step,
    )

    model = RetrievalNet(arch="resnet18", pooling="gem")
    cfg = TrainConfig(optimizer="sgd", n_neg=1, batch_tuples=2, lr=1e-3)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(48, 48, 3), cfg=cfg)
    step = make_train_step(model, tx, cfg)
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.rand(2, 3, 48, 48, 3).astype(np.float32))
    lb = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)))
    w0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, loss = step(state, px, lb)
    assert np.isfinite(float(loss))
    w1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.array_equal(w0, w1)


def test_gradient_accumulation_update_every():
    """update_every=k: params move only on the k-th micro-batch, and with
    identical micro-grads the applied update equals one un-accumulated
    step (MultiSteps averages)."""
    import optax

    from irtpu.training.trainer import TrainConfig, make_optimizer

    base = TrainConfig(optimizer="sgd", momentum=0.0, weight_decay=0.0,
                       lr=0.1, lr_decay=1.0)
    acc = TrainConfig(optimizer="sgd", momentum=0.0, weight_decay=0.0,
                      lr=0.1, lr_decay=1.0, update_every=2)
    g = {"w": jnp.asarray([1.0, 2.0], jnp.float32)}
    p0 = {"w": jnp.asarray([0.0, 0.0], jnp.float32)}

    tx1 = make_optimizer(base)
    st1 = tx1.init(p0)
    u1, _ = tx1.update(g, st1, p0)
    ref = optax.apply_updates(p0, u1)

    tx2 = make_optimizer(acc)
    st2 = tx2.init(p0)
    ua, st2 = tx2.update(g, st2, p0)
    mid = optax.apply_updates(p0, ua)
    np.testing.assert_array_equal(np.asarray(mid["w"]), 0.0)  # no move yet
    ub, st2 = tx2.update(g, st2, p0)
    fin = optax.apply_updates(p0, ub)
    np.testing.assert_allclose(np.asarray(fin["w"]), np.asarray(ref["w"]),
                               rtol=1e-6)


def test_mixed_precision_train_step_bf16():
    """dtype=bfloat16: the trunk computes in bf16 while params/optimizer
    state stay f32 (TPU mixed-precision recipe); loss is finite, close to
    the f32 step's from the same init, and params actually move."""
    from irtpu.models.retrieval_net import RetrievalNet
    from irtpu.training.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    rng = np.random.RandomState(7)
    px = jnp.asarray(rng.rand(2, 3, 48, 48, 3).astype(np.float32))
    lb = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)))
    cfg = TrainConfig(n_neg=1, batch_tuples=2, lr=1e-3)

    losses = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = RetrievalNet(arch="resnet18", dtype=dt)
        state, tx = create_train_state(
            model, jax.random.PRNGKey(0), input_shape=(48, 48, 3), cfg=cfg)
        step = make_train_step(model, tx, cfg)
        w0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
        state, loss = step(state, px, lb)
        losses[name] = float(loss)
        assert np.isfinite(losses[name])
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(l.dtype == jnp.float32 for l in leaves), name
        assert not np.array_equal(
            w0, np.asarray(leaves[0])), f"{name}: params did not move"
    # bf16 compute perturbs but must not distort the loss
    assert losses["bf16"] == pytest.approx(losses["f32"], rel=0.05)


def test_train_step_netvlad_kmeans_init_finite_grads():
    """NetVLAD trains from the paper's alpha=100 k-means init without NaNs.

    Regression: alpha=100 assignment logits underflow whole clusters to
    exactly-zero soft mass, so intra-normalization sees exactly-zero VLAD
    rows; l2n's un-floored sqrt then NaN'd every gradient (round-5 fix in
    ops/normalization.py::l2n). This drives the real path: k-means head
    init -> fused-VJP NetVLAD head -> contrastive step -> finite descent.
    """
    from irtpu.models.retrieval_net import OUTPUT_DIM
    from irtpu.training import netvlad_init

    model = RetrievalNet(arch="resnet18", pooling="netvlad")
    cfg = TrainConfig(n_neg=1, lr=3e-2)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
    )
    # k-means centroids + paper init straight into the train state
    rng = np.random.RandomState(7)
    feats = rng.randn(512, OUTPUT_DIM[model.arch]).astype(np.float32)
    cent, _ = netvlad_init.kmeans(
        jnp.asarray(feats), model.netvlad_clusters, iters=5
    )
    head = netvlad_init.init_netvlad_params(np.asarray(cent), alpha=100.0)
    params = dict(state.params)
    params.update({k: jnp.asarray(v) for k, v in head.items()})
    state = state.replace(params=params)

    step = make_train_step(model, tx, cfg)
    pixels = jnp.asarray(rng.rand(2, 3, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)))
    losses = []
    for _ in range(8):
        state, loss = step(state, pixels, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    assert losses[-1] < losses[0], losses


def test_train_step_netvlad_pallas_matches_xla_head():
    """The fused NetVLAD head's custom VJP trains identically to the XLA
    oracle head (same scheme as the GeM parity test above)."""

    def setup(use_pallas):
        model = RetrievalNet(
            arch="resnet18", pooling="netvlad", use_pallas=use_pallas
        )
        # SGD: the update is linear in the gradient, so this pins gradient
        # parity directly (Adam's first-step g/(|g|+eps) normalization
        # amplifies fp-noise on near-zero grads into ~1e-5 param noise)
        cfg = TrainConfig(n_neg=1, lr=1e-3, optimizer="sgd", momentum=0.0)
        state, tx = create_train_state(
            model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=cfg
        )
        return state, make_train_step(model, tx, cfg)

    rng = np.random.RandomState(8)
    pixels = jnp.asarray(rng.rand(2, 3, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(np.tile(np.array([[0, 1, -1]], np.int32), (2, 1)))
    s_p, step_p = setup(True)
    s_x, step_x = setup(False)
    s_p, l_p = step_p(s_p, pixels, labels)
    s_x, l_x = step_x(s_x, pixels, labels)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_p.params), jax.tree.leaves(s_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
