"""The full training loop: per-epoch hard-negative re-mining, contrastive
training, validation, best/latest checkpointing (reference `train.py`,
SURVEY.md §3.2).

Offline mode (no network, SURVEY.md §0): trains on the synthetic scene
corpus from ``data.test_datasets.make_synthetic_dataset`` — same machinery,
stand-in data. With real retrieval-SfM-120k artifacts on disk the tuple
source swaps in transparently.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import numpy as np

from image_retrieval_for_image_based_localization_tpu.api import Extractor
from image_retrieval_for_image_based_localization_tpu.models.retrieval_net import (
    RetrievalNet,
)
from image_retrieval_for_image_based_localization_tpu.training.mining import (
    mine_hard_negatives,
)
from image_retrieval_for_image_based_localization_tpu.training.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
    train_epoch,
)
from image_retrieval_for_image_based_localization_tpu.utils.checkpoint import (
    save_checkpoint,
)
from image_retrieval_for_image_based_localization_tpu.utils.config import (
    ExtractConfig,
    ModelConfig,
)
from image_retrieval_for_image_based_localization_tpu.utils.metrics import (
    MetricsLogger,
)


def _synthetic_pool(root: str, n_scenes=12, views=4, hw=(96, 128), seed=0):
    """Build a training pool: images, cluster ids, (q, p) pair indices."""
    from image_retrieval_for_image_based_localization_tpu.data.test_datasets import (
        make_synthetic_dataset,
    )

    ds = make_synthetic_dataset(
        root, name="synthtrain", n_scenes=n_scenes, views_per_scene=views,
        n_distractors=0, image_hw=hw, seed=seed,
    )
    paths = ds.image_paths
    clusters = np.zeros(len(paths), np.int64)
    for i, stem in enumerate(ds.imlist):
        clusters[i] = int(stem.split("_s")[1].split("_")[0])
    qidxs, pidxs = [], []
    for s in range(n_scenes):
        members = np.where(clusters == s)[0]
        for a, b in zip(members[:-1], members[1:]):
            qidxs.append(a)
            pidxs.append(b)
    return paths, clusters, np.asarray(qidxs), np.asarray(pidxs), ds


def _load_tuple_images(
    paths: List[str], image_size: int, hw: Tuple[int, int]
) -> np.ndarray:
    """Load + square-resize tuple images to one static shape [T, H, W, C]."""
    from image_retrieval_for_image_based_localization_tpu.data.images import (
        load_image,
        max_side_resize,
        normalize_images,
    )
    from PIL import Image

    out = np.zeros((len(paths), hw[0], hw[1], 3), np.float32)
    for i, p in enumerate(paths):
        img = max_side_resize(load_image(p), image_size)
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        img = np.asarray(pil.resize((hw[1], hw[0]), Image.BILINEAR), np.float32) / 255.0
        out[i] = normalize_images(img)
    return out


def _real_or_synthetic_pool(data_root: str):
    """Prefer a real retrieval-SfM-120k pickle under data_root; else the
    synthetic corpus (zero-egress environment, SURVEY.md §0)."""
    pkl = os.path.join(
        data_root, "train", "retrieval-SfM-120k", "retrieval-SfM-120k.pkl"
    )
    if os.path.exists(pkl):
        from image_retrieval_for_image_based_localization_tpu.data.train_dataset import (
            TuplesDataset,
        )

        ds = TuplesDataset.from_pickle(pkl, split="train")
        return ds.paths, ds.clusters, ds.qidxs, ds.pidxs, "retrieval-SfM-120k", None
    paths, clusters, qidxs, pidxs, ds = _synthetic_pool(data_root)
    return paths, clusters, qidxs, pidxs, "synthetic", ds


def run_training(args) -> dict:
    """Train from CLI args (see cli.cmd_train); returns summary dict."""
    logger = MetricsLogger(os.path.join(args.out_dir, "metrics.jsonl"), echo=True)
    model = RetrievalNet(arch=args.arch, pooling=args.pooling,
                         whiten_dim=args.whiten_dim)
    cfg = TrainConfig(
        loss=args.loss, margin=args.margin, lr=args.lr, n_neg=args.n_neg,
        batch_tuples=args.batch_tuples,
    )
    state, tx = create_train_state(model, jax.random.PRNGKey(0), cfg=cfg)
    start_epoch = 0
    if getattr(args, "resume", None):
        from image_retrieval_for_image_based_localization_tpu.utils.checkpoint import (
            load_checkpoint,
        )
        import jax.numpy as jnp

        tree, meta = load_checkpoint(args.resume, name="latest", target=state)
        state = state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=jnp.asarray(tree["step"]),
        )
        start_epoch = int(meta.get("epoch", -1)) + 1 if meta else 0
        logger.log(event="resumed", from_dir=args.resume, start_epoch=start_epoch)
    train_step = make_train_step(model, tx, cfg)

    paths, clusters, qidxs, pidxs, source, val_ds = _real_or_synthetic_pool(args.data_root)
    logger.log(event="pool", source=source, images=len(paths), pairs=len(qidxs))
    hw = (96, 128)
    images = _load_tuple_images(paths, args.image_size, hw)

    ex_cfg = ExtractConfig(
        model=ModelConfig(arch=args.arch, pooling=args.pooling,
                          whiten_dim=args.whiten_dim),
        image_size=args.image_size, batch_size=8, squarify=True,
    )

    best_loss = float("inf")
    for epoch in range(start_epoch, args.epochs):
        meta = {"arch": args.arch, "pooling": args.pooling,
                "whiten_dim": args.whiten_dim, "loss": args.loss,
                "epoch": epoch}
        # 1. re-mine hard negatives with the current model (SURVEY.md §3.5)
        ext = Extractor(ex_cfg, variables={
            "params": state.params, "batch_stats": state.batch_stats,
        })
        pool_vecs = ext.extract([images[i] for i in range(len(paths))])
        tuples = mine_hard_negatives(
            pool_vecs, qidxs, pidxs, clusters=clusters, n_neg=cfg.n_neg
        )

        # 2. batched tuple training
        T = 2 + cfg.n_neg
        order = np.random.RandomState(epoch).permutation(len(qidxs))
        batches = []
        for s in range(0, len(order), cfg.batch_tuples):
            sel = order[s : s + cfg.batch_tuples]
            if len(sel) < cfg.batch_tuples:
                break
            px = np.zeros((len(sel), T, hw[0], hw[1], 3), np.float32)
            labels = np.zeros((len(sel), T), np.int32)
            labels[:, 1] = 1
            labels[:, 2:] = -1
            for r, ti in enumerate(sel):
                px[r, 0] = images[tuples.qidxs[ti]]
                px[r, 1] = images[tuples.pidxs[ti]]
                for nn, ni in enumerate(tuples.nidxs[ti]):
                    px[r, 2 + nn] = images[ni]
            batches.append((px, labels))

        state, mean_loss = train_epoch(state, train_step, batches)
        logger.log(epoch=epoch, train_loss=mean_loss)

        # per-epoch retrieval validation (cirtorch evaluates test sets while
        # training): mAP of the corpus queries against the pool descriptors
        if val_ds is not None and val_ds.gnd:
            from image_retrieval_for_image_based_localization_tpu.evaluation.map import (
                compute_map_revisited,
            )
            from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
                full_ranks,
            )

            ext = Extractor(ex_cfg, variables={
                "params": state.params, "batch_stats": state.batch_stats,
            })
            db = ext.extract(val_ds.image_paths)
            qd = ext.extract(val_ds.query_paths, bbxs=val_ds.query_bbxs)
            res = compute_map_revisited(full_ranks(db, qd), val_ds.gnd)
            logger.log(epoch=epoch,
                       val_map_medium=float(res["medium"]["map"]))

        is_best = mean_loss < best_loss
        best_loss = min(best_loss, mean_loss)
        save_checkpoint(args.out_dir, state, meta=meta, name="latest", is_best=is_best)

    # post-training supervised (Lw) whitening from the matching pairs —
    # the reference's test-time "learn whitening" stage (SURVEY.md §3.1/3.4)
    from image_retrieval_for_image_based_localization_tpu.ops.whitening import (
        whiten_learn,
    )

    ext = Extractor(ex_cfg, variables={
        "params": state.params, "batch_stats": state.batch_stats,
    })
    pool_vecs = ext.extract([images[i] for i in range(len(paths))])
    m, P = whiten_learn(pool_vecs, qidxs, pidxs)
    np.savez(
        os.path.join(args.out_dir, "whitening.npz"),
        m=m.astype(np.float32),
        P=P.astype(np.float32),
    )
    logger.log(event="lw_whitening_saved", dims=int(P.shape[0]))

    return {"best_loss": best_loss, "epochs": args.epochs, "out_dir": args.out_dir}
