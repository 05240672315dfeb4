"""The full training loop: per-epoch hard-negative re-mining, contrastive
training, validation, best/latest checkpointing (reference `train.py`,
SURVEY.md §3.2).

TPU-native data path (no whole-pool RAM, no shape churn):

  * pool descriptors for mining / validation / post-train Lw come from
    ``Extractor.extract(paths)`` — RAW pixels stream per-batch through the
    same uint8 device pipeline serving does (the extractor normalizes on
    device; never hand it normalized arrays);
  * tuple batches are built per step from paths: each image is decoded,
    max-side-resized to ``--image-size`` and placed into ONE static bucket
    shape (header-probed global max, rounded to the trunk stride) as uint8
    with its valid (h, w) extents — the train step normalizes and builds the
    validity mask on device and the mask flows into mask-aware pooling;
  * a small LRU keeps recently used resized images (tuples share pool
    images heavily within an epoch); a prefetch thread keeps the device fed;
  * the lr schedule decays per EPOCH (TrainConfig.steps_per_epoch), matching
    the reference's ExponentialLR stepping.

Offline mode (no network, SURVEY.md §0): trains on the synthetic scene
corpus from ``data.test_datasets.make_synthetic_dataset`` — same machinery,
stand-in data. With real retrieval-SfM-120k artifacts on disk the tuple
source swaps in transparently.
"""

from __future__ import annotations

import collections
import os
from typing import Iterable, Optional, Sequence, Tuple

import jax
import numpy as np

from image_retrieval_for_image_based_localization_tpu.api import Extractor, _prefetched
from image_retrieval_for_image_based_localization_tpu.models.retrieval_net import (
    RetrievalNet,
)
from image_retrieval_for_image_based_localization_tpu.training.mining import (
    TupleSet,
    mine_epoch_tuples,
)
from image_retrieval_for_image_based_localization_tpu.training.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
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


def _real_or_synthetic_pool(data_root: str, n_scenes: int = 12, views: int = 4):
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
    paths, clusters, qidxs, pidxs, ds = _synthetic_pool(
        data_root, n_scenes=n_scenes, views=views
    )
    return paths, clusters, qidxs, pidxs, "synthetic", ds


class _ResizedImageCache:
    """LRU of max-side-resized uint8 images (tuples reuse pool images)."""

    def __init__(self, paths: Sequence[str], image_size: int, capacity: int = 256):
        self.paths = paths
        self.image_size = image_size
        self._lru: "collections.OrderedDict[int, np.ndarray]" = collections.OrderedDict()
        self.capacity = capacity

    def get(self, idx: int) -> np.ndarray:
        """uint8 HWC, max side == image_size (shrink or grow)."""
        hit = self._lru.get(idx)
        if hit is not None:
            self._lru.move_to_end(idx)
            return hit
        from image_retrieval_for_image_based_localization_tpu.data.images import (
            load_image,
            max_side_resize,
        )

        # upscale=True must match probe_bucket_shape's target-size math
        # (the static bucket is sized for resized-both-ways images)
        img = max_side_resize(
            load_image(self.paths[idx]), self.image_size, resize_filter="lanczos"
        )
        u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        self._lru[idx] = u8
        if len(self._lru) > self.capacity:
            self._lru.popitem(last=False)
        return u8


def probe_bucket_shape(
    paths: Sequence[str], image_size: int, multiple: int = 32
) -> Tuple[int, int]:
    """One static tuple-batch shape: the header-probed global max (h, w)
    after max-side resize, rounded up to the trunk stride. A single shape
    means a single train-step compilation for the whole run."""
    from image_retrieval_for_image_based_localization_tpu.data.images import (
        bucket_shape,
        probe_size,
    )

    mh = mw = 1
    for p in paths:
        h, w = probe_size(p)
        m = max(h, w)
        if m != image_size:
            s = image_size / m
            h, w = max(1, round(h * s)), max(1, round(w * s))
        mh, mw = max(mh, h), max(mw, w)
    return bucket_shape(mh, mw, multiple)


def iter_tuple_batches(
    cache: _ResizedImageCache,
    tuples: TupleSet,
    batch_tuples: int,
    hw: Tuple[int, int],
    order: Optional[np.ndarray] = None,
) -> Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (pixels_u8 [B,T,H,W,3], sizes [B,T,2], labels [B,T]) batches.

    Images are decoded lazily per batch (LRU-cached) — the pool never sits
    in host RAM. Short tails are dropped (reference drops partial batches).
    """
    H, W = hw
    n_neg = tuples.nidxs.shape[1]
    T = 2 + n_neg
    nq = len(tuples.qidxs)
    if order is None:
        order = np.arange(nq)
    for s in range(0, nq, batch_tuples):
        sel = order[s : s + batch_tuples]
        if len(sel) < batch_tuples:
            break
        px = np.zeros((len(sel), T, H, W, 3), np.uint8)
        sizes = np.zeros((len(sel), T, 2), np.int32)
        labels = np.zeros((len(sel), T), np.int32)
        labels[:, 1] = 1
        labels[:, 2:] = -1
        for r, ti in enumerate(sel):
            members = [tuples.qidxs[ti], tuples.pidxs[ti], *tuples.nidxs[ti]]
            for t, gi in enumerate(members):
                img = cache.get(int(gi))
                h, w = img.shape[:2]
                px[r, t, :h, :w] = img
                sizes[r, t] = (h, w)
        yield px, sizes, labels


def run_training(args) -> dict:
    """Train from CLI args (see cli.cmd_train); returns summary dict."""
    logger = MetricsLogger(os.path.join(args.out_dir, "metrics.jsonl"), echo=True)
    import jax.numpy as jnp

    # compute dtype: bf16 convs halve the MXU cost of the train step while
    # params/optimizer state/loss stay f32 (flax param_dtype default) — the
    # standard TPU mixed-precision recipe (no loss scaling needed for bf16).
    # Default f32 matches the reference's training numerics exactly.
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        getattr(args, "dtype", "float32")]
    model = RetrievalNet(arch=args.arch, pooling=args.pooling,
                         whiten_dim=args.whiten_dim, dtype=dtype,
                         netvlad_clusters=getattr(args, "netvlad_clusters", 64),
                         use_pallas=getattr(args, "pallas", False))

    paths, clusters, qidxs, pidxs, source, val_ds = _real_or_synthetic_pool(
        args.data_root,
        n_scenes=getattr(args, "synth_scenes", 12),
        views=getattr(args, "synth_views", 4),
    )
    logger.log(event="pool", source=source, images=len(paths), pairs=len(qidxs))

    qsize = getattr(args, "qsize", None)
    poolsize = getattr(args, "poolsize", None)
    epoch_pairs = min(qsize, len(qidxs)) if qsize else len(qidxs)
    update_every = max(getattr(args, "update_every", 1), 1)
    # lr decays per APPLIED optimizer step (MultiSteps under accumulation)
    steps_per_epoch = max(
        epoch_pairs // (args.batch_tuples * update_every), 1)
    cfg = TrainConfig(
        loss=args.loss, margin=args.margin, lr=args.lr, n_neg=args.n_neg,
        batch_tuples=args.batch_tuples, steps_per_epoch=steps_per_epoch,
        optimizer=getattr(args, "optimizer", "adam"),
        momentum=getattr(args, "momentum", 0.9),
        update_every=update_every,
        remat=getattr(args, "remat", False),
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
    train_step = make_train_step(model, tx, cfg, from_u8=True)

    tuple_hw = probe_bucket_shape(paths, args.image_size)
    cache = _ResizedImageCache(paths, args.image_size)
    logger.log(event="tuple_bucket", h=tuple_hw[0], w=tuple_hw[1],
               steps_per_epoch=steps_per_epoch)

    ex_cfg = ExtractConfig(
        model=ModelConfig(arch=args.arch, pooling=args.pooling,
                          whiten_dim=args.whiten_dim,
                          netvlad_clusters=getattr(args, "netvlad_clusters", 64)),
        image_size=args.image_size,
        batch_size=getattr(args, "batch_size", 8),
    )

    def extractor():
        return Extractor(ex_cfg, variables={
            "params": state.params, "batch_stats": state.batch_stats,
        })

    # NetVLAD centroids from k-means on trunk local features (the reference
    # lineage's init — SURVEY.md §2 "centroids init from k-means"); skipped
    # on resume, where the checkpoint already carries trained centroids.
    if args.pooling == "netvlad" and start_epoch == 0:
        from image_retrieval_for_image_based_localization_tpu.training.netvlad_init import (
            init_netvlad_from_images,
        )

        sample = list(paths[: min(len(paths), 200)])
        new_vars = init_netvlad_from_images(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            sample, ex_cfg,
        )
        state = state.replace(params=new_vars["params"])
        logger.log(event="netvlad_kmeans_init", images=len(sample),
                   clusters=int(model.netvlad_clusters))

    best_loss = float("inf")
    for epoch in range(start_epoch, args.epochs):
        meta = {"arch": args.arch, "pooling": args.pooling,
                "whiten_dim": args.whiten_dim, "loss": args.loss,
                "dtype": getattr(args, "dtype", "float32"),
                "epoch": epoch}
        # 1. re-mine hard negatives with the current model (SURVEY.md §3.5):
        # qsize/poolsize sampling per the reference's create_epoch_tuples —
        # only the sampled union is extracted, streamed from paths through
        # the uint8 device pipeline
        tuples = mine_epoch_tuples(
            extractor().extract, paths, qidxs, pidxs, clusters=clusters,
            n_neg=cfg.n_neg, seed=epoch, qsize=qsize, poolsize=poolsize,
        )

        # 2. batched tuple training — one static shape, prefetch-fed
        order = np.random.RandomState(epoch).permutation(len(tuples.qidxs))
        losses = []
        batches = iter_tuple_batches(
            cache, tuples, cfg.batch_tuples, tuple_hw, order=order
        )
        for px, sizes, labels in _prefetched(batches, 2):
            state, loss = train_step(
                state, jnp.asarray(px), jnp.asarray(sizes), jnp.asarray(labels)
            )
            losses.append(float(loss))
        mean_loss = float(np.mean(losses)) if losses else 0.0
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

            ex = extractor()
            db = ex.extract(val_ds.image_paths)
            qd = ex.extract(val_ds.query_paths, bbxs=val_ds.query_bbxs)
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

    pool_vecs = extractor().extract(paths)
    m, P = whiten_learn(pool_vecs, qidxs, pidxs)
    np.savez(
        os.path.join(args.out_dir, "whitening.npz"),
        m=m.astype(np.float32),
        P=P.astype(np.float32),
    )
    logger.log(event="lw_whitening_saved", dims=int(P.shape[0]))

    return {"best_loss": best_loss, "epochs": args.epochs, "out_dir": args.out_dir}
