"""Training-tuple dataset: retrieval-SfM-120k (cirtorch on-disk contract).

Mirrors the reference's ``TuplesDataset`` / ``create_epoch_tuples``
(`datasets/traindataset.py`, SURVEY.md §2/§3.2; reconstructed — empty
reference mount): a pickle ``retrieval-SfM-120k.pkl`` with per-split dicts

    {'train': {'cids': [...], 'qidxs': [...], 'pidxs': [...], 'cluster': [...]},
     'val':   {...}}

where ``cids`` name image files (under ``ims/``, sharded by the cid's last
characters in the cirtorch layout), ``qidxs``/``pidxs`` are matching
query/positive indices, and ``cluster`` is the 3D-model id used to exclude
same-landmark negatives.

TPU-native differences: per-epoch hard negatives come from the batched
extractor + device top-k (``training.mining``); tuple images are packed into
static-shape [B, T, H, W, C] batches instead of bs=1 loops.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import List, Optional

import numpy as np


def cid_to_filename(cid: str, prefix: str) -> str:
    """cirtorch image layout: ims/<c[-2:]>/<c[-4:-2]>/<c[-6:-4]>/<cid>"""
    return os.path.join(prefix, cid[-2:], cid[-4:-2], cid[-6:-4], cid)


@dataclasses.dataclass
class TuplesDataset:
    """A training split: image paths + supervision for tuple mining."""

    paths: List[str]
    qidxs: np.ndarray      # candidate query indices
    pidxs: np.ndarray      # matching positive indices
    clusters: np.ndarray   # cluster (3D model) id per image
    name: str = "train"

    @classmethod
    def from_pickle(
        cls, pkl_path: str, ims_root: Optional[str] = None, split: str = "train"
    ) -> "TuplesDataset":
        with open(pkl_path, "rb") as f:
            db = pickle.load(f)
        d = db[split]
        if ims_root is None:
            ims_root = os.path.join(os.path.dirname(pkl_path), "ims")
        cids = d["cids"]
        paths = [cid_to_filename(c, ims_root) for c in cids]
        return cls(
            paths=paths,
            qidxs=np.asarray(d["qidxs"], np.int64),
            pidxs=np.asarray(d["pidxs"], np.int64),
            clusters=np.asarray(d["cluster"], np.int64),
            name=split,
        )

    @classmethod
    def from_arrays(cls, paths, qidxs, pidxs, clusters, name="train"):
        return cls(
            paths=list(paths),
            qidxs=np.asarray(qidxs, np.int64),
            pidxs=np.asarray(pidxs, np.int64),
            clusters=np.asarray(clusters, np.int64),
            name=name,
        )

    def __len__(self) -> int:
        return len(self.qidxs)

    def epoch_tuples(
        self,
        extractor,
        n_neg: int = 5,
        qsize: Optional[int] = 2000,
        poolsize: Optional[int] = 20000,
        rng: Optional[np.random.RandomState] = None,
    ):
        """Re-mine hard negatives with the current model (reference
        ``create_epoch_tuples``): sample queries, extract pool descriptors,
        device top-k, cluster-excluded hardest negatives.

        Returns (TupleSet, pool_indices_used) — negative indices in the
        TupleSet refer to the FULL image list (global indices).
        """
        from image_retrieval_for_image_based_localization_tpu.training.mining import (
            mine_hard_negatives,
        )

        rng = rng or np.random.RandomState(0)
        order = rng.permutation(len(self.qidxs))
        if qsize is not None:
            order = order[:qsize]
        qidxs = self.qidxs[order]
        pidxs = self.pidxs[order]

        # negative pool: random subset of all images (reference semantics)
        n_imgs = len(self.paths)
        if poolsize is not None and poolsize < n_imgs:
            pool = rng.permutation(n_imgs)[:poolsize]
        else:
            pool = np.arange(n_imgs)
        # queries must be in the pool for mining's self-exclusion
        pool = np.unique(np.concatenate([pool, qidxs, pidxs]))

        pool_paths = [self.paths[i] for i in pool]
        pool_vecs = extractor.extract(pool_paths)

        # map global -> pool-local
        g2l = {g: l for l, g in enumerate(pool)}
        ts = mine_hard_negatives(
            pool_vecs,
            [g2l[q] for q in qidxs],
            [g2l[p] for p in pidxs],
            clusters=self.clusters[pool],
            n_neg=n_neg,
        )
        # translate back to global indices
        ts.qidxs = pool[ts.qidxs]
        ts.pidxs = pool[ts.pidxs]
        ts.nidxs = pool[ts.nidxs]
        return ts
