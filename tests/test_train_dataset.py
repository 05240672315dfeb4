"""TuplesDataset: pickle contract, cid layout, epoch tuple mining."""

import os
import pickle

import numpy as np

from irtpu.data.train_dataset import TuplesDataset, cid_to_filename


def test_cid_layout():
    assert cid_to_filename("abcdef123456", "/ims") == "/ims/56/34/12/abcdef123456"


def _make_pickle(tmp_path, n=12):
    cids = [f"{i:012d}" for i in range(n)]
    db = {
        "train": {
            "cids": cids,
            "qidxs": [0, 3, 6],
            "pidxs": [1, 4, 7],
            "cluster": [i // 3 for i in range(n)],
        },
        "val": {"cids": cids[:6], "qidxs": [0], "pidxs": [1], "cluster": [0, 0, 0, 1, 1, 1]},
    }
    p = str(tmp_path / "retrieval-SfM-120k.pkl")
    with open(p, "wb") as f:
        pickle.dump(db, f)
    return p


def test_from_pickle(tmp_path):
    p = _make_pickle(tmp_path)
    ds = TuplesDataset.from_pickle(p, split="train")
    assert len(ds) == 3
    assert ds.paths[0].endswith("00/00/00/000000000000")
    val = TuplesDataset.from_pickle(p, split="val")
    assert len(val) == 1


class _FakeExtractor:
    """Deterministic 'descriptors' keyed by path hash, cluster-structured."""

    def __init__(self, clusters):
        self.clusters = clusters

    def extract(self, paths):
        rng = np.random.RandomState(0)
        centers = rng.randn(10, 16)
        out = []
        for p in paths:
            i = int(os.path.basename(p))
            c = self.clusters[i]
            v = centers[c] + rng.randn(16) * 0.01
            out.append(v / np.linalg.norm(v))
        return np.asarray(out, np.float32)


def test_epoch_tuples_mining(tmp_path):
    p = _make_pickle(tmp_path)
    ds = TuplesDataset.from_pickle(p, split="train")
    ex = _FakeExtractor(ds.clusters)
    ts = ds.epoch_tuples(ex, n_neg=2, qsize=None, poolsize=None)
    assert ts.nidxs.shape == (3, 2)
    for qi, q in enumerate(ts.qidxs):
        for ng in ts.nidxs[qi]:
            assert ds.clusters[ng] != ds.clusters[q]
