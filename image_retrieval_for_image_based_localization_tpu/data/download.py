"""Dataset / model-zoo bootstrap.

The reference downloads its test sets, gnd pickles, and pretrained
checkpoints at first use (`utils/download.py`, SURVEY.md §2). This
environment is zero-egress (SURVEY.md §0), so:

  * if the artifacts are already on disk (mounted/preloaded), they're
    verified and used;
  * otherwise a clear actionable error lists exactly what to place where —
    no silent synthetic substitution (callers opt into
    ``make_synthetic_dataset`` explicitly).
"""

from __future__ import annotations

import os
from typing import Dict, List

# Canonical artifact layout (reference-compatible): relative to data_root.
TEST_DATASET_FILES: Dict[str, List[str]] = {
    name: [f"{name}/gnd_{name}.pkl", f"{name}/jpg"]
    for name in ("oxford5k", "paris6k", "roxford5k", "rparis6k")
}

TRAIN_DATASET_FILES = {
    "retrieval-SfM-120k": [
        "train/retrieval-SfM-120k/retrieval-SfM-120k.pkl",
        "train/retrieval-SfM-120k/ims",
    ],
}


def check_test_dataset(data_root: str, dataset: str) -> bool:
    """True iff all artifacts for ``dataset`` exist under ``data_root``."""
    return all(
        os.path.exists(os.path.join(data_root, rel))
        for rel in TEST_DATASET_FILES.get(dataset, [f"{dataset}/gnd_{dataset}.pkl"])
    )


def download_test(data_root: str, dataset: str) -> None:
    """Verify test-set presence; raise with instructions if absent."""
    if check_test_dataset(data_root, dataset):
        return
    rels = TEST_DATASET_FILES.get(dataset, [])
    raise FileNotFoundError(
        f"Dataset '{dataset}' not found under {data_root} and this "
        f"environment has no network access. Place these artifacts:\n  "
        + "\n  ".join(os.path.join(data_root, r) for r in rels)
        + "\n(or generate a synthetic stand-in with "
        "data.test_datasets.make_synthetic_dataset)."
    )


def download_train(data_root: str, dataset: str = "retrieval-SfM-120k") -> None:
    """Verify training-set presence; raise with instructions if absent."""
    rels = TRAIN_DATASET_FILES.get(dataset, [])
    if all(os.path.exists(os.path.join(data_root, r)) for r in rels):
        return
    raise FileNotFoundError(
        f"Training dataset '{dataset}' not found under {data_root}; no "
        f"network access. Required:\n  "
        + "\n  ".join(os.path.join(data_root, r) for r in rels)
    )
