"""Graded-config evidence-pack machinery (benchmarks.run_graded_config).

Runs the config-5 code path — distractor-padded gallery, on-device PCA
whitening, timed bf16 streaming kNN, localization recall@k, pairs file,
and the mmap external-gallery index artifact with its reload probe — at
toy scale on CPU (GALLERY_SCALE + GRADED_CONFIGS monkeypatched). The
full-scale run is the committed evidence pack (runs/graded/), this pins
the code path it exercises.
"""

import dataclasses
import json
import os

import numpy as np

from irtpu import benchmarks
from irtpu.utils.config import (
    GRADED_CONFIGS,
    ExtractConfig,
    IndexConfig,
    ModelConfig,
)
from irtpu.utils.metrics import MetricsLogger


def test_config5_path_with_artifacts(tmp_path, monkeypatch):
    small = dataclasses.replace(
        GRADED_CONFIGS[5],
        extract=ExtractConfig(model=ModelConfig(arch="resnet18"),
                              image_size=96, batch_size=8),
        index=IndexConfig(whitening="pca"),
    )
    monkeypatch.setitem(benchmarks.GRADED_CONFIGS, 5, small)
    monkeypatch.setitem(benchmarks.GALLERY_SCALE, 5, 3000)

    log = str(tmp_path / "config5.jsonl")
    out = benchmarks.run_graded_config(
        5, synth_root=str(tmp_path / "synth"),
        data_root=str(tmp_path / "nodata"),
        logger=MetricsLogger(path=log, echo=False),
        out_dir=str(tmp_path / "artifacts"),
    )
    # real core neighbors must beat the 3k random distractors
    assert out["top1_in_core"] > 0.8

    lines = [json.loads(l) for l in open(log)]
    events = {l.get("event") for l in lines}
    assert {"localization_recall", "pairs_written", "index_artifact"} <= events

    rec = next(l for l in lines if l.get("event") == "localization_recall")
    assert rec["recall_at_20"] >= rec["recall_at_1"] >= 0.0

    # pairs file: Nq * 20 lines of "query db"
    ppath = str(tmp_path / "artifacts" / "config5_pairs.txt")
    assert os.path.exists(ppath)
    pairs = [l.split() for l in open(ppath) if l.strip()]
    assert len(pairs) > 0 and all(len(p) == 2 for p in pairs)

    # index artifact: npz + uncompressed mmap sidecar, reload-probed in-run
    art = next(l for l in lines if l.get("event") == "index_artifact")
    assert art["reload_query_probe"] == "exact"
    assert os.path.exists(str(tmp_path / "artifacts" / "config5_index.npz"))
    sidecar = str(tmp_path / "artifacts" / "config5_index.gallery.npy")
    assert os.path.getsize(sidecar) == art["gallery_sidecar_bytes"]
