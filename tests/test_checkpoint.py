"""Checkpoint save/load roundtrip (orbax) + metrics logger."""

import json

import numpy as np
import jax

from irtpu.models import RetrievalNet
from irtpu.training import TrainConfig, create_train_state
from irtpu.utils.checkpoint import save_checkpoint, load_checkpoint
from irtpu.utils.metrics import MetricsLogger, phase_timer


def test_checkpoint_roundtrip(tmp_path):
    model = RetrievalNet(arch="resnet18", pooling="gem")
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), input_shape=(32, 32, 3), cfg=TrainConfig()
    )
    meta = {"arch": "resnet18", "pooling": "gem"}
    save_checkpoint(str(tmp_path / "ckpt"), state, meta=meta, name="latest", is_best=True)

    tree, meta2 = load_checkpoint(str(tmp_path / "ckpt"), name="latest")
    assert meta2 == meta
    orig = jax.tree.leaves(state.params)
    loaded = jax.tree.leaves(tree["params"])
    assert len(orig) == len(loaded)
    for a, b in zip(orig, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # best copy also exists
    tree_b, meta_b = load_checkpoint(str(tmp_path / "ckpt"), name="best")
    assert meta_b == meta


def test_checkpoint_restore_into_state(tmp_path):
    model = RetrievalNet(arch="resnet18", pooling="gem")
    state, tx = create_train_state(
        model, jax.random.PRNGKey(1), input_shape=(32, 32, 3), cfg=TrainConfig()
    )
    save_checkpoint(str(tmp_path / "c"), state, name="latest")
    state2, _ = create_train_state(
        model, jax.random.PRNGKey(2), input_shape=(32, 32, 3), cfg=TrainConfig()
    )
    tree, _ = load_checkpoint(str(tmp_path / "c"), name="latest", target=state2)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(tree["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_load_accepts_checkpoint_dir_itself(tmp_path):
    """`--resume runs/x/latest` (the checkpoint dir, not the run dir) must
    work: this exact footgun aborted a real resume mid-campaign (round 4 —
    FileNotFoundError at runs/train_ref_geom/latest/latest). The loader now
    detects a direct checkpoint path and resolves the meta sidecar beside it."""
    model = RetrievalNet(arch="resnet18", pooling="gem")
    state, tx = create_train_state(
        model, jax.random.PRNGKey(3), input_shape=(32, 32, 3), cfg=TrainConfig()
    )
    meta = {"epoch": 6}
    save_checkpoint(str(tmp_path / "run"), state, meta=meta, name="latest")
    tree, meta2 = load_checkpoint(str(tmp_path / "run" / "latest"), name="latest")
    assert meta2 == meta
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(tree["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path)
    logger.log(phase="x", value=1.5)
    with phase_timer("work", logger, items=10):
        pass
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["phase"] == "x"
    assert lines[1]["phase"] == "work" and "items_per_sec" in lines[1]
