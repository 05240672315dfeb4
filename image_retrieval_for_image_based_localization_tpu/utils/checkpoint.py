"""Checkpoint / resume via Orbax.

The reference torch.saves ``{state_dict, meta, optimizer}`` per epoch plus a
``model_best`` copy, with ``--resume`` (SURVEY.md §5 "Checkpoint/resume").
Here: Orbax for the model/optimizer pytrees with the model hyperparameters
as a JSON ``meta`` sidecar (the reference's checkpoint ``meta`` dict
equivalent), ``best``/``latest`` symlink-style naming, and resume-by-path.

The descriptor index itself is a separate checkpointed artifact
(``retrieval.Index.save``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    state: Any,
    meta: Optional[Dict] = None,
    name: str = "latest",
    is_best: bool = False,
) -> str:
    """Save a (nested-pytree) train state + meta dict. Returns the path."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _tree_to_numpy(_as_tree(state)), force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(os.path.join(directory, f"{name}.meta.json"), "w") as f:
            json.dump(meta, f)
    if is_best:
        best = os.path.join(directory, "best")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(best, _tree_to_numpy(_as_tree(state)), force=True)
        ckptr.wait_until_finished()
        if meta is not None:
            with open(os.path.join(directory, "best.meta.json"), "w") as f:
                json.dump(meta, f)
    return path


def _as_tree(state: Any):
    if dataclasses.is_dataclass(state) and not isinstance(state, type):
        return {f.name: getattr(state, f.name) for f in dataclasses.fields(state)}
    return state


def load_checkpoint(
    directory: str, name: str = "latest", target: Any = None
) -> Tuple[Any, Optional[Dict]]:
    """Load a checkpoint tree (+ meta). ``target`` restores exact structure."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, name)
    # tolerate being handed the checkpoint directory itself rather than the
    # run directory (e.g. `--resume runs/x/latest` instead of `--resume
    # runs/x`): if <dir>/<name> is not a checkpoint but <dir> is one, use
    # <dir> and look for the meta sidecar next to it
    if not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")) and \
            os.path.exists(os.path.join(directory, "_CHECKPOINT_METADATA")):
        path = directory
        directory, name = os.path.split(directory)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        tree = ckptr.restore(path, _tree_to_numpy(_as_tree(target)))
    else:
        tree = ckptr.restore(path)
    meta = None
    meta_path = os.path.join(directory, f"{name}.meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
