"""Checkpoint save/resume via orbax.

Replaces DetectionCheckpointer (detectron2.7z!checkpoint/
detection_checkpoint.py: resume_or_load + periodic saves every
CHECKPOINT_PERIOD iters wired in engine/defaults.py:452-453). State =
{params, opt_state, step}; `resume_or_load` restores the newest step if the
directory has one, else returns the given state unchanged (matching the
reference's resume semantics)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..pipelines.train_step import TrainState


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, state: TrainState, step: int) -> None:
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def resume_or_load(directory: str, state: TrainState) -> TrainState:
    step = latest_step(directory)
    if step is None:
        return state
    mgr = _manager(directory)
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(state._asdict())
    )
    mgr.close()
    return TrainState(**restored)


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (portable, also used by the demo/bench flows)."""
    flat = {}
    for p, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[jax.tree_util.keystr(p)] = np.asarray(v)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any) -> Any:
    z = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    vals = []
    for p, t in leaves:
        key = jax.tree_util.keystr(p)
        arr = z[key]
        assert arr.shape == t.shape, (key, arr.shape, t.shape)
        vals.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), vals
    )
