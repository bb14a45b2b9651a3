"""Checkpoint / resume: full-train-state snapshots + motion-only files.

Reference counterparts (SURVEY.md §5 checkpoint/resume):
- ``torch.save((gaussians.capture(), iteration), chkpnt<N>.pth)``
  (``train.py:214-216``) → ``save_checkpoint`` (whole TrainState pytree,
  including Adam moments and densification accumulators);
- ``cm.pth`` with curve/alignment state (``motion.py:337-365``) →
  ``save_motion`` / ``load_motion``.

Format: a single ``.npz`` with '/'-joined pytree paths as keys — portable,
dependency-free and endian-stable.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from deblurgs_tpu.models.motion import MotionParams
from deblurgs_tpu.train.step import TrainState


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            getattr(p, "name", None) or str(getattr(p, "idx", getattr(p, "key", "")))
            for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(tree_like, flat: dict):
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree_like)
    leaves = []
    for path, leaf in paths:
        key = "/".join(
            getattr(p, "name", None) or str(getattr(p, "idx", getattr(p, "key", "")))
            for p in path
        )
        if key not in flat:
            # field added after the checkpoint was written (e.g.
            # overflow_count) — keep the template's initial value
            leaves.append(np.asarray(leaf))
            continue
        arr = flat[key]
        assert arr.shape == np.asarray(leaf).shape, (
            f"{key}: checkpoint shape {arr.shape} != state shape "
            f"{np.asarray(leaf).shape} (capacity mismatch?)")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, state: TrainState):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(state))


def load_checkpoint(path: str, state_like: TrainState) -> TrainState:
    with np.load(path) as data:
        return _unflatten(state_like, dict(data))


def save_motion(path: str, motion: MotionParams):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, rot_ctrl=np.asarray(motion.rot_ctrl),
             trans_ctrl=np.asarray(motion.trans_ctrl),
             nu=np.asarray(motion.nu))


def load_motion(path: str) -> MotionParams:
    import jax.numpy as jnp

    with np.load(path) as d:
        return MotionParams(rot_ctrl=jnp.asarray(d["rot_ctrl"]),
                            trans_ctrl=jnp.asarray(d["trans_ctrl"]),
                            nu=jnp.asarray(d["nu"]))
