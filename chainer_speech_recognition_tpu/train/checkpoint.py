"""Checkpoint / resume: full train-state pytree, atomic, keep-last-N
(SURVEY.md §2.6/§5.4 — replaces Chainer ``save_npz``/``load_npz``).

Format: one ``step_XXXXXXXX.msgpack`` (flax.serialization of the TrainState
pytree) + the experiment ``config.json`` frozen beside it, so decode always
reconstructs the exact front-end/model that trained (BASELINE.json:5 "same
feature parameters"). Writes are write-to-temp + rename (atomic on POSIX);
resume is bitwise-exact (tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import os
import re

import flax.serialization
import jax

from ..config import Config
from .state import TrainState

# 8+ digits: step counts past 1e8 widen the zero-padded field; matching
# exactly 8 would silently hide them from latest/prune (review r3)
_CKPT_RE = re.compile(r"^step_(\d{8,})\.msgpack$")


def save_checkpoint(ckpt_dir: str, state: TrainState, config: Config,
                    keep: int = 3) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    if keep < 1:
        # validate BEFORE any I/O: a rejected call must not have already
        # written a checkpoint and overwritten the frozen config
        raise ValueError(f"keep={keep}: must retain at least the checkpoint "
                         "just written ([:-0] would silently disable pruning)")
    state = jax.device_get(state)
    step = int(state.step)
    path = os.path.join(ckpt_dir, f"step_{step:08d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    os.replace(tmp, path)

    # always rewrite atomically: retraining into an existing dir with a
    # different config must not leave a stale frozen config that decode/
    # evaluate would reconstruct the wrong model and front-end from
    cfg_path = os.path.join(ckpt_dir, "config.json")
    tmp = cfg_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(config.to_json())
    os.replace(tmp, cfg_path)

    for old in list_checkpoints(ckpt_dir)[:-keep]:
        os.remove(os.path.join(ckpt_dir, old))
    return path


def list_checkpoints(ckpt_dir: str) -> list[str]:
    if not os.path.isdir(ckpt_dir):
        return []
    # numeric sort on the step field: lexicographic order breaks once
    # digit widths mix (9-digit steps vs the 8-digit zero-padded ones)
    return sorted((f for f in os.listdir(ckpt_dir) if _CKPT_RE.match(f)),
                  key=lambda f: int(_CKPT_RE.match(f).group(1)))


def latest_checkpoint(ckpt_dir: str) -> str | None:
    ckpts = list_checkpoints(ckpt_dir)
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def _migrate_state_dict(state, target):
    """Forward-migrate old checkpoint layouts into the current pytree.

    Round-4 MHSA fusion: separate ``q``/``k``/``v`` projections became one
    ``qkv`` Dense (kernel [d, 3d] = concat of the three [d, d] kernels on
    the output axis, matching the fused layer's ``[..., :d]`` /
    ``[..., d:2d]`` / ``[..., 2d:]`` slicing; bias likewise). The rule
    applies anywhere in the tree, so optimizer moments (adam mu/nu mirror
    the param structure) migrate too. Unknown mismatches are left intact
    so ``from_state_dict`` still fails loudly on genuine corruption."""
    import numpy as np

    if not isinstance(target, dict) or not isinstance(state, dict):
        return state
    out = dict(state)
    if "qkv" in target and "qkv" not in state \
            and all(k in state for k in ("q", "k", "v")):
        q, k, v = out.pop("q"), out.pop("k"), out.pop("v")
        out["qkv"] = {
            leaf: np.concatenate(
                [np.asarray(q[leaf]), np.asarray(k[leaf]),
                 np.asarray(v[leaf])],
                axis=1 if np.asarray(q[leaf]).ndim == 2 else 0)
            for leaf in q}
    return {key: (_migrate_state_dict(val, target[key])
                  if key in target else val)
            for key, val in out.items()}


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into a freshly-initialized template state (defines the pytree).

    Old param layouts are migrated forward (``_migrate_state_dict``), so
    checkpoints trained before a compatible refactor keep loading."""
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    raw = _migrate_state_dict(
        raw, flax.serialization.to_state_dict(template))
    return flax.serialization.from_state_dict(template, raw)


def load_config(ckpt_dir: str) -> Config:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return Config.from_json(f.read())
