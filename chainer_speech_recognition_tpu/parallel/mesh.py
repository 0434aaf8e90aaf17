"""DP device mesh + sharding helpers (BASELINE.json:5,11; SURVEY.md §5.8).

The reference had no distributed story (§2.7); here data-parallel training is
first-class: a 1-D mesh over TPU chips, utterance batches sharded along the
``data`` axis, gradient all-reduce as ``lax.pmean`` riding ICI inside
``shard_map``. Works identically on 1 real chip, N real chips, or N fake CPU
host devices (tests, SURVEY.md §4.3).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ParallelConfig


def make_mesh(cfg: ParallelConfig) -> Mesh:
    devices = jax.devices()
    n = cfg.num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return jax.make_mesh((n,), (cfg.data_axis,), devices=devices[:n])


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (utterance) axis sharded over the DP mesh."""
    return NamedSharding(mesh, P(axis))


def dispatch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Slot-id sharding for cached dispatches: [B] shards axis 0, [K, B]
    (multi-step) shards axis 1 — K is replicated time, not data."""
    return NamedSharding(mesh, P(axis) if ndim == 1 else P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Host→device transfer of a padded bucket, sharded along the batch dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
