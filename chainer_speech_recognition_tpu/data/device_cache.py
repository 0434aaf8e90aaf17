"""Device-resident corpus cache: batches assembled ON the TPU.

Round-1 finding (VERDICT.md Weak #1): streaming padded batches from host
to device caps end-to-end training at the host→device link rate — measured
~0.05 GB/s over this environment's relay-attached TPU, i.e. ~150 utt/s at
1024-frame utterances even with a perfect host loader. The reference's
answer (precomputed feature cache on disk [SURVEY.md §2.1]) doesn't help:
the bytes still cross the link every step.

The TPU-native answer: cross the link ONCE. Each bucket's padded int16 PCM
(plus labels/lengths) is transferred a single time into HBM, sharded by
rows over the DP mesh (device d holds utterances d, d+n, d+2n, …). Every
training step then sends only a [B] int32 index vector; each device gathers
its own B/n rows from its local shard inside the jitted step (wide-row
gathers are MXU/VPU-friendly — per-element gathers are not). Steady-state
host→device traffic: ~1 KB/step instead of ~21 MB/step.

Budget: int16 PCM ≈ 32 KB/s of audio; a 16 GB-HBM chip shards ~130 h of
speech per chip across an 8-chip mesh minus model/activations. Corpora
beyond that fall back to the streaming Prefetcher path (train/loop.py
picks per config; ``estimate_bytes`` lets callers decide).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .buckets import bucket_shapes
from .sampler import BucketSampler


def estimate_bytes(sampler: BucketSampler) -> int:
    """Device bytes the cache would occupy across the whole mesh."""
    total = 0
    for shape, idxs in zip(sampler.shapes, sampler.buckets):
        per_row = (shape.max_samples * 2          # int16 PCM
                   + shape.max_label_len * 4 + 8)  # labels + lengths
        total += per_row * len(idxs)
    return total


class DeviceCorpusCache:
    """Per-bucket device-resident padded corpus, rows sharded over the mesh.

    ``buckets[bid]`` is a dict of jax Arrays sharded ``P(axis)`` on rows:
      signals_i16   [n*R, S_b]   int16
      num_samples   [n*R]        int32
      labels        [n*R, L]     int32
      label_lengths [n*R]        int32
    where R = rows per device (padded to equal length by repeating a real
    row — padded slots are never sampled). ``epoch_batches`` emits
    device-LOCAL slot ids: segment d of each [B] index vector addresses
    device d's own shard, so the in-step gather is local (no collectives).
    """

    def __init__(self, mesh: Mesh, loader, sampler: BucketSampler,
                 axis: str = "data", seed: int = 0):
        self.n = mesh.devices.size
        self.axis = axis
        self.seed = seed
        self.shapes = sampler.shapes
        sharding = NamedSharding(mesh, P(axis))
        self.buckets: dict[int, dict] = {}
        self.real_counts: dict[int, np.ndarray] = {}   # [n] per device
        self.utt_map: dict[int, np.ndarray] = {}       # [n, R] -> corpus idx
        for bid, idxs in enumerate(sampler.buckets):
            if len(idxs) == 0:
                continue
            local = [idxs[d :: self.n] for d in range(self.n)]
            R = max(len(l) for l in local)
            counts = np.asarray([len(l) for l in local], np.int32)
            padded = np.stack([
                np.concatenate([l, np.full(R - len(l), idxs[0],
                                           dtype=idxs.dtype)])
                for l in local])                        # [n, R]
            host = loader.load(bid, padded.reshape(-1))
            sig = host.get("signals_i16")
            if sig is None:                             # float loader: re-
                sig = np.clip(host["signals"] * 32768.0,  # quantize (source
                              -32768, 32767).astype(np.int16)  # was PCM16)
            self.buckets[bid] = {
                "signals_i16": jax.device_put(sig, sharding),
                "num_samples": jax.device_put(
                    host["num_samples"].astype(np.int32), sharding),
                "labels": jax.device_put(host["labels"], sharding),
                "label_lengths": jax.device_put(
                    host["label_lengths"], sharding),
            }
            self.real_counts[bid] = counts
            self.utt_map[bid] = padded

    def epoch_dispatches(self, epoch: int,
                         steps_per_dispatch: int) -> list[tuple[int, np.ndarray]]:
        """Group the epoch's batches into [K, B] slot matrices of same-bucket
        consecutive batches, for make_cached_train_step(steps_per_dispatch=K).
        The per-bucket batch count is rounded up to a multiple of K by
        wrapping (same oversampling policy as epoch_batches); dispatch order
        is shuffled deterministically."""
        k = steps_per_dispatch
        if k <= 1:
            return self.epoch_batches(epoch)
        per_bucket: dict[int, list[np.ndarray]] = {}
        for bid, slots in self.epoch_batches(epoch):
            per_bucket.setdefault(bid, []).append(slots)
        rng = np.random.default_rng([self.seed, epoch, 0xD15B])
        out = []
        for bid, vecs in per_bucket.items():
            while len(vecs) % k:
                vecs.append(vecs[len(vecs) % k - 1])     # wrap-pad
            for j in range(0, len(vecs), k):
                out.append((bid, np.stack(vecs[j : j + k])))
        order = rng.permutation(len(out))
        return [out[i] for i in order]

    def epoch_batches(self, epoch: int) -> list[tuple[int, np.ndarray]]:
        """Deterministic per-(seed, epoch) list of (bucket_id, local slot
        ids [B]); segment d of each vector is device d's sample of its own
        rows. Batches-per-bucket is ceil(max_rows_per_device / k): every
        real row is visited at least once per epoch; devices with fewer
        rows wrap around their permutation (standard distributed-sampler
        padding — slight oversampling instead of dropping remainders)."""
        rng = np.random.default_rng([self.seed, epoch, 0xCACE])
        out = []
        for bid, cache in self.buckets.items():
            B = self.shapes[bid].batch_size
            if B % self.n:
                raise ValueError(
                    f"bucket {bid}: batch size {B} not divisible by "
                    f"mesh size {self.n} — adjust buckets.batch_sizes")
            k = B // self.n
            counts = self.real_counts[bid]
            nb = -(-int(max(counts)) // k)         # ceil: cover every row
            perms = [np.resize(rng.permutation(int(c)), nb * k)
                     for c in counts]              # wrap-pad short devices
            for j in range(nb):
                seg = [p[j * k : (j + 1) * k] for p in perms]
                out.append((bid, np.concatenate(seg).astype(np.int32)))
        order = rng.permutation(len(out))
        return [out[i] for i in order]

    def utterance_indices(self, bid: int, slot_ids: np.ndarray) -> np.ndarray:
        """Map one batch's device-local slot ids back to corpus indices
        (segment d indexes utt_map[d]) — for tests/debugging."""
        k = len(slot_ids) // self.n
        return np.concatenate([
            self.utt_map[bid][d][slot_ids[d * k : (d + 1) * k]]
            for d in range(self.n)])
