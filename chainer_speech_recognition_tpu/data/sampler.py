"""Resumable bucketed sampler + padded-batch loader + background prefetch
(SURVEY.md §2.2 "Bucketing sampler / Batch assembler / Prefetcher").

Determinism/resume contract (SURVEY.md §5.3): the batch sequence is a pure
function of (seed, epoch), so checkpointing (epoch, batch_pos) and replaying
reproduces training exactly.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .. import constants as C
from ..config import BucketConfig
from ..vocab import Vocab
from ..utils.wav import read_wav
from .buckets import BucketShape, assign_bucket, bucket_shapes
from .corpus import Utterance


class BucketSampler:
    """Groups utterances into length buckets; yields (bucket_id, utt_idx[])."""

    def __init__(self, utts: list[Utterance], cfg: BucketConfig, seed: int = 0):
        self.cfg = cfg
        self.seed = seed
        self.shapes = bucket_shapes(cfg)
        nf = np.asarray([u.num_frames for u in utts])
        nl = np.asarray([len(u.text) for u in utts])
        bidx = assign_bucket(nf, cfg)
        fits_label = nl <= cfg.max_label_len
        # CTC needs enough (subsampled) frames per label; a loose static
        # pre-filter (labels can't exceed raw frames) avoids inf losses.
        fits_ctc = nl * 2 + 1 <= nf
        keep = (bidx >= 0) & fits_label & fits_ctc
        self.num_dropped = int((~keep).sum())
        self.buckets = [np.nonzero(keep & (bidx == i))[0]
                        for i in range(len(cfg.boundaries))]

    def epoch_batches(self, epoch: int) -> list[tuple[int, np.ndarray]]:
        """Deterministic shuffled batch list for one epoch."""
        rng = np.random.default_rng([self.seed, epoch])
        batches = []
        for bid, (idxs, shape) in enumerate(zip(self.buckets, self.shapes)):
            perm = idxs[rng.permutation(len(idxs))]
            bs = shape.batch_size
            for i in range(0, len(perm) - bs + 1, bs):
                batches.append((bid, perm[i : i + bs]))
        order = rng.permutation(len(batches))
        return [batches[i] for i in order]


class BatchLoader:
    """(bucket_id, utt indices) → padded host batch dict (static shapes)."""

    def __init__(self, utts: list[Utterance], vocab: Vocab,
                 bucket_cfg: BucketConfig, read_fn=read_wav):
        self.utts = utts
        self.vocab = vocab
        self.shapes = bucket_shapes(bucket_cfg)
        self.read_fn = read_fn

    def load(self, bucket_id: int, idxs: np.ndarray) -> dict:
        shape: BucketShape = self.shapes[bucket_id]
        B = len(idxs)
        signals = np.zeros((B, shape.max_samples), np.float32)
        num_samples = np.zeros(B, np.int32)
        labels = np.full((B, shape.max_label_len), C.PAD_LABEL_ID, np.int32)
        label_lengths = np.zeros(B, np.int32)
        for i, u_idx in enumerate(idxs):
            u = self.utts[int(u_idx)]
            sig = self.read_fn(u.wav)
            n = min(len(sig), shape.max_samples)
            signals[i, :n] = sig[:n]
            num_samples[i] = n
            ids = self.vocab.encode(u.text)
            labels[i, : len(ids)] = ids
            label_lengths[i] = len(ids)
        return {"signals": signals, "num_samples": num_samples,
                "labels": labels, "label_lengths": label_lengths,
                "bucket_id": bucket_id}


class Prefetcher:
    """Single background thread + bounded queue: loads batch k+1..k+depth
    from disk while the device runs batch k (SURVEY.md §3.2 hot loop)."""

    def __init__(self, loader: BatchLoader, batches, depth: int = 4):
        self.loader = loader
        self.batches = batches
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for bid, idxs in self.batches:
                self.q.put(self.loader.load(bid, idxs))
        finally:
            self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item
