"""Synthetic toy corpus: tone sequences with a learnable audio→symbol map
(SURVEY.md §4.2 — integration tests run config 1 end-to-end on synthetic
audio; also used by bench.py so benchmarks need no external corpus).

Each vocab symbol k is a pure tone at a distinct frequency; an utterance is a
sequence of such tones. A small conv+CTC model can learn this mapping in a
few hundred steps, so "loss decreases and greedy decode recovers the toy
mapping" is a meaningful end-to-end assertion.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C


def tone_frequency(k: int, vocab_size: int | None = None) -> float:
    """Symbol id (1-based) → tone frequency in Hz.

    Small vocabularies keep the legacy linear map (200 + 150k Hz — all of
    it sits comfortably inside the mel range). Large vocabularies are
    spaced UNIFORMLY ON THE MEL SCALE within the filterbank's usable band:
    with the linear map, ids above (MEL_FMAX-200)/150 ≈ 52 would fall
    outside every mel triangle (zero feature energy → unlearnable symbol —
    this exact bug put a ~0.36 CER floor on the 82-symbol parity corpus),
    and high-frequency neighbours would share coarse mel bins.
    """
    if vocab_size is None or vocab_size <= 40:
        return 200.0 + 150.0 * k
    from ..frontend.golden_np import _hz_to_mel_slaney, _mel_to_hz_slaney

    lo = _hz_to_mel_slaney(np.float64(300.0))
    hi = _hz_to_mel_slaney(np.float64(min(C.MEL_FMAX, C.SAMPLE_RATE / 2)
                                      * 0.92))
    # ids are 1-based; id 0 is the CTC blank and never synthesized
    frac = (k - 0.5) / max(vocab_size - 1, 1)
    return float(_mel_to_hz_slaney(lo + frac * (hi - lo)))


def make_utterance(rng: np.random.Generator, label_ids, tone_len=1600,
                   noise=0.05, sr=C.SAMPLE_RATE, vocab_size=None):
    """label ids (1-based) → (signal float32, labels int32)."""
    segs = []
    for k in label_ids:
        freq = tone_frequency(int(k), vocab_size)
        t = np.arange(tone_len) / sr
        phase = rng.uniform(0, 2 * np.pi)
        segs.append(np.sin(2 * np.pi * freq * t + phase))
    sig = np.concatenate(segs) if segs else np.zeros(tone_len)
    sig = sig + noise * rng.standard_normal(len(sig))
    return sig.astype(np.float32), np.asarray(label_ids, np.int32)


def make_batch(rng: np.random.Generator, batch_size=8, vocab_size=8,
               min_len=2, max_len=6, tone_len=1600, max_label_len=None):
    """Padded batch dict in the train-step format."""
    utts = []
    for _ in range(batch_size):
        n = int(rng.integers(min_len, max_len + 1))
        # avoid adjacent repeats so greedy decode is unambiguous
        ids = []
        for _ in range(n):
            k = int(rng.integers(1, vocab_size))
            while ids and k == ids[-1]:
                k = int(rng.integers(1, vocab_size))
            ids.append(k)
        utts.append(make_utterance(rng, ids, tone_len=tone_len,
                                   vocab_size=vocab_size))

    n_max = max(len(s) for s, _ in utts)
    l_max = max_label_len or max(len(l) for _, l in utts)
    B = batch_size
    signals = np.zeros((B, n_max), np.float32)
    num_samples = np.zeros(B, np.int32)
    labels = np.full((B, l_max), C.PAD_LABEL_ID, np.int32)
    label_lengths = np.zeros(B, np.int32)
    for i, (s, l) in enumerate(utts):
        signals[i, : len(s)] = s
        num_samples[i] = len(s)
        labels[i, : len(l)] = l
        label_lengths[i] = len(l)
    return {
        "signals": signals, "num_samples": num_samples,
        "labels": labels, "label_lengths": label_lengths,
    }
