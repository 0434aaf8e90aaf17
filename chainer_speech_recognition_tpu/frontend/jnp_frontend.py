"""Device (JAX/XLA) audio front-end, batched + length-masked.

Computes exactly the golden pipeline (``golden_np.py``) on padded batches:
for every utterance ``b`` with ``num_samples[b] = L``, the first
``1 + L // HOP`` frames of the output are bit-comparable (fp32-allclose) to
``golden_np.features(signal[:L])``; frames beyond that are zeros.

Design notes (TPU-first):
* Framing + centered reflect padding are folded into ONE gather with
  reflected sample indices, so per-utterance lengths never create dynamic
  shapes — everything is static ``[B, T_max, ...]``.
* The mel projection is a single fp32 matmul (MXU), the rest is VPU
  elementwise; XLA fuses log/normalize into the matmul epilogue.
* Δ/ΔΔ use clipped (edge-replicating) gathers driven by per-sample valid
  lengths so padded tails never leak into valid frames.

Reference parity anchor: BASELINE.json:5 ("framing, STFT, mel filterbank,
log-compression, delta/delta-delta features, utterance-level CMVN ... fused
JAX/Pallas kernels feeding an HBM-resident padded-batch").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .golden_np import hann_periodic, mel_filterbank

__all__ = ["batch_features", "frame_lengths"]


def frame_lengths(num_samples: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance valid frame counts: 1 + L // HOP."""
    return 1 + num_samples // C.HOP_LENGTH


@functools.lru_cache(maxsize=None)
def _static_tables(n_frames: int):
    """Static [T, n_fft] un-reflected sample offsets, window, mel matrix."""
    pad = C.N_FFT // 2
    t = np.arange(n_frames)[:, None] * C.HOP_LENGTH
    k = np.arange(C.N_FFT)[None, :]
    raw_idx = (t + k - pad).astype(np.int32)               # may be <0 or >=L
    win = hann_periodic(C.WIN_LENGTH)
    lpad = (C.N_FFT - C.WIN_LENGTH) // 2
    win_full = np.zeros(C.N_FFT, dtype=np.float32)
    win_full[lpad : lpad + C.WIN_LENGTH] = win.astype(np.float32)
    mel = mel_filterbank().T                               # [n_bins, n_mels]
    return raw_idx, win_full, mel


def _reflect(idx: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """np.pad mode='reflect' index map around [0, length)."""
    idx = jnp.where(idx < 0, -idx, idx)
    idx = jnp.where(idx >= length, 2 * length - 2 - idx, idx)
    # second bounce is impossible for our pad sizes (pad << min signal len),
    # but clip defensively so OOB can never occur for tiny signals.
    return jnp.clip(idx, 0, jnp.maximum(length - 1, 0))


def _edge_gather(x: jnp.ndarray, shift: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """x[:, clip(t + shift, 0, len-1)] along time axis 1. x: [B, T, ...]."""
    tmax = x.shape[1]
    t = jnp.arange(tmax, dtype=jnp.int32) + shift
    idx = jnp.clip(t[None, :], 0, (lengths - 1)[:, None]).astype(jnp.int32)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, jnp.broadcast_to(idx, idx.shape[:2] + x.shape[2:]), axis=1)


def _delta(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Regression deltas over time with per-sample edge replication."""
    denom = 2.0 * sum(n * n for n in range(1, C.DELTA_WINDOW + 1))
    out = jnp.zeros_like(x)
    for n in range(1, C.DELTA_WINDOW + 1):
        out = out + n * (_edge_gather(x, n, lengths) - _edge_gather(x, -n, lengths))
    return out / denom


@functools.partial(jax.jit, static_argnames=("apply_cmvn",))
def batch_features(
    signals: jnp.ndarray,       # [B, N_max] float32 PCM (padded)
    num_samples: jnp.ndarray,   # [B] int32 valid sample counts
    apply_cmvn: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Padded batch of signals → ([B, T_max, n_mels, 3] fp32, [B] frame lens)."""
    B, n_max = signals.shape
    t_max = C.num_frames(n_max)
    raw_idx, win_full, mel = _static_tables(t_max)
    raw_idx = jnp.asarray(raw_idx)                          # [T, n_fft]
    lengths = num_samples.astype(jnp.int32)

    # --- framing via reflected gather (center pad folded in) -------------
    # one flat gather along the sample axis: take_along_axis on [B, N] with
    # [B, T*n_fft] indices — never materializes a [B, T, N] broadcast
    idx = _reflect(raw_idx[None, :, :], lengths[:, None, None])  # [B,T,n_fft]
    frames = jnp.take_along_axis(
        signals.astype(jnp.float32), idx.reshape(B, -1), axis=1
    ).reshape(B, t_max, C.N_FFT)
    frames = frames * jnp.asarray(win_full)[None, None, :]

    # --- STFT power → mel → log ------------------------------------------
    spec = jnp.fft.rfft(frames, n=C.N_FFT, axis=-1)
    power = (spec.real.astype(jnp.float32) ** 2 + spec.imag.astype(jnp.float32) ** 2)
    # HIGHEST precision: the parity gate is fp32-allclose vs the golden
    # oracle, and default precision may take bf16 fast paths (TPU MXU /
    # CPU AMX) that cost ~4e-3 relative error in the log-mel output.
    melspec = jnp.einsum("btf,fm->btm", power, jnp.asarray(mel),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log(jnp.maximum(melspec, C.LOG_EPS))       # [B, T, n_mels]

    flens = frame_lengths(lengths)                          # [B]
    tmask = (jnp.arange(t_max)[None, :] < flens[:, None])   # [B, T]

    # --- per-utterance CMVN over valid frames -----------------------------
    if apply_cmvn:
        m = tmask[..., None].astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(logmel * m, axis=1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(logmel - mean) * m, axis=1, keepdims=True) / cnt
        logmel = (logmel - mean) * jax.lax.rsqrt(var + C.CMVN_VAR_EPS)

    # --- Δ / ΔΔ with edge replication at each utterance's true edge -------
    d1 = _delta(logmel, flens)
    d2 = _delta(d1, flens)
    feats = jnp.stack([logmel, d1, d2], axis=-1)            # [B, T, n_mels, 3]
    feats = feats * tmask[..., None, None].astype(feats.dtype)
    return feats.astype(jnp.float32), flens
