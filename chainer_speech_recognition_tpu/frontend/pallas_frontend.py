"""Pallas fused front-end kernel: window → DFT → power → mel → log in one
VMEM-resident pass (BASELINE.json:5 "the audio front-end ... becomes fused
JAX/Pallas kernels feeding an HBM-resident padded-batch"; SURVEY.md §7
Phase 3a).

Division of labor:
* XLA (jnp_frontend): reflect-extension + gather-free framing (reshape +
  static slices) — layout transforms XLA compiles optimally;
* Pallas (this kernel): everything between frames and log-mel. The frame
  block is loaded to VMEM once and the windowing, the real/imag DFT
  matmuls (MXU), the power, the mel projection (MXU) and the log run
  back-to-back without touching HBM — the [B,T,257] power spectrum never
  exists in memory, only the [B,T,n_mels] output is written.
* CMVN + Δ/ΔΔ stay in XLA (cross-frame reductions over the whole
  utterance; cheap elementwise).

The DFT is two fp32 matmuls against precomputed windowed-DFT matrices
(window folded in): mathematically identical to the golden rfft path up to
fp32 summation order. Differential tests: tests/test_pallas_frontend.py.

This kernel is the DEFAULT front-end on TPU (features.frontend_impl="auto"):
drain-measured 1.9× faster than the jnp/rfft path inside the train step
(round 3; round-2 HIGHEST variant was 1.6×). Parity vs the fp32 rfft path:
5.4e-4 max abs on the final CMVN'd features (the bf16x3 DFT — see
_dft_tables); the jnp path (2.6e-5 vs golden on TPU, 4e-4 absolute on
CPU) is the default off-TPU, the tight-parity option, and the
differential oracle partner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .. import constants as C
from .golden_np import hann_periodic, mel_filterbank

_NBINS = 1 + C.N_FFT // 2                 # 257
_TTILE = 256                              # frames per grid step
_K = C.N_FFT // C.HOP_LENGTH              # full hop rows per frame (3)


@functools.lru_cache(maxsize=None)
def _dft_tables():
    """Windowed DFT matrix [N_FFT, 2·384] (re‖im, bin axis lane-padded),
    pre-split into bf16 hi/lo halves, + padded mel [384, 128] fp32.

    The DFT runs as a manual 3-pass bf16 product (hi·hi + hi·lo + lo·hi):
    on the MXU, fp32 ``Precision.HIGHEST`` is a 6-pass bf16 decomposition,
    so the 3-pass form is exactly half the MXU work at ~2⁻²¹ relative
    error — measured log-mel parity vs the fp32 rfft path stays at the
    1e-4 level (test tolerance 5e-4). PCM16-quantized signals split into
    hi+lo EXACTLY (15 mantissa bits ≤ 8+8). The mel projection stays
    HIGHEST: it is 5× fewer FLOPs and its output feeds a log() where
    near-silent bins would amplify error.
    """
    n = C.N_FFT
    t = np.arange(n)[:, None]
    k = np.arange(_NBINS)[None, :]
    ang = -2.0 * np.pi * t * k / n
    win = hann_periodic(C.WIN_LENGTH)
    lpad = (n - C.WIN_LENGTH) // 2
    win_full = np.zeros(n)
    win_full[lpad : lpad + C.WIN_LENGTH] = win
    w_re = np.cos(ang) * win_full[:, None]
    w_im = np.sin(ang) * win_full[:, None]
    # pad the bin axis to a lane multiple; extra bins are zero rows in mel
    nb_pad = -(-_NBINS // 128) * 128                       # 384
    w = np.zeros((n, 2 * nb_pad), np.float32)
    w[:, :_NBINS] = w_re
    w[:, nb_pad : nb_pad + _NBINS] = w_im
    mel = mel_filterbank().T                               # [257, n_mels]
    mel_pad = -(-C.N_MELS // 128) * 128                    # 128
    mel_p = np.zeros((nb_pad, mel_pad), np.float32)
    mel_p[:_NBINS, : C.N_MELS] = mel
    return w, mel_p


@functools.lru_cache(maxsize=None)
def _split_tables():
    # NumPy (ml_dtypes) host constants — never cache jnp arrays from a
    # function that can first run inside a jit trace (tracer leak)
    import ml_dtypes

    w, mel_p = _dft_tables()
    w_hi = w.astype(ml_dtypes.bfloat16)
    w_lo = (w - w_hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return w_hi, w_lo, mel_p


def _dft_mel_log(fr, nbins, whi_ref, wlo_ref, mel_ref):
    """[TTILE, N_FFT] frames → [TTILE, mel_pad] log-mel (VMEM math)."""
    fr_hi = fr.astype(jnp.bfloat16)
    fr_lo = (fr - fr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    reim = (dot(fr_hi, whi_ref[:, :]) + dot(fr_hi, wlo_ref[:, :])
            + dot(fr_lo, whi_ref[:, :]))                   # [TTILE, 2·384]
    re = reim[:, :nbins]
    im = reim[:, nbins:]
    power = re * re + im * im                              # [TTILE, 384]
    melspec = jnp.dot(power, mel_ref[:, :],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(melspec, C.LOG_EPS))


def _kernel(nbins, frames_ref, whi_ref, wlo_ref, mel_ref, out_ref):
    out_ref[0] = _dft_mel_log(frames_ref[0], nbins,
                              whi_ref, wlo_ref, mel_ref)


def _kernel_rows(nbins, ttile, cur_ref, nxt_ref, whi_ref, wlo_ref, mel_ref,
                 out_ref):
    """Framing fused in-kernel: build the [TTILE, N_FFT] frame block from
    hop-rows in VMEM (frame t = rows t..t+3 → 160+160+160+32 samples), so
    the [B, T, N_FFT] frames tensor — a 3.2×-inflated copy of the signal,
    ~270 MB of HBM round-trip per B64×1024 batch — never exists. The halo
    (rows beyond this tile) comes from a second view of the same array
    shifted one block (+8 rows used)."""
    rows = jnp.concatenate([cur_ref[0], nxt_ref[0]], axis=0)   # +8 halo
    # sublane-shifted slices carry offset layouts Mosaic cannot lane-concat
    # ("offset mismatch on non-concat dimension") — rotate to offset 0 first
    rem = C.N_FFT - _K * C.HOP_LENGTH                      # 32
    from jax.experimental.pallas import tpu as pltpu
    n_rows = ttile + 8
    parts = []
    for s in range(_K):                                    # 3×[TTILE, 160]
        shifted = rows if s == 0 else pltpu.roll(rows, n_rows - s, 0)
        parts.append(shifted[:ttile])
    parts.append(pltpu.roll(rows, n_rows - _K, 0)[:ttile, :rem])
    fr = jnp.concatenate(parts, axis=1)                    # [TTILE, N_FFT]
    out_ref[0] = _dft_mel_log(fr, nbins, whi_ref, wlo_ref, mel_ref)


def fused_logmel(frames: jnp.ndarray) -> jnp.ndarray:
    """[B, T, N_FFT] frames (un-windowed) → [B, T, n_mels] log-mel."""
    B, T, _ = frames.shape
    w_hi, w_lo, mel_p = _split_tables()
    nbins = w_hi.shape[1] // 2
    # tile adapts to short buckets (sublane multiple of 8) so a T=64 bucket
    # doesn't pay for a 256-frame tile
    ttile = min(_TTILE, -(-T // 8) * 8)
    t_pad = -(-T // ttile) * ttile
    if t_pad != T:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - T), (0, 0)))
    grid = (B, t_pad // ttile)
    out = pl.pallas_call(
        functools.partial(_kernel, nbins),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ttile, C.N_FFT), lambda b, t: (b, t, 0)),
            pl.BlockSpec(w_hi.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(w_lo.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(mel_p.shape, lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ttile, mel_p.shape[1]),
                               lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, mel_p.shape[1]), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(frames, jnp.asarray(w_hi), jnp.asarray(w_lo), jnp.asarray(mel_p))
    return out[:, :T, : C.N_MELS]


def fused_logmel_rows(ext: jnp.ndarray, T: int) -> jnp.ndarray:
    """Extended signal [B, rows·HOP] → [B, T, n_mels] log-mel with framing
    fused into the kernel (no frames tensor in HBM)."""
    B = ext.shape[0]
    w_hi, w_lo, mel_p = _split_tables()
    nbins = w_hi.shape[1] // 2
    ttile = min(_TTILE, -(-T // 8) * 8)
    n_tiles = -(-T // ttile)
    # rows padded so the +1-block halo view exists for the last tile
    rows_needed = (n_tiles + 1) * ttile
    rows = ext.shape[1] // C.HOP_LENGTH
    A = ext.reshape(B, rows, C.HOP_LENGTH)
    if rows < rows_needed:
        A = jnp.pad(A, ((0, 0), (0, rows_needed - rows), (0, 0)))
    grid = (B, n_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel_rows, nbins, ttile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ttile, C.HOP_LENGTH), lambda b, t: (b, t, 0)),
            # halo: exactly the 8 rows the kernel reads — a full ttile
            # block here would double the kernel's signal DMA for 8 rows
            # of use (ttile % 8 == 0, so block-index units line up)
            pl.BlockSpec((1, 8, C.HOP_LENGTH),
                         lambda b, t: (b, (t + 1) * ttile // 8, 0)),
            pl.BlockSpec(w_hi.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(w_lo.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(mel_p.shape, lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ttile, mel_p.shape[1]),
                               lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * ttile, mel_p.shape[1]),
                                       jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(A, A, jnp.asarray(w_hi), jnp.asarray(w_lo), jnp.asarray(mel_p))
    return out[:, :T, : C.N_MELS]


@functools.partial(jax.jit, static_argnames=("apply_cmvn",))
def batch_features_pallas(signals, num_samples, apply_cmvn: bool = True):
    """Drop-in for jnp_frontend.batch_features using the fused kernel."""
    from .jnp_frontend import _K, extend_signal, postprocess_logmel

    B, n_max = signals.shape
    t_max = C.num_frames(n_max)
    lengths = num_samples.astype(jnp.int32)
    ext = extend_signal(signals, lengths, t_max + _K + 1)
    logmel = fused_logmel_rows(ext, t_max)                 # [B, T, n_mels]
    # mask → CMVN → Δ/ΔΔ → stack: the SAME shared tail as the jnp path
    return postprocess_logmel(logmel, lengths, t_max, apply_cmvn)
