"""Pallas masked greedy-decode kernel (SURVEY.md §7 Phase 3c): per-frame
argmax + repeat/blank suppression with per-utterance lengths masked
IN-KERNEL (BASELINE.json:5 "greedy ... decoding run[s] on-device with
lengths masked in-kernel").

The kernel walks the time grid carrying each utterance's previous best
symbol in VMEM and writes one [1, B] row of (best, keep) per step into
time-major outputs (dynamic SUBLANE stores — dynamic lane-offset stores are
not supported by Mosaic). The tiny [B, T] → [B, U] compaction stays in XLA.
Differentially tested against the host oracle and the XLA greedy
(tests/test_greedy_pallas.py); validated compiled on real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BLANK_ID


def _kernel(lp_ref, tlen_ref, best_ref, keep_ref, prev):
    # best_ref/keep_ref: FULL time-major [T, B] outputs, VMEM-resident
    # across the whole grid; each step writes row t.
    t = pl.program_id(1)
    logits = lp_ref[0]                                   # [B, Vp]
    # manual argmax (first max index): Mosaic can't legalize fp32 argmax
    mx = jnp.max(logits, axis=1, keepdims=True)          # [B, 1]
    vidx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    best = jnp.min(jnp.where(logits == mx, vidx, logits.shape[1]),
                   axis=1).astype(jnp.int32)[None, :]    # [1, B]
    # an all-NaN frame matches nothing (NaN != NaN), leaving the
    # out-of-vocab sentinel Vp — map it to blank so a diverged
    # checkpoint's decode stays in-vocab (it is dropped like any blank)
    best = jnp.where(best >= logits.shape[1], BLANK_ID, best)

    @pl.when(t == 0)
    def _():
        prev[:, :] = jnp.full(prev.shape, BLANK_ID, jnp.int32)

    p = prev[0:1, :]                                     # [1, B]
    valid = tlen_ref[:, :] > t                           # [1, B]
    keep = (best != BLANK_ID) & (best != p) & valid
    best_ref[pl.ds(t, 1), :] = best
    keep_ref[pl.ds(t, 1), :] = keep.astype(jnp.int32)
    new_prev = jnp.where(valid, best, p)                 # [1, B]
    prev[:, :] = jnp.broadcast_to(new_prev, prev.shape)


@functools.partial(jax.jit, static_argnames=("max_len",))
def greedy_decode_pallas(logits: jnp.ndarray, lengths: jnp.ndarray,
                         max_len: int | None = None):
    """Drop-in for decode.greedy.greedy_decode (same outputs)."""
    B, T, V = logits.shape
    max_len = max_len or T
    bp = -(-B // 128) * 128       # lane axis of the outputs
    vp = -(-V // 128) * 128
    x = jnp.pad(logits.astype(jnp.float32),
                ((0, bp - B), (0, 0), (0, vp - V)),
                constant_values=-1e30)
    x = jnp.swapaxes(x, 0, 1)                            # [T, Bp, Vp]
    tl = jnp.pad(lengths.astype(jnp.int32), (0, bp - B))[None, :]  # [1, Bp]

    best_tm, keep_tm = pl.pallas_call(
        _kernel,
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, bp, vp), lambda i, t: (t, i, 0)),
            pl.BlockSpec((1, bp), lambda i, t: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((T, bp), lambda i, t: (0, i)),
            pl.BlockSpec((T, bp), lambda i, t: (0, i)),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, bp), jnp.int32),
                   jax.ShapeDtypeStruct((T, bp), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((8, bp), jnp.int32)],
        interpret=jax.default_backend() == "cpu",
    )(x, tl)
    best = jnp.swapaxes(best_tm, 0, 1)[:B]
    keep = jnp.swapaxes(keep_tm, 0, 1)[:B].astype(bool)

    # compaction (tiny): the SAME helper the XLA path uses, so oracle and
    # kernel tails cannot diverge
    from .greedy import compact_kept

    return compact_kept(best, keep, max_len)
