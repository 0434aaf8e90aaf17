"""Pallas masked greedy-decode kernel (SURVEY.md §7 Phase 3c): per-frame
argmax + repeat/blank suppression with per-utterance lengths masked
IN-KERNEL (BASELINE.json:5 "greedy ... decoding run[s] on-device with
lengths masked in-kernel").

The kernel walks the time grid sequentially carrying each utterance's
previous best symbol in VMEM, emitting (best_id, keep) per frame; the tiny
[B, T] → [B, U] compaction stays in XLA. Differentially tested against the
host oracle and the XLA greedy (tests/test_greedy_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BLANK_ID, PAD_LABEL_ID


def _kernel(lp_ref, tlen_ref, best_ref, keep_ref, prev):
    t = pl.program_id(1)
    logits = lp_ref[0]                                   # [B, Vp]
    best = jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None]  # [B,1]

    @pl.when(t == 0)
    def _():
        prev[:, :] = jnp.full(prev.shape, BLANK_ID, jnp.int32)

    p = prev[:, :]
    valid = tlen_ref[:, :] > t                           # [B,1] int32 cmp
    keep = (best != BLANK_ID) & (best != p) & valid
    best_ref[:, :] = best
    keep_ref[:, :] = keep.astype(jnp.int32)
    prev[:, :] = jnp.where(valid, best, p)


@functools.partial(jax.jit, static_argnames=("max_len",))
def greedy_decode_pallas(logits: jnp.ndarray, lengths: jnp.ndarray,
                         max_len: int | None = None):
    """Drop-in for decode.greedy.greedy_decode (same outputs)."""
    B, T, V = logits.shape
    max_len = max_len or T
    bp = -(-B // 8) * 8
    vp = -(-V // 128) * 128
    x = jnp.pad(logits.astype(jnp.float32),
                ((0, bp - B), (0, 0), (0, vp - V)),
                constant_values=-1e30)
    x = jnp.swapaxes(x, 0, 1)                            # [T, Bp, Vp]
    tl = jnp.pad(lengths.astype(jnp.int32), (0, bp - B))[:, None]

    best, keep = pl.pallas_call(
        _kernel,
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, bp, vp), lambda i, t: (t, i, 0)),
            pl.BlockSpec((bp, 1), lambda i, t: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bp, 1), lambda i, t: (i, t)),
            pl.BlockSpec((bp, 1), lambda i, t: (i, t)),
        ],
        out_shape=[jax.ShapeDtypeStruct((bp, T), jnp.int32),
                   jax.ShapeDtypeStruct((bp, T), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((bp, 1), jnp.int32)],
        interpret=jax.default_backend() == "cpu",
    )(x, tl)
    best, keep = best[:B], keep[:B].astype(bool)

    # compaction (tiny): identical to decode/greedy.py
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    out_lens = pos[:, -1] + 1
    slot = jnp.where(keep, pos, max_len)
    out = jnp.full((B, max_len + 1), PAD_LABEL_ID, jnp.int32)
    out = out.at[jnp.arange(B)[:, None], slot].set(
        jnp.where(keep, best, PAD_LABEL_ID))
    return out[:, :max_len], out_lens
