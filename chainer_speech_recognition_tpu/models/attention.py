"""Conformer-style self-attention encoder blocks — the attention model
family (capability beyond the reference: SURVEY.md §2.7 notes the reference
has "no attention anywhere in the model"; this preset exists because the
MXU rewards attention's large batched matmuls with far higher arithmetic
intensity than the sequential BiRNN recurrence, SURVEY.md §3.3).

TPU-first design decisions:

* Every FLOP-carrying op is a large static-shape matmul (QKV/out
  projections, macaron feed-forward pairs, the [B,h,T,T] score/value
  einsums) — MXU-shaped, fused by XLA; there is NO sequential-in-time
  dependency, so a block costs O(1) compile-side latency vs the BiRNN's
  T-step scan chain.
* bf16 matmuls, fp32 residual stream: LayerNorm, softmax, and the
  residual adds run in fp32 (`preferred_element_type` on the score
  einsum), matching the repo-wide "bf16 compute / fp32 numerics-critical"
  convention (models/rnn.py).
* Relative position via RoPE (rotary embedding on q/k): zero parameters,
  zero extra matmuls, exact at any offset — translation-invariant like
  the Transformer-XL encoding the Conformer paper uses, but with no
  [T,T] position-score tensor to materialize.
* Exact padding invariance (the repo's batched == per-utterance
  contract, models/conv.py): attention scores are masked at PADDED KEYS
  before softmax, the depthwise conv sees zeroed padded frames and uses
  explicit (k-1)//2,k//2 padding, and every block re-zeroes padded
  frames on exit — valid-frame outputs are independent of batch padding.
* The conv module normalizes with LayerNorm, not the paper's BatchNorm:
  batch statistics would couple utterances (breaking padding invariance
  and the streaming/batching equality contracts) for no MXU benefit.

No dropout: regularization comes from SpecAugment (ops/specaugment.py),
as everywhere else in this build; the blocks take no RNG.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .rnn import time_mask

__all__ = ["ConformerBlock", "rope"]


def rope(x: jnp.ndarray, base: float = 10_000.0) -> jnp.ndarray:
    """Rotary position embedding over the last (head) dim of [B, T, h, dh].

    Pairs channel i with i+dh/2 (rotate-half layout); angles are a static
    [T, dh/2] table folded into the jit as a constant.
    """
    B, T, h, dh = x.shape
    half = dh // 2
    freq = base ** (-np.arange(half, dtype=np.float32) / half)   # [dh/2]
    ang = jnp.asarray(np.arange(T, dtype=np.float32)[:, None] * freq)
    cos = jnp.cos(ang)[None, :, None, :]                         # [1,T,1,dh/2]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


class _MHSA(nn.Module):
    """Multi-head self-attention with RoPE and key-side padding mask."""

    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, T, d = x.shape
        h = self.heads
        dh = d // h
        dense = lambda name: nn.Dense(d, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q = dense("q")(x).reshape(B, T, h, dh)
        k = dense("k")(x).reshape(B, T, h, dh)
        v = dense("v")(x).reshape(B, T, h, dh)
        q, k = rope(q), rope(k)
        # scores in fp32: bf16 accumulation over dh then fp32 softmax
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / np.sqrt(dh))
        # mask padded KEYS; padded queries produce garbage rows that the
        # block's exit mask zeroes (they never reach valid frames)
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(self.dtype))
        return dense("out")(out.reshape(B, T, d))


class _ConvModule(nn.Module):
    """Conformer conv module: GLU pointwise → masked depthwise → LN →
    swish → pointwise. Depthwise conv is VPU work (negligible FLOPs);
    the two pointwise matmuls are MXU-shaped."""

    kernel: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        gates = nn.Dense(2 * d, dtype=self.dtype, param_dtype=jnp.float32,
                         name="pw_in")(x)
        hcurr = gates[..., :d] * nn.sigmoid(gates[..., d:])
        # zero padded frames BEFORE the depthwise conv so padding cannot
        # leak through its receptive field (models/conv.py convention)
        hcurr = hcurr * mask[:, :, None].astype(hcurr.dtype)
        kt = self.kernel
        pad = ((kt - 1) // 2, kt // 2)
        hcurr = nn.Conv(d, (kt,), padding=(pad,), feature_group_count=d,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="dw")(hcurr)
        hcurr = nn.LayerNorm(dtype=jnp.float32, name="ln")(
            hcurr.astype(jnp.float32))
        hcurr = nn.swish(hcurr).astype(self.dtype)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="pw_out")(hcurr)


class _FFN(nn.Module):
    """Position-wise feed-forward (swish), the macaron half-step."""

    mult: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        hcurr = nn.Dense(self.mult * d, dtype=self.dtype,
                         param_dtype=jnp.float32, name="in")(x)
        hcurr = nn.swish(hcurr)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out")(hcurr)


class ConformerBlock(nn.Module):
    """One macaron block: ½FFN → MHSA → conv module → ½FFN → final LN.

    [B, T, d] fp32 residual stream in, same out (padded frames zeroed).
    """

    heads: int = 4
    ff_mult: int = 4
    conv_kernel: int = 15
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        mask = time_mask(x.shape[1], lengths)                    # [B, T]
        x = x.astype(jnp.float32)
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, name=name)

        def pre(name, xx):                  # pre-norm, bf16 for the matmuls
            return ln(name)(xx).astype(self.dtype)

        x = x + 0.5 * _FFN(self.ff_mult, self.dtype, name="ffn1")(
            pre("ln_ffn1", x)).astype(jnp.float32)
        x = x + _MHSA(self.heads, self.dtype, name="mhsa")(
            pre("ln_mhsa", x), mask).astype(jnp.float32)
        x = x + _ConvModule(self.conv_kernel, self.dtype, name="conv")(
            pre("ln_conv", x), mask).astype(jnp.float32)
        x = x + 0.5 * _FFN(self.ff_mult, self.dtype, name="ffn2")(
            pre("ln_ffn2", x)).astype(jnp.float32)
        x = ln("ln_out")(x)
        return x * mask[:, :, None].astype(x.dtype)
