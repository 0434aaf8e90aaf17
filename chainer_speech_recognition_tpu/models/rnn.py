"""Masked bidirectional GRU/LSTM layers as time-major ``lax.scan``
(SURVEY.md §2.3/§3.3 — the recurrent hot loop of the acoustic model).

TPU-first design decisions:
* The input projection for ALL timesteps is hoisted out of the scan into one
  large [B·T, D]×[D, G·H] matmul (MXU-saturating); the scan body performs
  only the [B, H]×[H, G·H] recurrent matmul per step — the minimum
  sequential work (SURVEY.md §7 hard-part 4: "single fused matmul per gate
  block per step").
* Both directions use the same per-step validity mask (t < length) with a
  frozen carry, so the reverse scan never pollutes its state with padded
  tail frames (hard-part 6); outputs at padded steps are zeroed.
* Matmuls run in ``dtype`` (bf16 by default), the carry and gate
  nonlinearities stay fp32 for recurrence stability.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["BiRNNLayer", "time_mask"]


def time_mask(T: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, T] bool validity mask from per-utterance lengths."""
    return jnp.arange(T, dtype=jnp.int32)[None, :] < lengths[:, None]


def _gru_step(h, xp, hp):
    """h: [B,H] fp32; xp/hp: [B,3H] pre-activations (input/recurrent)."""
    H = h.shape[-1]
    xr, xz, xn = xp[:, :H], xp[:, H : 2 * H], xp[:, 2 * H :]
    hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _lstm_step(hc, xp, hp):
    """hc: [B,2H] fp32 (h‖c); xp/hp: [B,4H] pre-activations."""
    H = hc.shape[-1] // 2
    h, c = hc[:, :H], hc[:, H:]
    g = xp + hp
    i = jax.nn.sigmoid(g[:, :H])
    f = jax.nn.sigmoid(g[:, H : 2 * H] + 1.0)   # forget bias +1
    o = jax.nn.sigmoid(g[:, 2 * H : 3 * H])
    u = jnp.tanh(g[:, 3 * H :])
    c_new = f * c + i * u
    h_new = o * jnp.tanh(c_new)
    return jnp.concatenate([h_new, c_new], axis=-1)


class BiRNNLayer(nn.Module):
    """One bidirectional GRU/LSTM layer: [B, T, D] → [B, T, 2H] (masked)."""

    hidden: int
    cell: str = "gru"                  # "gru" | "lstm"
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.hidden
        ngates = {"gru": 3, "lstm": 4}[self.cell]
        step_fn = {"gru": _gru_step, "lstm": _lstm_step}[self.cell]
        carry_dim = H if self.cell == "gru" else 2 * H
        mask = time_mask(T, lengths)                     # [B, T]

        outs = []
        for d, name in enumerate(("fwd", "bwd")):
            # hoisted input projection: one big MXU matmul over all steps
            xp = nn.Dense(ngates * H, dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"in_{name}")(x)          # [B, T, G·H]
            w_h = self.param(f"rec_{name}", nn.initializers.orthogonal(),
                             (H, ngates * H), jnp.float32)
            xp_t = jnp.swapaxes(xp, 0, 1).astype(jnp.float32)  # [T, B, G·H]
            m_t = jnp.swapaxes(mask, 0, 1)               # [T, B]
            if d == 1:
                xp_t, m_t = xp_t[::-1], m_t[::-1]

            def step(h, inp, w_h=w_h, step_fn=step_fn, H=H):
                xpt, m = inp
                h_in = h[:, :H]                          # (h part for lstm)
                hp = jnp.dot(h_in.astype(self.dtype), w_h.astype(self.dtype),
                             preferred_element_type=jnp.float32)
                h_new = step_fn(h, xpt, hp)
                h_new = jnp.where(m[:, None], h_new, h)  # freeze at padding
                return h_new, h_new[:, :H]

            if self.remat:
                step = jax.checkpoint(step)
            h0 = jnp.zeros((B, carry_dim), jnp.float32)
            _, ys = jax.lax.scan(step, h0, (xp_t, m_t))  # ys: [T, B, H]
            if d == 1:
                ys = ys[::-1]
            outs.append(jnp.swapaxes(ys, 0, 1))          # [B, T, H]

        out = jnp.concatenate(outs, axis=-1)
        return out * mask[:, :, None].astype(out.dtype)
