"""Batched CTC loss as a JAX ``lax.scan`` over time — the always-available
device implementation (and the differential-test partner of the Pallas
kernel, SURVEY.md §7 hard-part 1).

Semantics match ``ops/ctc_numpy.py`` (the golden oracle) exactly:
blank id 0, natural-log NLL per utterance, extended label sequence
``b l1 b l2 ... lL b``. All shapes are static ``[B, T, S]``; per-utterance
time/label lengths are handled by masking + freezing, never dynamic shapes
(XLA-friendly, BASELINE.json:5 "CTC loss alpha-beta recursion ... scan").

Gradients come from JAX autodiff through the scan, which is exactly the
beta recursion in reverse — fp32 throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import BLANK_ID

LOG_ZERO = -1e30


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, LOG_ZERO / 2)  # avoid (-big) - (-big) noise
    # clamp the sum before log so autodiff never sees d/dx log(0) = inf*0=NaN
    se = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    out = m_safe + jnp.log(jnp.maximum(se, 1e-37))
    return jnp.where(m <= LOG_ZERO / 2, LOG_ZERO, out)


def extend_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """[B, L] → [B, 2L+1] blanks interleaved (pad positions become blank)."""
    B, L = labels.shape
    ext = jnp.zeros((B, 2 * L + 1), dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(jnp.maximum(labels, 0).astype(jnp.int32))
    return ext


@functools.partial(jax.jit, static_argnames=())
def ctc_loss(
    logits: jnp.ndarray,         # [B, T, V] fp32 (V includes blank at 0)
    logit_lengths: jnp.ndarray,  # [B] int
    labels: jnp.ndarray,         # [B, L] int, ids in 1..V-1, pad arbitrary
    label_lengths: jnp.ndarray,  # [B] int
) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood, shape [B] fp32.

    Samples with no valid alignment (label too long for the frame count)
    get loss ≈ 1e30; use ``mean_ctc_loss`` to mask those in training.
    """
    logits = logits.astype(jnp.float32)
    B, T, V = logits.shape
    lp = jax.nn.log_softmax(logits, axis=-1)

    ext = extend_labels(labels)                       # [B, S]
    S = ext.shape[1]
    lab_len = label_lengths.astype(jnp.int32)
    s_valid_len = 2 * lab_len + 1                     # [B]

    sidx = jnp.arange(S, dtype=jnp.int32)[None, :]    # [1, S]
    s_valid = sidx < s_valid_len[:, None]             # [B, S]
    prev2 = jnp.concatenate([jnp.zeros((B, 2), jnp.int32), ext[:, :-2]], axis=1)
    allow2 = (sidx >= 2) & (ext != BLANK_ID) & (ext != prev2)

    # Pre-gather emissions for the extended sequence: [T, B, S]
    lp_ext = jnp.take_along_axis(lp, ext[:, None, :], axis=2)
    lp_ext = jnp.transpose(lp_ext, (1, 0, 2))

    tlen = logit_lengths.astype(jnp.int32)

    alpha0 = jnp.full((B, S), LOG_ZERO, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(lp_ext[0, :, 0])
    if S > 1:
        first = jnp.where(lab_len > 0, lp_ext[0, :, 1], LOG_ZERO)
        alpha0 = alpha0.at[:, 1].set(first)

    def step(alpha, xs):
        lp_t, t = xs                                   # [B, S], scalar
        sh1 = jnp.concatenate(
            [jnp.full((B, 1), LOG_ZERO, jnp.float32), alpha[:, :-1]], axis=1)
        sh2 = jnp.concatenate(
            [jnp.full((B, 2), LOG_ZERO, jnp.float32), alpha[:, :-2]], axis=1)
        sh2 = jnp.where(allow2, sh2, LOG_ZERO)
        new = _logsumexp3(alpha, sh1, sh2) + lp_t
        new = jnp.where(s_valid, new, LOG_ZERO)
        # freeze once past each utterance's final frame
        alive = (t < tlen)[:, None]
        return jnp.where(alive, new, alpha), None

    ts = jnp.arange(1, T, dtype=jnp.int32)
    alpha, _ = jax.lax.scan(step, alpha0, (lp_ext[1:], ts))

    last = jnp.take_along_axis(alpha, (2 * lab_len)[:, None], axis=1)[:, 0]
    prev = jnp.take_along_axis(
        alpha, jnp.maximum(2 * lab_len - 1, 0)[:, None], axis=1)[:, 0]
    prev = jnp.where(lab_len > 0, prev, LOG_ZERO)
    log_p = _logsumexp3(last, prev, jnp.full_like(last, LOG_ZERO))
    return -log_p


def mean_ctc_loss(logits, logit_lengths, labels, label_lengths):
    """Batch-mean CTC loss, ignoring samples with no valid alignment.

    Returns (mean_loss, valid_fraction). This is the training objective;
    the reference averages per-utterance CTC NLL over the minibatch.
    """
    losses = ctc_loss(logits, logit_lengths, labels, label_lengths)
    return masked_mean_loss(losses)


def masked_mean_loss(losses):
    """(mean over valid samples, valid fraction): the impossible-sample
    policy (sentinel -LOG_ZERO losses excluded, count clamped to 1) lives
    HERE only — the Pallas objective shares it."""
    valid = losses < -LOG_ZERO / 2
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid, losses, 0.0)) / n
    return mean, jnp.mean(valid.astype(jnp.float32))
