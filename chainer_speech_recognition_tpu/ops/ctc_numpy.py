"""Golden NumPy CTC — textbook alpha/beta recursion, the loss parity oracle.

Implements the same loss Chainer's ``F.connectionist_temporal_classification``
computes (blank_symbol=0, natural-log, mean-free per-utterance negative
log-likelihood), as the executable spec for the "bit-comparable CTC loss
values" gate (BASELINE.json:5; SURVEY.md §2.4).

Scalar-simple float64 NumPy; correctness over speed. Returns loss AND the
analytic gradient w.r.t. the logits (via the beta recursion + posterior),
so device implementations can differential-test both directions.
"""

from __future__ import annotations

import numpy as np

from ..constants import BLANK_ID

LOG_ZERO = -1e30  # stand-in for -inf that keeps arithmetic NaN-free


def _logsumexp(*vals):
    m = max(vals)
    if m <= LOG_ZERO / 2:
        return LOG_ZERO
    return m + np.log(sum(np.exp(v - m) for v in vals))


def extend_labels(labels: np.ndarray) -> np.ndarray:
    """[L] → [2L+1] with blanks interleaved: b l1 b l2 ... lL b."""
    L = len(labels)
    ext = np.full(2 * L + 1, BLANK_ID, dtype=np.int64)
    ext[1::2] = labels
    return ext


def ctc_loss_np(logits: np.ndarray, labels: np.ndarray):
    """Single-utterance CTC.

    Args:
      logits: [T, V] unnormalized scores (V includes blank at index 0).
      labels: [L] int ids in 1..V-1.

    Returns:
      (loss: float, grad_logits: [T, V] float64) — loss is the negative
      log-likelihood; grad is d loss / d logits.
    """
    logits = np.asarray(logits, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.int64)
    T, V = logits.shape
    # log-softmax
    z = logits - logits.max(axis=1, keepdims=True)
    lp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))   # [T, V]

    ext = extend_labels(labels)
    S = len(ext)
    if S > 2 * T + 1:
        # no valid alignment exists (too few frames): infinite loss, zero grad
        return np.inf, np.zeros_like(logits)

    allow2 = np.zeros(S, dtype=bool)
    allow2[2:] = (ext[2:] != BLANK_ID) & (ext[2:] != ext[:-2])

    # ---- alpha ----
    alpha = np.full((T, S), LOG_ZERO)
    alpha[0, 0] = lp[0, ext[0]]
    if S > 1:
        alpha[0, 1] = lp[0, ext[1]]
    for t in range(1, T):
        for s in range(S):
            a = alpha[t - 1, s]
            b = alpha[t - 1, s - 1] if s >= 1 else LOG_ZERO
            c = alpha[t - 1, s - 2] if (s >= 2 and allow2[s]) else LOG_ZERO
            alpha[t, s] = _logsumexp(a, b, c) + lp[t, ext[s]]

    log_p = _logsumexp(alpha[T - 1, S - 1], alpha[T - 1, S - 2] if S > 1 else LOG_ZERO)
    if log_p <= LOG_ZERO / 2:
        return np.inf, np.zeros_like(logits)
    loss = -log_p

    # ---- beta (includes frame t's emission, mirroring alpha) ----
    beta = np.full((T, S), LOG_ZERO)
    beta[T - 1, S - 1] = lp[T - 1, ext[S - 1]]
    if S > 1:
        beta[T - 1, S - 2] = lp[T - 1, ext[S - 2]]
    for t in range(T - 2, -1, -1):
        for s in range(S - 1, -1, -1):
            a = beta[t + 1, s]
            b = beta[t + 1, s + 1] if s + 1 < S else LOG_ZERO
            c = beta[t + 1, s + 2] if (s + 2 < S and allow2[s + 2]) else LOG_ZERO
            beta[t, s] = _logsumexp(a, b, c) + lp[t, ext[s]]

    # ---- gradient: dL/dlogit[t,k] = softmax[t,k] - gamma[t,k] -------------
    # gamma[t,k] = (1/P) sum_{s: ext[s]==k} alpha[t,s]*beta[t,s]/p[t,k]
    grad = np.exp(lp).copy()
    for t in range(T):
        lab_sum = np.full(V, LOG_ZERO)
        for s in range(S):
            k = ext[s]
            v = alpha[t, s] + beta[t, s] - lp[t, k]
            lab_sum[k] = _logsumexp(lab_sum[k], v)
        grad[t] -= np.exp(lab_sum - log_p)
    return loss, grad


def ctc_loss_batch_np(logits, logit_lengths, labels, label_lengths):
    """Padded-batch wrapper: mean of per-utterance losses over the batch.

    Args:
      logits: [B, T, V]; logit_lengths: [B]; labels: [B, L] (pad ignored);
      label_lengths: [B].
    Returns: (losses [B], grads [B, T, V] zero-padded beyond each length).
    """
    B, T, V = logits.shape
    losses = np.zeros(B)
    grads = np.zeros_like(np.asarray(logits, dtype=np.float64))
    for b in range(B):
        tb, lb = int(logit_lengths[b]), int(label_lengths[b])
        loss, grad = ctc_loss_np(logits[b, :tb], labels[b, :lb])
        losses[b] = loss
        grads[b, :tb] = grad
    return losses, grads
