"""CTC alpha/beta recursion as Pallas TPU scan kernels with a custom VJP
(BASELINE.json:5 "the CTC loss alpha-beta recursion implemented as a Pallas
scan kernel"; SURVEY.md §2.4, §7 Phase 3b / hard-part 1).

Decomposition (TPU-first):
* XLA does what XLA is good at: log_softmax, the [B,T,V]→[B,T,S] extended-
  label emission gather, and the V-scatter in the backward (one one-hot
  matmul on the MXU). Autodiff flows through those natively.
* Pallas does the sequential part XLA can't pipeline well: the α (forward)
  and β+grad (backward) recursions over time, with the [B, S] wavefront
  resident in VMEM and one [B, 1, S] emission slice streamed from HBM per
  grid step (the TPU grid iterates T sequentially, so Pallas double-buffers
  the HBM reads automatically).
* All recursion math is fp32; -1e30 is "log zero"; per-utterance time/label
  lengths are handled by freeze/override masks — shapes stay static.

Numerical contract: identical to ops/ctc_jax.py and the golden oracle
(ops/ctc_numpy.py); differential tests in tests/test_ctc_pallas.py enforce
loss + gradient parity forever (SURVEY.md §7 hard-part 1 mitigation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BLANK_ID
from .ctc_jax import (LOG_ZERO, _logsumexp3 as _lse3, extend_labels,
                      masked_mean_loss)

BTILE = 8          # fp32 sublane tile
LANE = 128         # lane width


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shift_right(x, k):
    """x[..., s-k] along lanes, -inf filled (no wraparound)."""
    rolled = pltpu.roll(x, shift=k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < k, LOG_ZERO, rolled)


def _shift_left(x, k, fill):
    """x[..., s+k] along lanes, fill-padded (pltpu.roll needs shift >= 0)."""
    rolled = pltpu.roll(x, shift=x.shape[1] - k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= x.shape[1] - k, fill, rolled)


# ---------------------------------------------------------------------------
# forward kernel: alpha recursion + loss
# ---------------------------------------------------------------------------

def _fwd_kernel(lp_ref, allow2_ref, svalid_ref, tlen_ref, lablen_ref,
                alphas_ref, loss_ref, alpha):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    lp_t = lp_ref[0, :, :]                                  # [BT, S]
    svalid = svalid_ref[:, :]

    @pl.when(t == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, lp_t.shape, 1)
        lab0 = lablen_ref[:, :]                             # [BT, 1] fp32
        init_ok = (lane == 0) | ((lane == 1) & (lab0 > 0.5))
        alpha[:, :] = jnp.where(init_ok & (svalid > 0.5), lp_t, LOG_ZERO)

    @pl.when(t > 0)
    def _():
        a = alpha[:, :]
        sh1 = _shift_right(a, 1)
        sh2 = jnp.where(allow2_ref[:, :] > 0.5, _shift_right(a, 2), LOG_ZERO)
        new = _lse3(a, sh1, sh2) + lp_t
        new = jnp.where(svalid > 0.5, new, LOG_ZERO)
        alive = tlen_ref[:, :] > (jnp.float32(t) + 0.5)     # t < t_len
        alpha[:, :] = jnp.where(alive, new, a)

    alphas_ref[0, :, :] = alpha[:, :]

    @pl.when(t == n_t - 1)
    def _():
        a = alpha[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        last_idx = 2.0 * lablen_ref[:, :]                   # [BT, 1]
        is_last = lane.astype(jnp.float32) == last_idx
        is_prev = (lane.astype(jnp.float32) == last_idx - 1.0)
        last = jnp.max(jnp.where(is_last, a, LOG_ZERO), axis=1, keepdims=True)
        prev = jnp.max(jnp.where(is_prev, a, LOG_ZERO), axis=1, keepdims=True)
        loss_ref[:, :] = -_lse3(last, prev, jnp.full_like(last, LOG_ZERO))


# ---------------------------------------------------------------------------
# backward kernel: beta recursion + d loss / d lp_ext
# ---------------------------------------------------------------------------

def _bwd_kernel(lp_ref, allow2_ref, svalid_ref, tlen_ref, lablen_ref,
                alphas_ref, logp_ref, g_ref, grad_ref, beta):
    """Grid iterates t = T-1 .. 0 (via index maps); beta is the VMEM carry.

    grad[t,s] = -g_b * exp(alpha[t,s] + beta[t,s] - lp[t,s] - logP)
    with beta defined like alpha (includes frame t's emission).
    """
    t_rev = pl.program_id(1)
    n_t = pl.num_programs(1)
    t = n_t - 1 - t_rev
    lp_t = lp_ref[0, :, :]
    svalid = svalid_ref[:, :] > 0.5
    tlen = tlen_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, lp_t.shape, 1)
    lanef = lane.astype(jnp.float32)
    last_idx = 2.0 * lablen_ref[:, :]

    @pl.when(t_rev == 0)
    def _():
        beta[:, :] = jnp.full(beta.shape, LOG_ZERO, jnp.float32)

    # recursion: beta_t = lse(beta_{t+1}(s), (s+1), allow2(s+2)*(s+2)) + lp_t
    b_prev = beta[:, :]
    sh1 = _shift_left(b_prev, 1, LOG_ZERO)
    sh2 = _shift_left(b_prev, 2, LOG_ZERO)
    allow2_s2 = _shift_left(allow2_ref[:, :], 2, 0.0)
    sh2 = jnp.where(allow2_s2 > 0.5, sh2, LOG_ZERO)
    new = _lse3(b_prev, sh1, sh2) + lp_t

    # at t == t_len - 1: override with init (last two states get lp_t)
    at_init = tlen == (jnp.float32(t) + 1.0)
    init_ok = (lanef == last_idx) | ((lanef == last_idx - 1.0) & (last_idx > 0.5))
    init_val = jnp.where(init_ok, lp_t, LOG_ZERO)
    inside = tlen > (jnp.float32(t) + 0.5)                  # t < t_len
    b_new = jnp.where(at_init, init_val, jnp.where(inside, new, b_prev))
    b_new = jnp.where(svalid, b_new, LOG_ZERO)
    beta[:, :] = b_new

    # gradient for this frame (zero past t_len or invalid s)
    a_t = alphas_ref[0, :, :]
    post = a_t + b_new - lp_t - logp_ref[:, :]
    grad = -jnp.exp(jnp.minimum(post, 0.0)) * g_ref[:, :]
    grad = jnp.where(inside & svalid, grad, 0.0)
    grad_ref[0, :, :] = grad


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pad_args(lp_ext, allow2, s_valid, t_len, lab_len):
    """Pad B to BTILE multiple and S to LANE multiple; masks become fp32."""
    B, T, S = lp_ext.shape
    Bp, Sp = _round_up(B, BTILE), _round_up(S, LANE)
    lp_ext = jnp.pad(lp_ext, ((0, Bp - B), (0, 0), (0, Sp - S)),
                     constant_values=LOG_ZERO)
    allow2 = jnp.pad(allow2.astype(jnp.float32), ((0, Bp - B), (0, Sp - S)))
    s_valid = jnp.pad(s_valid.astype(jnp.float32), ((0, Bp - B), (0, Sp - S)))
    t_len = jnp.pad(t_len.astype(jnp.float32), (0, Bp - B),
                    constant_values=1.0)[:, None]           # [Bp, 1]
    lab_len = jnp.pad(lab_len.astype(jnp.float32), (0, Bp - B))[:, None]
    return lp_ext, allow2, s_valid, t_len, lab_len, B, T, S, Bp, Sp


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _run_fwd(lp_ext, allow2, s_valid, t_len, lab_len):
    lp_ext, allow2, s_valid, t_len, lab_len, B, T, S, Bp, Sp = _pad_args(
        lp_ext, allow2, s_valid, t_len, lab_len)
    grid = (1, T)   # whole padded batch per program: fewer grid steps
    lp_tm = jnp.swapaxes(lp_ext, 0, 1)                      # [T, Bp, Sp]
    bspec_bt = lambda: pl.BlockSpec((1, Bp, Sp), lambda i, t: (t, i, 0))
    bspec_b = lambda w: pl.BlockSpec((Bp, w), lambda i, t: (i, 0))
    alphas, loss = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[bspec_bt(), bspec_b(Sp), bspec_b(Sp), bspec_b(1), bspec_b(1)],
        out_specs=[bspec_bt(), bspec_b(1)],
        out_shape=[jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((Bp, Sp), jnp.float32)],
        interpret=_interpret(),
    )(lp_tm, allow2, s_valid, t_len, lab_len)
    return alphas, loss[:B, 0], (B, T, S, Bp, Sp)


def _run_bwd(lp_ext_p, allow2_p, s_valid_p, t_len_p, lab_len_p,
             alphas, logp, g, dims):
    B, T, S, Bp, Sp = dims
    grid = (1, T)
    lp_tm = jnp.swapaxes(lp_ext_p, 0, 1)                    # [T, Bp, Sp]
    rev = lambda i, t: (T - 1 - t, i, 0)
    bspec_rev = pl.BlockSpec((1, Bp, Sp), rev)
    bspec_b = lambda w: pl.BlockSpec((Bp, w), lambda i, t: (i, 0))
    grad = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[bspec_rev, bspec_b(Sp), bspec_b(Sp), bspec_b(1), bspec_b(1),
                  bspec_rev, bspec_b(1), bspec_b(1)],
        out_specs=bspec_rev,
        out_shape=jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bp, Sp), jnp.float32)],
        interpret=_interpret(),
    )(lp_tm, allow2_p, s_valid_p, t_len_p, lab_len_p, alphas, logp, g)
    return jnp.swapaxes(grad, 0, 1)[:B, :, :S]


@jax.custom_vjp
def _ctc_ext_loss(lp_ext, allow2, s_valid, t_len, lab_len):
    """loss [B] from extended-label emissions [B,T,S]; masks as fp32."""
    _, loss, _ = _run_fwd(lp_ext, allow2, s_valid, t_len, lab_len)
    return loss


def _ctc_ext_fwd(lp_ext, allow2, s_valid, t_len, lab_len):
    alphas, loss, dims = _run_fwd(lp_ext, allow2, s_valid, t_len, lab_len)
    return loss, (lp_ext, allow2, s_valid, t_len, lab_len, alphas, loss, dims)


def _ctc_ext_bwd(res, g):
    lp_ext, allow2, s_valid, t_len, lab_len, alphas, loss, dims = res
    B, T, S, Bp, Sp = dims
    lp_p, a2_p, sv_p, tl_p, ll_p, *_ = _pad_args(
        lp_ext, allow2, s_valid, t_len, lab_len)
    logp = jnp.pad(-loss, (0, Bp - B))[:, None]             # [Bp, 1]
    # Impossible samples (no valid alignment: loss saturates at ~-LOG_ZERO)
    # get exactly zero gradient, matching the jnp scan and the golden
    # oracle — exp(alpha+beta-lp-logP) is numerically garbage there.
    g = jnp.where(loss < -LOG_ZERO / 2, g.astype(jnp.float32), 0.0)
    g_p = jnp.pad(g, (0, Bp - B))[:, None]
    d_lp = _run_bwd(lp_p, a2_p, sv_p, tl_p, ll_p, alphas, logp, g_p, dims)
    z = lambda x: jnp.zeros_like(x)
    return d_lp, z(allow2), z(s_valid), z(t_len), z(lab_len)


_ctc_ext_loss.defvjp(_ctc_ext_fwd, _ctc_ext_bwd)


@jax.jit
def ctc_loss_pallas(
    logits: jnp.ndarray,         # [B, T, V]
    logit_lengths: jnp.ndarray,  # [B]
    labels: jnp.ndarray,         # [B, L]
    label_lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Drop-in replacement for ops.ctc_jax.ctc_loss (same semantics)."""
    logits = logits.astype(jnp.float32)
    B, T, V = logits.shape
    # clamp lengths to T: tlen > T (a caller's length-formula bug) must
    # behave like the jnp path — WITHOUT this the backward kernel's beta
    # init (tlen == t+1) never fires and the sample gets a normal finite
    # loss but an exactly-zero gradient, a silent impl divergence
    logit_lengths = jnp.minimum(logit_lengths, T)
    lp = jax.nn.log_softmax(logits, axis=-1)
    ext = extend_labels(labels)                              # [B, S]
    S = ext.shape[1]
    lab_len = label_lengths.astype(jnp.int32)
    sidx = jnp.arange(S, dtype=jnp.int32)[None, :]
    s_valid = sidx < (2 * lab_len + 1)[:, None]
    prev2 = jnp.concatenate([jnp.zeros((B, 2), jnp.int32), ext[:, :-2]], axis=1)
    allow2 = (sidx >= 2) & (ext != BLANK_ID) & (ext != prev2)
    lp_ext = jnp.take_along_axis(lp, ext[:, None, :], axis=2)  # [B, T, S]
    return _ctc_ext_loss(lp_ext, allow2.astype(jnp.float32),
                         s_valid.astype(jnp.float32),
                         logit_lengths.astype(jnp.float32),
                         lab_len.astype(jnp.float32))


def mean_ctc_loss_pallas(logits, logit_lengths, labels, label_lengths):
    losses = ctc_loss_pallas(logits, logit_lengths, labels, label_lengths)
    return masked_mean_loss(losses)     # same policy object as ctc_jax
