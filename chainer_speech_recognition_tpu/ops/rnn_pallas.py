"""Fused bidirectional RNN scan as Pallas TPU kernels with a custom VJP
(SURVEY.md §7 hard-part 4: the BiRNN time scan is the acoustic model's
throughput limiter; "consider Pallas-fused LSTM step if XLA scan
underperforms").

Semantics are EXACTLY those of models/rnn.py's lax.scan path (same gate
math, same freeze-at-padding masking, fp32 carries); models/rnn.py keeps
the scan as the always-available fallback and the differential oracle
(tests/test_rnn_pallas.py).

Layout (per layer):
  xs   [T, R, G·H] fp32  — input pre-activations, R = 2·B rows (fwd rows
                           0..B-1 use w[0], bwd rows B..2B-1 use w[1]; the
                           bwd stream is already time-reversed)
  w    [2, H, G·H] fp32  — recurrent gate weights per direction
  lo/hi [R, 1]    fp32   — row validity window: step t is live iff
                           lo ≤ t < hi (fwd: [0, len); bwd: [T-len, T))
  ys   [T, R, H]  fp32   — emitted carries (h), frozen outside [lo, hi)

The forward kernel walks the time grid with h (‖c) resident in VMEM and
STREAMS the gate activations to HBM ([T, R, G·H] — ~0.2 GB/layer at
contract shapes, ~0.25 µs/step of write bandwidth). Under bf16 compute
(production), the streamed tensors — input pre-activations xs, stored
gates, and the emitted input-gradient dxs — travel as bf16 (half the HBM
traffic; the values already passed through bf16 matmuls, so storage adds
no precision class below the compute noise), while carries, outputs ys/cs
and the dh chain stay fp32. Under fp32 compute everything streams fp32
and the kernel is bit-tight against the lax.scan oracle. The backward kernel
re-walks in reverse and is latency-bound on the sequential dependency, so
its per-step critical path is kept minimal: read the stored gates (no
gate-recompute matmul), derivative algebra on the VPU, ONE transposed
recurrent matmul for dh. dW is NOT accumulated in-kernel: the masked
pre-activation grads are streamed out and dW = Σ_t h_prevᵀ·dg becomes one
large MXU einsum in XLA, off the sequential path entirely (this also
freed the [2, H, G·H] VMEM scratch that capped H at 384).

Requires H % 128 == 0 and R % 8 == 0 on real TPU (callers pad or fall back
to the scan path); interpret mode (CPU tests) has no such constraint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _valid(lo_ref, hi_ref, t):
    tf = jnp.float32(t)
    return (lo_ref[:, :] <= tf) & (tf < hi_ref[:, :])      # [R, 1]


def _dot2(x, w_ref, B, dtype, transpose=False):
    """Per-direction matmul: rows [0:B] with w[0], rows [B:] with w[1]."""
    w0, w1 = w_ref[0], w_ref[1]
    if transpose:
        w0, w1 = w0.T, w1.T
    lo = jnp.dot(x[:B].astype(dtype), w0.astype(dtype),
                 preferred_element_type=jnp.float32)
    hi = jnp.dot(x[B:].astype(dtype), w1.astype(dtype),
                 preferred_element_type=jnp.float32)
    return jnp.concatenate([lo, hi], axis=0)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------

def _gru_gates(xp, hp, h, H):
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H:2*H] + hp[:, H:2*H])
    n = jnp.tanh(xp[:, 2*H:] + r * hp[:, 2*H:])
    return r, z, n, (1.0 - z) * n + z * h


def _gru_fwd_kernel(B, H, dtype, xs_ref, w_ref, lo_ref, hi_ref,
                    ys_ref, gates_ref, h_scr):
    """gates_ref is None in inference mode (no residual stream)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:, :] = jnp.zeros(h_scr.shape, jnp.float32)

    h = h_scr[:, :]
    xp = xs_ref[0].astype(jnp.float32)
    hp = _dot2(h, w_ref, B, dtype)
    r, z, n, h_new = _gru_gates(xp, hp, h, H)
    h_new = jnp.where(_valid(lo_ref, hi_ref, t), h_new, h)
    h_scr[:, :] = h_new
    ys_ref[0] = h_new
    # stored activations (r, z, n, hn): the bwd pass needs NO matmul to
    # rebuild the gate state — its critical path shrinks to VPU algebra
    # plus the single dh matmul
    if gates_ref is not None:
        gates_ref[0] = jnp.concatenate(
            [r, z, n, hp[:, 2*H:]], axis=1).astype(gates_ref.dtype)


def _gru_bwd_kernel(B, H, dtype, gates_ref, w_ref, lo_ref, hi_ref,
                    hprev_ref, g_ref, dxs_ref, dhn_ref, dh_scr):
    t_rev = pl.program_id(1)
    n_t = pl.num_programs(1)
    t = n_t - 1 - t_rev

    @pl.when(t_rev == 0)
    def _():
        dh_scr[:, :] = jnp.zeros(dh_scr.shape, jnp.float32)

    dh_total = g_ref[0] + dh_scr[:, :]                     # [R, H]
    h_prev = hprev_ref[0]
    gates = gates_ref[0].astype(jnp.float32)
    r, z, n, hn = (gates[:, :H], gates[:, H:2*H],
                   gates[:, 2*H:3*H], gates[:, 3*H:])

    dz_pre = dh_total * (h_prev - n) * z * (1.0 - z)
    dn_pre = dh_total * (1.0 - z) * (1.0 - n * n)
    dr_pre = dn_pre * hn * r * (1.0 - r)
    dhn = dn_pre * r
    dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)   # [R, 3H]
    dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=1)
    dh_prev = dh_total * z + _dot2(dhp, w_ref, B, dtype, transpose=True)

    valid = _valid(lo_ref, hi_ref, t)
    dxs_ref[0] = jnp.where(valid, dxp, 0.0).astype(dxs_ref.dtype)
    # dhp's first 2H columns are BIT-IDENTICAL to dxp's (dr_pre, dz_pre) —
    # stream only the differing dhn column block; dW = Σ_t h_prevᵀ·dhp is
    # computed after the kernel as two XLA einsums over (dxs[..., :2H],
    # dhn) — same read bytes, 2H fewer store columns per sequential step
    dhn_ref[0] = jnp.where(valid, dhn, 0.0).astype(dhn_ref.dtype)
    dh_scr[:, :] = jnp.where(valid, dh_prev, dh_total)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

def _lstm_gates(xp, hp, H):
    g = xp + hp
    i = jax.nn.sigmoid(g[:, :H])
    f = jax.nn.sigmoid(g[:, H:2*H] + 1.0)
    o = jax.nn.sigmoid(g[:, 2*H:3*H])
    u = jnp.tanh(g[:, 3*H:])
    return i, f, o, u


def _lstm_fwd_kernel(B, H, dtype, xs_ref, w_ref, lo_ref, hi_ref,
                     ys_ref, cs_ref, gates_ref, hc_scr):
    """cs_ref/gates_ref are None in inference mode (no residual streams)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hc_scr[:, :] = jnp.zeros(hc_scr.shape, jnp.float32)

    h, c = hc_scr[:, :H], hc_scr[:, H:]
    xp = xs_ref[0].astype(jnp.float32)
    hp = _dot2(h, w_ref, B, dtype)
    i, f, o, u = _lstm_gates(xp, hp, H)
    c_new = f * c + i * u
    h_new = o * jnp.tanh(c_new)
    valid = _valid(lo_ref, hi_ref, t)
    h_new = jnp.where(valid, h_new, h)
    c_new = jnp.where(valid, c_new, c)
    hc_scr[:, :] = jnp.concatenate([h_new, c_new], axis=1)
    ys_ref[0] = h_new
    if cs_ref is not None:
        cs_ref[0] = c_new
        # stored activations: bwd needs no gate-recompute matmul (module doc)
        gates_ref[0] = jnp.concatenate(
            [i, f, o, u], axis=1).astype(gates_ref.dtype)


def _lstm_bwd_kernel(B, H, dtype, gates_ref, w_ref, lo_ref, hi_ref,
                     cprev_ref, cs_ref, g_ref, dxs_ref, dhc_scr):
    t_rev = pl.program_id(1)
    n_t = pl.num_programs(1)
    t = n_t - 1 - t_rev

    @pl.when(t_rev == 0)
    def _():
        dhc_scr[:, :] = jnp.zeros(dhc_scr.shape, jnp.float32)

    dh_total = g_ref[0] + dhc_scr[:, :H]
    dc_carry = dhc_scr[:, H:]
    c_prev = cprev_ref[0]
    c_t = cs_ref[0]
    gates = gates_ref[0].astype(jnp.float32)
    i, f, o, u = (gates[:, :H], gates[:, H:2*H],
                  gates[:, 2*H:3*H], gates[:, 3*H:])

    tc = jnp.tanh(c_t)
    do_pre = dh_total * tc * o * (1.0 - o)
    dc = dc_carry + dh_total * o * (1.0 - tc * tc)
    df_pre = dc * c_prev * f * (1.0 - f)
    di_pre = dc * u * i * (1.0 - i)
    du_pre = dc * i * (1.0 - u * u)
    dc_prev = dc * f
    dg = jnp.concatenate([di_pre, df_pre, do_pre, du_pre], axis=1)  # [R,4H]
    dh_prev = _dot2(dg, w_ref, B, dtype, transpose=True)

    valid = _valid(lo_ref, hi_ref, t)
    # dxs doubles as the masked recurrent-gate grads (dg): dW is computed
    # from it by one large XLA einsum after the kernel
    dxs_ref[0] = jnp.where(valid, dg, 0.0).astype(dxs_ref.dtype)
    new_dh = jnp.where(valid, dh_prev, dh_total)
    new_dc = jnp.where(valid, dc_prev, dc_carry)
    dhc_scr[:, :] = jnp.concatenate([new_dh, new_dc], axis=1)


# ---------------------------------------------------------------------------
# streaming-inference kernels: initial carry in, mid-window carry out
# ---------------------------------------------------------------------------
# Chunked online recognition (decode/streaming.py) carries the forward
# RNN state across windows. These kernels are the residual-free forward
# with two extensions: the VMEM carry initializes from h0 (not zero),
# and a [R, carry] output records the state after ``emit_t`` live steps
# (the chunk boundary inside the lookahead window) — written while
# t < emit_t into the SAME output block, so the last write (t = emit_t-1)
# is what lands in HBM; emit_t == 0 keeps the initialized h0 (matching
# models/rnn.py's scan-path ``h_carry`` exactly, padding-freeze included).


def _gru_stream_kernel(B, H, dtype, emit_t, xs_ref, w_ref, lo_ref, hi_ref,
                       h0_ref, ys_ref, carry_ref, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:, :] = h0_ref[:, :]
        carry_ref[:, :] = h0_ref[:, :]

    h = h_scr[:, :]
    xp = xs_ref[0].astype(jnp.float32)
    hp = _dot2(h, w_ref, B, dtype)
    _, _, _, h_new = _gru_gates(xp, hp, h, H)
    h_new = jnp.where(_valid(lo_ref, hi_ref, t), h_new, h)
    h_scr[:, :] = h_new
    ys_ref[0] = h_new

    @pl.when(t < emit_t)
    def _():
        carry_ref[:, :] = h_new


def _lstm_stream_kernel(B, H, dtype, emit_t, xs_ref, w_ref, lo_ref, hi_ref,
                        h0_ref, ys_ref, carry_ref, hc_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hc_scr[:, :] = h0_ref[:, :]
        carry_ref[:, :] = h0_ref[:, :]

    h, c = hc_scr[:, :H], hc_scr[:, H:]
    xp = xs_ref[0].astype(jnp.float32)
    hp = _dot2(h, w_ref, B, dtype)
    i, f, o, u = _lstm_gates(xp, hp, H)
    c_new = f * c + i * u
    h_new = o * jnp.tanh(c_new)
    valid = _valid(lo_ref, hi_ref, t)
    h_new = jnp.where(valid, h_new, h)
    c_new = jnp.where(valid, c_new, c)
    hc = jnp.concatenate([h_new, c_new], axis=1)
    hc_scr[:, :] = hc
    ys_ref[0] = h_new

    @pl.when(t < emit_t)
    def _():
        carry_ref[:, :] = hc


def birnn_pallas_stream(xs, w, lo, hi, h0, cell: str, dtype_name: str,
                        emit_t: int):
    """Streaming forward: ``(ys [T,R,H] fp32, carry [R, C] fp32)`` where
    C = H (GRU) / 2H (h‖c, LSTM). ``h0`` [R, C] fp32 seeds the carry
    (forward rows carry chunk state; backward rows pass zeros — they
    restart at each window's right edge); ``emit_t`` (static) is the
    number of live steps after which the carry is recorded. Inference
    only — nothing differentiates through streaming chunks."""
    T, R, GH = xs.shape
    H = w.shape[1]
    B = R // 2
    dtype = jnp.dtype(dtype_name)
    sdt = _stream_dt(dtype)
    assert xs.dtype == sdt, (
        f"birnn_pallas_stream: xs must arrive as {sdt} (got {xs.dtype})")
    C = H if cell == "gru" else 2 * H
    assert h0.shape == (R, C) and h0.dtype == jnp.float32
    kern = functools.partial(
        {"gru": _gru_stream_kernel, "lstm": _lstm_stream_kernel}[cell],
        B, H, dtype, emit_t)
    rw = lambda width: pl.BlockSpec((R, width), lambda i, t: (0, 0))
    ys, carry = pl.pallas_call(
        kern, grid=(1, T),
        in_specs=[_specs_tbx(R, GH),
                  pl.BlockSpec(w.shape, lambda i, t: (0, 0, 0)),
                  rw(1), rw(1), rw(C)],
        out_specs=[_specs_tbx(R, H), rw(C)],
        out_shape=[jax.ShapeDtypeStruct((T, R, H), jnp.float32),
                   jax.ShapeDtypeStruct((R, C), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((R, C), jnp.float32)],
        interpret=_interp(),
    )(xs, w, lo, hi, h0)
    return ys, carry


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------

def _interp() -> bool:
    return jax.default_backend() == "cpu"


def _specs_tbx(R, width):
    return pl.BlockSpec((1, R, width), lambda i, t: (t, i, 0))


def _specs_tbx_rev(R, width, T):
    return pl.BlockSpec((1, R, width), lambda i, t: (T - 1 - t, i, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def birnn_pallas(xs, w, lo, hi, cell: str, dtype_name: str):
    # primal-only call (inference/eval/decode — nothing differentiates
    # this): skip the residual streams entirely. XLA cannot DCE Pallas
    # outputs, so the saving must happen here, not in the compiler.
    ys, _, _ = _fwd_impl(xs, w, lo, hi, cell, dtype_name, residuals=False)
    return ys


def _stream_dt(dtype):
    """HBM-stream storage dtype: bf16 under bf16 compute (half the HBM
    traffic; adds nothing below the bf16-matmul noise floor), fp32 under
    fp32 compute (keeps the kernel bit-tight against the scan oracle)."""
    return jnp.float32 if dtype == jnp.float32 else jnp.bfloat16


def _fwd_impl(xs, w, lo, hi, cell, dtype_name, residuals=True):
    T, R, GH = xs.shape
    H = w.shape[1]
    B = R // 2
    dtype = jnp.dtype(dtype_name)
    sdt = _stream_dt(dtype)
    assert xs.dtype == sdt, (
        f"birnn_pallas: xs must arrive in the stream dtype {sdt} for "
        f"compute dtype {dtype} (got {xs.dtype}) — models/rnn.py casts")
    grid = (1, T)
    rw = lambda width: pl.BlockSpec((R, width), lambda i, t: (0, 0))
    in_specs = [_specs_tbx(R, GH),
                pl.BlockSpec(w.shape, lambda i, t: (0, 0, 0)),
                rw(1), rw(1)]
    if cell == "gru":
        if residuals:
            kern = functools.partial(_gru_fwd_kernel, B, H, dtype)
            out_specs = [_specs_tbx(R, H), _specs_tbx(R, 4 * H)]
            out_shape = [jax.ShapeDtypeStruct((T, R, H), jnp.float32),
                         jax.ShapeDtypeStruct((T, R, 4 * H), sdt)]
        else:
            def kern(xs_r, w_r, lo_r, hi_r, ys_r, h_scr):
                _gru_fwd_kernel(B, H, dtype, xs_r, w_r, lo_r, hi_r,
                                ys_r, None, h_scr)
            out_specs = _specs_tbx(R, H)
            out_shape = jax.ShapeDtypeStruct((T, R, H), jnp.float32)
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((R, H), jnp.float32)],
            interpret=_interp(),
        )(xs, w, lo, hi)
        return (out[0], None, out[1]) if residuals else (out, None, None)
    if residuals:
        kern = functools.partial(_lstm_fwd_kernel, B, H, dtype)
        out_specs = [_specs_tbx(R, H), _specs_tbx(R, H),
                     _specs_tbx(R, 4 * H)]
        out_shape = [jax.ShapeDtypeStruct((T, R, H), jnp.float32),
                     jax.ShapeDtypeStruct((T, R, H), jnp.float32),
                     jax.ShapeDtypeStruct((T, R, 4 * H), sdt)]
    else:
        def kern(xs_r, w_r, lo_r, hi_r, ys_r, hc_scr):
            _lstm_fwd_kernel(B, H, dtype, xs_r, w_r, lo_r, hi_r,
                             ys_r, None, None, hc_scr)
        out_specs = _specs_tbx(R, H)
        out_shape = jax.ShapeDtypeStruct((T, R, H), jnp.float32)
    out = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R, 2 * H), jnp.float32)],
        interpret=_interp(),
    )(xs, w, lo, hi)
    return out if residuals else (out, None, None)


def _birnn_fwd(xs, w, lo, hi, cell, dtype_name):
    ys, cs, gates = _fwd_impl(xs, w, lo, hi, cell, dtype_name)
    return ys, (w, lo, hi, ys, cs, gates)


def _shift_prev(ys):
    """h_prev stream: [0, ys[0], ..., ys[T-2]]."""
    return jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)


def _dw_einsum(h_prev, dgate, B, dtype):
    """dW[d] = Σ_t h_prev[t, d-rows]ᵀ · dgate[t, d-rows] — one large MXU
    matmul per direction, replacing T per-step accumulations inside the
    sequential kernel. bf16 operands / fp32 accumulation matches the
    kernel's in-step accumulation numerics."""
    return jnp.stack([
        jnp.einsum("trh,trg->hg", h_prev[:, :B].astype(dtype),
                   dgate[:, :B].astype(dtype),
                   preferred_element_type=jnp.float32),
        jnp.einsum("trh,trg->hg", h_prev[:, B:].astype(dtype),
                   dgate[:, B:].astype(dtype),
                   preferred_element_type=jnp.float32)])


def _birnn_bwd(cell, dtype_name, res, g):
    w, lo, hi, ys, cs, gates = res
    T, R, H = ys.shape
    GH = w.shape[2]
    B = R // 2
    dtype = jnp.dtype(dtype_name)
    sdt = _stream_dt(dtype)     # == xs.dtype (asserted in _fwd_impl)
    grid = (1, T)
    rw = lambda width: pl.BlockSpec((R, width), lambda i, t: (0, 0))
    h_prev = _shift_prev(ys)
    if cell == "gru":
        kern = functools.partial(_gru_bwd_kernel, B, H, dtype)
        dxs, dhn = pl.pallas_call(
            kern, grid=grid,
            in_specs=[_specs_tbx_rev(R, 4 * H, T),
                      pl.BlockSpec(w.shape, lambda i, t: (0, 0, 0)),
                      rw(1), rw(1),
                      _specs_tbx_rev(R, H, T), _specs_tbx_rev(R, H, T)],
            out_specs=[_specs_tbx_rev(R, GH, T), _specs_tbx_rev(R, H, T)],
            out_shape=[jax.ShapeDtypeStruct((T, R, GH), sdt),
                       jax.ShapeDtypeStruct((T, R, H), sdt)],
            scratch_shapes=[pltpu.VMEM((R, H), jnp.float32)],
            interpret=_interp(),
        )(gates, w, lo, hi, h_prev, g)
        # dW column blocks: gates r,z from the dxs stream (bit-identical
        # to the old dhp columns), gate n from the dhn stream — the gate
        # axis is FREE in the einsum, so the split is bitwise-equal to
        # the former single [T,R,3H] dhp einsum
        dw = jnp.concatenate([
            _dw_einsum(h_prev, dxs[..., :2 * H], B, dtype),
            _dw_einsum(h_prev, dhn, B, dtype)], axis=2)
    else:
        c_prev = _shift_prev(cs)
        kern = functools.partial(_lstm_bwd_kernel, B, H, dtype)
        dxs = pl.pallas_call(
            kern, grid=grid,
            in_specs=[_specs_tbx_rev(R, 4 * H, T),
                      pl.BlockSpec(w.shape, lambda i, t: (0, 0, 0)),
                      rw(1), rw(1),
                      _specs_tbx_rev(R, H, T), _specs_tbx_rev(R, H, T),
                      _specs_tbx_rev(R, H, T)],
            out_specs=_specs_tbx_rev(R, GH, T),
            out_shape=jax.ShapeDtypeStruct((T, R, GH), sdt),
            scratch_shapes=[pltpu.VMEM((R, 2 * H), jnp.float32)],
            interpret=_interp(),
        )(gates, w, lo, hi, c_prev, cs, g)
        dw = _dw_einsum(h_prev, dxs, B, dtype)   # LSTM: dg ≡ dxs (masked)
    return dxs, dw, jnp.zeros_like(lo), jnp.zeros_like(hi)


birnn_pallas.defvjp(_birnn_fwd, _birnn_bwd)
