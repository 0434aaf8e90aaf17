"""Non-interpret Pallas smoke suite (VERDICT r3 next #3): every
``pallas_call`` entry point must COMPILE AND RUN on the real TPU backend
at production tile shapes, checked against the jnp path at loose
tolerance (bf16 MXU rounding ~2^-8; the tight numeric contracts live in
the interpret-mode differential suites).

Round 3 shipped a kernel that was green in interpret mode yet failed
Mosaic lowering at every shape on the chip — this suite makes that class
of failure structurally impossible to miss:

    CSR_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

Entry points covered: front-end ``_kernel_rows`` (via
``batch_features_pallas``), RNN fwd/bwd (``birnn_pallas`` + VJP), RNN
stream (``birnn_pallas_stream``), CTC fwd/bwd (``ctc_loss_pallas`` +
VJP), greedy decode (``greedy_decode_pallas``), attention fwd/dq/dkv
(``flash_mhsa`` + VJP, full and chunk-causal).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.perf,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="Pallas smoke suite runs on real TPU only "
                              "(CSR_TPU_TESTS=1)"),
]


@pytest.fixture(scope="module", autouse=True)
def _compile_cache():
    if jax.default_backend() == "tpu":
        from chainer_speech_recognition_tpu.utils.runtime import (
            enable_compilation_cache)
        enable_compilation_cache()


def test_frontend_kernel_rows():
    from chainer_speech_recognition_tpu import constants as C
    from chainer_speech_recognition_tpu.frontend.jnp_frontend import (
        batch_features)
    from chainer_speech_recognition_tpu.frontend.pallas_frontend import (
        batch_features_pallas)
    rng = np.random.default_rng(0)
    B, frames = 8, 1024
    n = (frames - 1) * C.HOP_LENGTH
    sig = rng.uniform(-0.5, 0.5, (B, n)).astype(np.float32)
    lens = np.full(B, n, np.int64)
    lens[0] = n // 3
    got, gl = batch_features_pallas(jnp.asarray(sig), jnp.asarray(lens))
    want, wl = batch_features(jnp.asarray(sig), jnp.asarray(lens))
    # TPU fp32 DFT: ~4e-3 maxabs on near-silent mel bins (log+CMVN
    # amplified); the golden-parity contract is tested on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl))


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_rnn_fwd_bwd(cell):
    from chainer_speech_recognition_tpu.models.rnn import BiRNNLayer
    rng = np.random.default_rng(1)
    B, T, D, H = 16, 256, 128, 384              # production tile shape
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, T + 1, B).astype(np.int32))
    pal = BiRNNLayer(hidden=H, cell=cell, dtype=jnp.float32, impl="pallas")
    ref = BiRNNLayer(hidden=H, cell=cell, dtype=jnp.float32, impl="scan")
    params = pal.init(jax.random.key(1), x, lens)
    w = jnp.asarray(rng.standard_normal((B, T, 2 * H)).astype(np.float32))

    def loss(layer):
        return lambda p: jnp.sum(layer.apply(p, x, lens) * w)

    yp = pal.apply(params, x, lens)
    ys = ref.apply(params, x, lens)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(ys),
                               rtol=2e-2, atol=2e-2)
    gp = jax.grad(loss(pal))(params)
    gs = jax.grad(loss(ref))(params)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-2, atol=5e-2)


def test_rnn_stream_kernel():
    from chainer_speech_recognition_tpu.models.rnn import BiRNNLayer
    rng = np.random.default_rng(2)
    B, T, D, H = 16, 64, 128, 384
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray(np.full(B, T, np.int32))
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32)) * 0.3
    pal = BiRNNLayer(hidden=H, cell="gru", dtype=jnp.float32, impl="pallas")
    ref = BiRNNLayer(hidden=H, cell="gru", dtype=jnp.float32, impl="scan")
    params = pal.init(jax.random.key(2), x, lens)
    yp, cp = pal.apply(params, x, lens, h0_fwd=h0, emit_carry_at=48)
    ys, cs = ref.apply(params, x, lens, h0_fwd=h0, emit_carry_at=48)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(ys),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cs),
                               rtol=2e-2, atol=2e-2)


def test_ctc_fwd_bwd():
    from chainer_speech_recognition_tpu.ops.ctc_jax import ctc_loss as ctc_jnp
    from chainer_speech_recognition_tpu.ops.ctc_pallas import ctc_loss_pallas
    rng = np.random.default_rng(3)
    B, T, S, V = 64, 256, 32, 64                # production bucket shape
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    tl = jnp.asarray(rng.integers(S * 2 + 1, T + 1, B).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, V, (B, S)).astype(np.int32))
    ll = jnp.asarray(rng.integers(1, S + 1, B).astype(np.int32))
    lp = ctc_loss_pallas(logits, tl, labels, ll)
    lj = ctc_jnp(logits, tl, labels, ll)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lj),
                               rtol=1e-3, atol=1e-3)
    gp = jax.grad(lambda lg: jnp.sum(
        ctc_loss_pallas(lg, tl, labels, ll)))(logits)
    gj = jax.grad(lambda lg: jnp.sum(
        ctc_jnp(lg, tl, labels, ll)))(logits)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj),
                               rtol=5e-3, atol=5e-3)


def test_greedy_decode():
    from chainer_speech_recognition_tpu.decode.greedy import greedy_decode
    from chainer_speech_recognition_tpu.decode.greedy_pallas import (
        greedy_decode_pallas)
    rng = np.random.default_rng(4)
    B, T, V = 32, 256, 100
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, T + 1, B).astype(np.int32))
    ip, lp = greedy_decode_pallas(logits, lens, max_len=64)
    ij, lj = greedy_decode(logits, lens, max_len=64)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lj))
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(ij))


@pytest.mark.parametrize("B,T,chunk,left", [
    (64, 256, 0, 0),
    (64, 256, 16, 2),
    # multi-key-block geometry (ADVICE r4): T=1024 → bq=256/bk=512, so
    # _skip_block is True for some grid cells — the pl.when skip path
    # must lower and run on the chip, not only in interpret mode
    (8, 1024, 16, 2),
])
def test_attention_fwd_bwd(B, T, chunk, left):
    from chainer_speech_recognition_tpu.ops.attention_pallas import (
        flash_mhsa, reference_mhsa)
    rng = np.random.default_rng(5)
    h, dh = 4, 64                               # production shape
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, h, dh))
                           .astype(np.float32)) for _ in range(3))
    lens = jnp.asarray(rng.integers(1, T + 1, B).astype(np.int32))
    m = (jnp.arange(T)[None, :] < lens[:, None])[:, :, None, None]

    def masked(x):
        return x * m.astype(x.dtype)

    got = flash_mhsa(q, k, v, lens, chunk=chunk, left_chunks=left)
    want = reference_mhsa(q, k, v, lens, chunk=chunk, left_chunks=left)
    np.testing.assert_allclose(np.asarray(masked(got)),
                               np.asarray(masked(want)),
                               rtol=1e-2, atol=1e-2)
    w = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss(fn):
        return lambda q, k, v: jnp.sum(masked(
            fn(q, k, v, lens, chunk=chunk, left_chunks=left)) * w)

    gg = jax.grad(loss(flash_mhsa), argnums=(0, 1, 2))(q, k, v)
    gw = jax.grad(loss(reference_mhsa), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gg, gw, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2,
                                   err_msg=f"d{name}")
