"""Pallas fused BiRNN kernels vs the lax.scan layer — values AND gradients
(SURVEY.md §7 hard-part 4; the scan path stays the oracle forever).
Interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chainer_speech_recognition_tpu.models.rnn import BiRNNLayer


def _data(seed=0, B=4, T=13, D=12):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, T + 1, B).astype(np.int32))
    return x, lens


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_pallas_birnn_matches_scan(cell):
    x, lens = _data()
    scan_layer = BiRNNLayer(hidden=8, cell=cell, dtype=jnp.float32,
                            impl="scan")
    pal_layer = BiRNNLayer(hidden=8, cell=cell, dtype=jnp.float32,
                           impl="pallas")
    params = scan_layer.init(jax.random.key(0), x, lens)
    y_scan = scan_layer.apply(params, x, lens)
    y_pal = pal_layer.apply(params, x, lens)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_pallas_birnn_grad_matches_scan(cell):
    x, lens = _data(seed=1, B=3, T=9, D=6)
    scan_layer = BiRNNLayer(hidden=4, cell=cell, dtype=jnp.float32,
                            impl="scan")
    pal_layer = BiRNNLayer(hidden=4, cell=cell, dtype=jnp.float32,
                           impl="pallas")
    params = scan_layer.init(jax.random.key(1), x, lens)

    def loss(layer, p, xx):
        y = layer.apply(p, xx, lens)
        # weighted sum so every output position gets a distinct cotangent
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
        return jnp.sum(y * w)

    g_scan = jax.grad(lambda p, xx: loss(scan_layer, p, xx),
                      argnums=(0, 1))(params, x)
    g_pal = jax.grad(lambda p, xx: loss(pal_layer, p, xx),
                     argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.slow
def test_pallas_birnn_bf16_streams_close_to_scan(cell):
    """Under bf16 compute the kernel streams xs/gates/dxs as bf16 (half
    the HBM traffic); values+grads must stay within bf16 noise of the
    bf16 scan path."""
    x, lens = _data(seed=3, B=4, T=11, D=8)
    scan_layer = BiRNNLayer(hidden=8, cell=cell, dtype=jnp.bfloat16,
                            impl="scan")
    pal_layer = BiRNNLayer(hidden=8, cell=cell, dtype=jnp.bfloat16,
                           impl="pallas")
    params = scan_layer.init(jax.random.key(3), x, lens)

    def loss(layer, p, xx):
        y = layer.apply(p, xx, lens)
        w = jnp.cos(jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape)
        return jnp.sum(y * w)

    y_scan = scan_layer.apply(params, x, lens)
    y_pal = pal_layer.apply(params, x, lens)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan),
                               atol=3e-2, rtol=3e-2)
    g_scan = jax.grad(lambda p, xx: loss(scan_layer, p, xx),
                      argnums=(0, 1))(params, x)
    g_pal = jax.grad(lambda p, xx: loss(pal_layer, p, xx),
                     argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-2, rtol=5e-2)


def test_pallas_birnn_padding_invariance():
    x, _ = _data(seed=2, B=2, T=12, D=6)
    lens = jnp.asarray([12, 7])
    layer = BiRNNLayer(hidden=4, cell="gru", dtype=jnp.float32, impl="pallas")
    params = layer.init(jax.random.key(2), x, lens)
    y1 = layer.apply(params, x, lens)
    y2 = layer.apply(params, x[:, :7], jnp.asarray([7, 7]))
    np.testing.assert_allclose(np.asarray(y1)[1, :7], np.asarray(y2)[1, :7],
                               atol=1e-6)
    assert np.all(np.asarray(y1)[1, 7:] == 0)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("bidir", [True, False])
def test_pallas_stream_kernel_matches_scan(cell, bidir):
    """Streaming chunk call (h0-seeded forward carry + mid-window carry
    out, ops/rnn_pallas.birnn_pallas_stream) must equal the scan path's
    (out, h_carry) exactly — including padding-frozen carries and the
    emit_carry_at=0 degenerate chunk."""
    x, lens = _data(seed=5, B=4, T=12, D=10)
    H = 8
    C = H if cell == "gru" else 2 * H
    rng = np.random.default_rng(6)
    h0 = jnp.asarray(rng.standard_normal((4, C)).astype(np.float32)) * 0.3
    scan_layer = BiRNNLayer(hidden=H, cell=cell, dtype=jnp.float32,
                            impl="scan", bidirectional=bidir)
    pal_layer = BiRNNLayer(hidden=H, cell=cell, dtype=jnp.float32,
                           impl="pallas", bidirectional=bidir)
    params = scan_layer.init(jax.random.key(5), x, lens)
    for emit in (0, 1, 7, 12):
        y_s, c_s = scan_layer.apply(params, x, lens, h0_fwd=h0,
                                    emit_carry_at=emit)
        y_p, c_p = pal_layer.apply(params, x, lens, h0_fwd=h0,
                                   emit_carry_at=emit)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"out emit={emit}")
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"carry emit={emit}")
