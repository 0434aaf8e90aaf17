"""Differential tests: Pallas flash attention vs the einsum oracle.

The kernel (ops/attention_pallas.py) must reproduce models/attention.py's
offline MHSA semantics — fp32 masked softmax, bf16 prob/value matmul,
key-padding + chunk-causal masks — for values AND gradients (custom VJP),
across padding-required T, multiple blocks, and degenerate lengths.
Interpret mode on CPU (tests/conftest.py platform contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chainer_speech_recognition_tpu.ops.attention_pallas import (
    flash_mhsa, reference_mhsa)


def _mk(B, T, h, dh, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q, k, v = (jax.random.normal(kk, (B, T, h, dh), dtype) for kk in ks[:3])
    lens = jax.random.randint(ks[3], (B,), 1, T + 1)
    return q, k, v, lens


def _masked(x, lens):
    """Zero padded-query rows — the only rows the contract covers
    (ConformerBlock re-zeroes padded frames at exit)."""
    T = x.shape[1]
    m = (jnp.arange(T)[None, :] < lens[:, None])[:, :, None, None]
    return x * m.astype(x.dtype)


_slow = pytest.param
CASES = [
    dict(B=3, T=64, h=2, dh=64, chunk=0, left=0),     # single padded block
    dict(B=2, T=256, h=4, dh=64, chunk=0, left=0),    # exact one-block grid
    dict(B=2, T=300, h=2, dh=64, chunk=0, left=0),    # pad 300 -> 512 grid
    dict(B=2, T=256, h=2, dh=64, chunk=16, left=2),   # chunk-causal
    dict(B=1, T=512, h=2, dh=128, chunk=0, left=0),   # multi-block, dh=128
    dict(B=2, T=512, h=2, dh=64, chunk=16, left=4),   # chunk across blocks
]
# interpret-mode kernels cost seconds per (grid-program × pass); keep the
# single-block + one multi-block forward fast, push the rest to -m slow
_FWD = [pytest.param(c, marks=pytest.mark.slow) if i >= 3 else c
        for i, c in enumerate(CASES)]
_GRAD = [pytest.param(c, marks=pytest.mark.slow) if i >= 2 else c
         for i, c in enumerate(CASES[:4])]


@pytest.mark.parametrize("case", _FWD)
def test_flash_matches_einsum_forward(case):
    q, k, v, lens = _mk(case["B"], case["T"], case["h"], case["dh"])
    got = flash_mhsa(q, k, v, lens, chunk=case["chunk"],
                     left_chunks=case["left"])
    want = reference_mhsa(q, k, v, lens, chunk=case["chunk"],
                          left_chunks=case["left"])
    np.testing.assert_allclose(_masked(got, lens), _masked(want, lens),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", _GRAD)
def test_flash_matches_einsum_grads(case):
    q, k, v, lens = _mk(case["B"], case["T"], case["h"], case["dh"], seed=7)
    T = case["T"]
    # cotangent enters only through valid frames, as in the real model
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape, q.dtype)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v, lens, chunk=case["chunk"],
                     left_chunks=case["left"])
            return jnp.sum(_masked(out, lens) * w)
        return f

    g_got = jax.grad(loss(flash_mhsa), argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss(reference_mhsa), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name} T={T}")


@pytest.mark.slow
def test_chunk_block_skip_values_and_grads():
    """ADVICE r4 (medium): the chunk-causal block-skip path (`pl.when`
    around `_body` in all three kernels) must be exercised where
    `_skip_block` is actually True for some grid cells — T=1024 with
    chunk=16/left=2 gives bq=256/bk=512 and skips the j=1 key block for
    i=0 (and j=0 for i=3) in the forward, plus the transposed cells in
    the dK/dV kernel. Values AND grads vs the einsum oracle."""
    from chainer_speech_recognition_tpu.ops.attention_pallas import (
        _blocks, _skip_block)
    T, chunk, left = 1024, 16, 2
    bq, bk = _blocks(T)
    skips = [(i, j) for i in range(T // bq) for j in range(T // bk)
             if _skip_block(i, j, bq, bk, chunk, left)]
    assert skips, "geometry regression: no grid cell skips at T=1024"
    q, k, v, lens = _mk(1, T, 1, 64, seed=13)
    w = jax.random.normal(jax.random.PRNGKey(14), q.shape, q.dtype)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v, lens, chunk=chunk, left_chunks=left)
            return jnp.sum(_masked(out, lens) * w)
        return f

    got = flash_mhsa(q, k, v, lens, chunk=chunk, left_chunks=left)
    want = reference_mhsa(q, k, v, lens, chunk=chunk, left_chunks=left)
    np.testing.assert_allclose(_masked(got, lens), _masked(want, lens),
                               rtol=2e-5, atol=2e-5)
    g_got = jax.grad(loss(flash_mhsa), argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(loss(reference_mhsa), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name} block-skip")


def test_flash_bf16_close_to_fp32_oracle():
    """bf16 production dtype: the kernel's fp32-softmax/bf16-matmul mix
    must sit within bf16 noise of the fp32 oracle (same classes as the
    einsum path's `preferred_element_type` contract)."""
    q, k, v, lens = _mk(2, 256, 4, 64, seed=3)
    got = flash_mhsa(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), lens)
    want = reference_mhsa(q, k, v, lens)
    np.testing.assert_allclose(
        _masked(got.astype(jnp.float32), lens), _masked(want, lens),
        rtol=0.05, atol=0.05)


def test_len1_and_full_rows():
    """Degenerate lengths: a 1-frame row and a full row in one batch."""
    q, k, v, _ = _mk(2, 128, 2, 64, seed=11)
    lens = jnp.array([1, 128], jnp.int32)
    got = flash_mhsa(q, k, v, lens)
    want = reference_mhsa(q, k, v, lens)
    np.testing.assert_allclose(_masked(got, lens), _masked(want, lens),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_flash_under_mesh_equals_single_device():
    """The kernel composes with shard_map over the DP mesh (rows split
    across devices) — the config-5 deployment shape for the attention
    family (tests/test_multichip.py discipline)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    q, k, v, _ = _mk(8, 128, 2, 64, seed=5)
    lens = jnp.array([1, 17, 64, 128, 90, 128, 3, 77], jnp.int32)
    sharded = shard_map(
        lambda q, k, v, l: flash_mhsa(q, k, v, l),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False)          # train/step.py convention: Pallas calls
                                  # have no vma annotations
    got = sharded(q, k, v, lens)
    want = flash_mhsa(q, k, v, lens)
    np.testing.assert_allclose(_masked(got, lens), _masked(want, lens),
                               rtol=1e-6, atol=1e-6)


def test_conformer_block_flash_equals_einsum():
    """End-to-end block equality: same params, impl='flash' vs 'einsum'."""
    from chainer_speech_recognition_tpu.models.attention import ConformerBlock
    B, T, d = 2, 64, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, d), jnp.float32)
    lens = jnp.array([40, 64], jnp.int32)
    blk_e = ConformerBlock(heads=2, dtype=jnp.float32, impl="einsum")
    blk_f = ConformerBlock(heads=2, dtype=jnp.float32, impl="flash")
    params = blk_e.init(jax.random.PRNGKey(1), x, lens)
    ye = blk_e.apply(params, x, lens)
    yf = blk_f.apply(params, x, lens)
    np.testing.assert_allclose(yf, ye, rtol=3e-5, atol=3e-5)


def test_routing_log_counts_traces():
    """The trace-time routing log (VERDICT r4 next #4: products assert
    the flash path actually executes) must bump exactly one counter per
    offline MHSA trace."""
    from chainer_speech_recognition_tpu.models.attention import ConformerBlock
    from chainer_speech_recognition_tpu.ops import attention_pallas as ap
    B, T, d = 1, 64, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, d), jnp.float32)
    lens = jnp.array([64], jnp.int32)
    for impl, key in (("einsum", "einsum"), ("flash", "flash")):
        blk = ConformerBlock(heads=2, dtype=jnp.float32, impl=impl)
        params = blk.init(jax.random.PRNGKey(1), x, lens)
        before = dict(ap.ROUTED)
        blk.apply(params, x, lens)
        assert ap.ROUTED[key] > before[key], (impl, ap.ROUTED, before)


def test_auto_policy_crossover_gate():
    """supports() encodes the round-5 routing decision: einsum at the
    bucket-menu lengths (flash's +9.4% step-time win at T'=512 is
    DECLINED because training through it stalls the conformer recipe's
    CTC plateau escape — supports() docstring), flash for long-form
    T > 512 where it wins +30% and the surface is forward-dominated.
    A silent gate change re-routes every conformer compile, so pin it."""
    from chainer_speech_recognition_tpu.ops.attention_pallas import supports
    assert not supports(256, 64)      # bench bucket: einsum wins (3323>3009)
    assert not supports(384, 64)      # bucket 1536: einsum (recipe stability)
    assert not supports(512, 64)      # step-time win declined (see docstring)
    assert supports(1024, 64)         # long-form: flash wins +30%
    assert supports(2048, 128)
    assert not supports(1024, 96)     # dh must be lane-tileable
    assert not supports(1024, 1024)   # dh beyond VMEM plan
