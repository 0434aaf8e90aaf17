"""Pallas fused front-end kernel vs golden oracle + jnp path
(SURVEY.md §7 Phase 3 rule: a kernel lands only if it matches the
jnp version under the Phase-1 oracles). Interpret mode on CPU."""

import numpy as np

import jax.numpy as jnp

from chainer_speech_recognition_tpu import constants as C
from chainer_speech_recognition_tpu.frontend import golden_np as g
from chainer_speech_recognition_tpu.frontend.jnp_frontend import batch_features
from chainer_speech_recognition_tpu.frontend.pallas_frontend import (
    batch_features_pallas, fused_logmel)


def _signals(lens=(16000, 9000, 2000), seed=0):
    rng = np.random.default_rng(seed)
    nmax = max(lens)
    sigs = np.zeros((len(lens), nmax), np.float32)
    for i, L in enumerate(lens):
        sigs[i, :L] = rng.standard_normal(L).astype(np.float32)
    return sigs, list(lens)


def test_fused_logmel_matches_golden():
    sigs, lens = _signals(lens=(8000,))
    from chainer_speech_recognition_tpu.frontend.jnp_frontend import (
        _K, extend_signal, frame_signal)
    t_max = C.num_frames(sigs.shape[1])
    ext = extend_signal(jnp.asarray(sigs), jnp.asarray(lens), t_max + _K + 1)
    frames = frame_signal(ext, t_max)
    lm = np.asarray(fused_logmel(frames))[0]
    ref = g.log_mel(sigs[0])
    np.testing.assert_allclose(lm[: ref.shape[0]], ref, atol=5e-4, rtol=1e-4)


def test_batch_features_pallas_matches_golden_and_jnp():
    sigs, lens = _signals()
    fp, lp = batch_features_pallas(jnp.asarray(sigs), jnp.asarray(lens),
                                   apply_cmvn=True)
    fj, lj = batch_features(jnp.asarray(sigs), jnp.asarray(lens),
                            apply_cmvn=True)
    fp, fj = np.asarray(fp), np.asarray(fj)
    assert np.array_equal(np.asarray(lp), np.asarray(lj))
    np.testing.assert_allclose(fp, fj, atol=2e-3, rtol=1e-3)
    for i, L in enumerate(lens):
        ref = g.features(sigs[i, :L], apply_cmvn=True)
        T = ref.shape[0]
        np.testing.assert_allclose(fp[i, :T], ref, atol=2e-3, rtol=1e-3)
        assert np.all(fp[i, T:] == 0)


def test_fused_rows_multi_tile_halo_exact():
    """T > _TTILE exercises the +8-row halo across tile boundaries — the
    fused-framing kernel must match the framed path EXACTLY at every
    tile count (the single-tile tests above never read a real halo)."""
    from chainer_speech_recognition_tpu.frontend.jnp_frontend import (
        _K, extend_signal, frame_signal)
    from chainer_speech_recognition_tpu.frontend.pallas_frontend import (
        _TTILE, fused_logmel, fused_logmel_rows)

    rng = np.random.default_rng(3)
    for T in (_TTILE + 120, 2 * _TTILE):             # 2 and 3 tiles
        n = (T - 1) * C.HOP_LENGTH + 37
        sigs = rng.standard_normal((2, n)).astype(np.float32)
        lens = jnp.asarray([n, n // 2], jnp.int32)
        ext = extend_signal(jnp.asarray(sigs), lens, T + _K + 1)
        a = np.asarray(fused_logmel_rows(ext, T))
        b = np.asarray(fused_logmel(frame_signal(ext, T)))
        np.testing.assert_array_equal(a, b)
