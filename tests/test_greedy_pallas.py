"""Pallas greedy-decode kernel vs host oracle + XLA greedy."""

import numpy as np

import jax.numpy as jnp

from chainer_speech_recognition_tpu.constants import PAD_LABEL_ID
from chainer_speech_recognition_tpu.decode.greedy import (
    greedy_decode, greedy_decode_np)
from chainer_speech_recognition_tpu.decode.greedy_pallas import (
    greedy_decode_pallas)


def test_pallas_greedy_matches_oracle():
    rng = np.random.default_rng(0)
    B, T, V = 11, 37, 29
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lens = rng.integers(1, T + 1, B).astype(np.int32)
    ids, out_lens = greedy_decode_pallas(jnp.asarray(logits), jnp.asarray(lens))
    ids, out_lens = np.asarray(ids), np.asarray(out_lens)
    for b in range(B):
        ref = greedy_decode_np(logits[b], lens[b])
        assert list(ids[b, : out_lens[b]]) == ref, b
        assert np.all(ids[b, out_lens[b]:] == PAD_LABEL_ID)


def test_pallas_greedy_equals_xla_greedy():
    rng = np.random.default_rng(3)
    B, T, V = 8, 50, 40
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lens = rng.integers(1, T + 1, B).astype(np.int32)
    i1, l1 = greedy_decode(jnp.asarray(logits), jnp.asarray(lens))
    i2, l2 = greedy_decode_pallas(jnp.asarray(logits), jnp.asarray(lens))
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_greedy_pallas_nan_frame_stays_in_vocab():
    """An all-NaN frame (diverged checkpoint) must not emit the
    out-of-vocab sentinel id Vp — it maps to blank and is dropped."""
    import numpy as np

    logits = np.full((1, 5, 6), -5.0, np.float32)
    logits[0, 1, 2] = 5.0
    logits[0, 3, :] = np.nan
    ids, out_lens = greedy_decode_pallas(jnp.asarray(logits),
                                         jnp.asarray([5]))
    got = list(np.asarray(ids)[0, : int(out_lens[0])])
    assert all(0 <= g < 6 for g in got), got
    assert got == [2]
