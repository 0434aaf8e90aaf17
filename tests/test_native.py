"""C++ runtime components vs Python oracles (SURVEY.md §2.9 equivalents)."""

import numpy as np
import pytest

from chainer_speech_recognition_tpu.decode.metrics import (
    edit_distance, edit_distance_py)
from chainer_speech_recognition_tpu.utils.native import (
    edit_distance_native, get_lib, read_wav_native)
from chainer_speech_recognition_tpu.utils.wav import (
    read_wav, read_wav_py, write_wav)


def test_native_builds():
    assert get_lib() is not None, "g++ build of native/csr_native.cpp failed"


def test_edit_distance_differential():
    rng = np.random.default_rng(0)
    for _ in range(100):
        a = list(rng.integers(0, 5, int(rng.integers(0, 25))))
        b = list(rng.integers(0, 5, int(rng.integers(0, 25))))
        assert edit_distance_native(a, b) == edit_distance_py(a, b)


def test_edit_distance_strings_route_through_native():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("こんにちは", "こんばんは") == 2
    assert edit_distance("", "") == 0


def test_wav_native_differential(tmp_path):
    rng = np.random.default_rng(1)
    sig = rng.uniform(-0.9, 0.9, 12345).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, sig)
    w_py = read_wav_py(path)
    native = read_wav_native(path)
    assert native is not None
    w_c, rate = native
    assert rate == 16000
    np.testing.assert_array_equal(w_py, w_c)
    assert read_wav(path).dtype == np.float32


def test_wav_bad_rate_strict_mode_raises(tmp_path):
    import wave
    path = str(tmp_path / "bad.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 100)
    with pytest.raises(ValueError):
        read_wav(path, resample=False)


def test_wav_native_malformed_returns_none(tmp_path):
    path = str(tmp_path / "junk.wav")
    with open(path, "wb") as f:
        f.write(b"not a wav file at all, definitely not RIFF")
    assert read_wav_native(path) is None
