"""Minimal WAV I/O (stdlib only — no soundfile/librosa offline).

Reads/writes 16-bit PCM mono WAV at the contract sample rate. The reference
consumed 16 kHz PCM from the CSJ corpus (SURVEY.md §2.2 "Corpus reader").
"""

from __future__ import annotations

import wave

import numpy as np

from ..constants import SAMPLE_RATE


def read_wav(path: str) -> np.ndarray:
    """→ float32 signal in [-1, 1]; validates rate/channels/width.

    Prefers the C++ RIFF parser (native/csr_native.cpp) for the data-loader
    thread; falls back to stdlib ``wave`` (also the differential oracle).
    """
    from .native import read_wav_native

    native = read_wav_native(str(path), SAMPLE_RATE)
    if native is not None:
        return native
    return read_wav_py(path)


def read_wav_py(path: str) -> np.ndarray:
    """stdlib reference implementation."""
    with wave.open(str(path), "rb") as w:
        if w.getframerate() != SAMPLE_RATE:
            raise ValueError(f"{path}: expected {SAMPLE_RATE} Hz, got {w.getframerate()}")
        if w.getnchannels() != 1:
            raise ValueError(f"{path}: expected mono, got {w.getnchannels()} channels")
        if w.getsampwidth() != 2:
            raise ValueError(f"{path}: expected 16-bit PCM")
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0


def write_wav(path: str, signal: np.ndarray) -> None:
    pcm = np.clip(np.asarray(signal) * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SAMPLE_RATE)
        w.writeframes(pcm.tobytes())
