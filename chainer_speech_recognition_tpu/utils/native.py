"""ctypes loader/builder for the C++ runtime components (native/csr_native.cpp).

Compiles on first use with g++ (cached as a .so beside the source hash),
falls back to None so every caller keeps its pure-Python path
(SURVEY.md §2.9 — native equivalents for the host-side hot loops).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "csr_native.cpp")
_LIB = None
_TRIED = False


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = os.path.join(_REPO_ROOT, "native", "build")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, f"csr_native_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    # portable flags: the .so is a build artifact (gitignored), but keep it
    # ISA-safe anyway — -march=native would SIGILL if the cache dir ever
    # moved hosts, and the hot loops here are memory-bound DP/parse code.
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", so_path + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception as e:  # compiler missing / failed: fall back to Python
        print(f"[csr_native] build failed, using Python fallbacks: {e}",
              file=sys.stderr)
        return None


def get_lib():
    """→ configured ctypes CDLL or None (use Python fallbacks)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.edit_distance_i32.restype = ctypes.c_int64
    lib.edit_distance_i32.argtypes = [i32p, ctypes.c_int64, i32p, ctypes.c_int64]
    lib.edit_distance_batch_i32.restype = None
    lib.edit_distance_batch_i32.argtypes = [
        i32p, i32p, i32p, i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.wav_pcm16_to_f32.restype = ctypes.c_int64
    lib.wav_pcm16_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    # probe before trusting a cached binary: a known-answer call catches a
    # stale/incompatible .so here instead of deep inside a training run
    a = np.asarray([1, 2, 3], np.int32)
    b = np.asarray([1, 3], np.int32)
    i32 = ctypes.POINTER(ctypes.c_int32)
    if lib.edit_distance_i32(a.ctypes.data_as(i32), 3,
                             b.ctypes.data_as(i32), 2) != 1:
        print("[csr_native] self-test failed, using Python fallbacks",
              file=sys.stderr)
        return None
    _LIB = lib
    return _LIB


def _as_i32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.int32))


def edit_distance_native(hyp, ref) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    a, b = _as_i32(hyp), _as_i32(ref)
    return int(lib.edit_distance_i32(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(b)))


def edit_distance_batch_native(hyps, hyp_lens, refs, ref_lens):
    """Batched Levenshtein over padded id matrices.

    hyps [N, Sh] / refs [N, Sr] int32 (row-padded, lengths in *_lens) →
    int64[N] distances via ONE ctypes call per eval batch (the natural
    amortization point for the C++ kernel), or None when the native lib
    is unavailable — callers fall back to the per-pair path."""
    lib = get_lib()
    if lib is None:
        return None
    h = np.ascontiguousarray(np.asarray(hyps, np.int32))
    r = np.ascontiguousarray(np.asarray(refs, np.int32))
    hl = _as_i32(hyp_lens)
    rl = _as_i32(ref_lens)
    n = h.shape[0]
    out = np.empty(n, np.int64)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.edit_distance_batch_i32(
        h.ctypes.data_as(i32), hl.ctypes.data_as(i32),
        r.ctypes.data_as(i32), rl.ctypes.data_as(i32),
        n, h.shape[1] if h.ndim > 1 else 0,
        r.shape[1] if r.ndim > 1 else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def read_wav_native(path: str) -> tuple[np.ndarray, int] | None:
    """→ (float32 mono signal, sample rate), or None for anything the C++
    fast path doesn't handle (non-PCM16, multichannel) — callers fall back
    to the stdlib reader, which also downmixes/resamples."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = np.frombuffer(f.read(), dtype=np.uint8)
    out = np.empty(len(buf) // 2 + 1, dtype=np.float32)
    rate = ctypes.c_int32(0)
    n = lib.wav_pcm16_to_f32(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
        ctypes.byref(rate))
    if n < 0:
        return None
    return out[:n].copy(), int(rate.value)
