"""RotatingDeviceCache: corpora larger than the HBM budget train from
fixed-size double-buffered device windows (data/device_cache.py) — every
row visited ≥ once per epoch, deterministic plans, exact resume."""

import numpy as np
import pytest

import jax

from chainer_speech_recognition_tpu.data.device_cache import (
    RotatingDeviceCache)
from chainer_speech_recognition_tpu.data.packed import PackedBatchLoader
from chainer_speech_recognition_tpu.data.sampler import BucketSampler
from chainer_speech_recognition_tpu.parallel.mesh import make_mesh
from chainer_speech_recognition_tpu.train.loop import train

from test_packed import _packed, _tiny_cfg


def _rot(tmp_path, n=48, budget=1):
    """budget=1 byte forces the maximum window count."""
    utts, vocab, pc = _packed(tmp_path, n=n)
    cfg = _tiny_cfg(len(vocab))
    sampler = BucketSampler(utts, cfg.buckets, seed=0)
    loader = PackedBatchLoader(pc, cfg.buckets)
    mesh = make_mesh(cfg.parallel)              # 8 fake devices
    cache = RotatingDeviceCache(mesh, loader, sampler,
                                budget_bytes=budget, seed=0)
    return utts, vocab, pc, cfg, sampler, loader, cache


def test_rotating_feature_windows(tmp_path):
    """features_cfg set: fetched windows hold bf16 front-end output (the
    train.cache_features default path), not PCM."""
    import jax.numpy as jnp

    utts, vocab, pc = _packed(tmp_path, n=24)
    cfg = _tiny_cfg(len(vocab))
    sampler = BucketSampler(utts, cfg.buckets, seed=0)
    loader = PackedBatchLoader(pc, cfg.buckets)
    mesh = make_mesh(cfg.parallel)
    cache = RotatingDeviceCache(mesh, loader, sampler, budget_bytes=1,
                                seed=0, features_cfg=cfg.features)
    buffers = cache.fetch_window(0, 0)
    bid, buf = next(iter(buffers.items()))
    assert "features" in buf and "signals_i16" not in buf
    assert buf["features"].dtype == jnp.bfloat16
    assert buf["features"].shape[0] % mesh.devices.size == 0
    assert (np.asarray(buf["frame_lengths"]) > 0).all()


def test_rotating_features_equal_device_cache_features(tmp_path):
    """The same utterance must get bit-identical cached features whether
    it arrives via a rotating window or the full-corpus cache (same
    front-end, same chunking) — guards against window assembly reordering
    or re-normalizing rows."""
    from chainer_speech_recognition_tpu.data.device_cache import (
        DeviceCorpusCache)

    utts, vocab, pc = _packed(tmp_path, n=24)
    cfg = _tiny_cfg(len(vocab))
    sampler = BucketSampler(utts, cfg.buckets, seed=0)
    loader = PackedBatchLoader(pc, cfg.buckets)
    mesh = make_mesh(cfg.parallel)
    full = DeviceCorpusCache(mesh, loader, sampler, seed=0,
                             features_cfg=cfg.features)
    rot = RotatingDeviceCache(mesh, loader, sampler, budget_bytes=1,
                              seed=0, features_cfg=cfg.features)
    buffers = rot.fetch_window(0, 0)
    bid = next(iter(buffers))
    # map rotating window rows back to corpus indices, then find each in
    # the full cache's utt_map and compare the feature rows
    perms = rot._epoch_perms(0)
    win_rows = rot._window_rows(perms, 0)[bid]          # [n, R_w]
    full_map = full.utt_map[bid]                        # [n, R_f]
    rot_f = np.asarray(buffers[bid]["features"], np.float32)
    full_f = np.asarray(full.buckets[bid]["features"], np.float32)
    n = mesh.devices.size
    R_w, R_f = win_rows.shape[1], full_map.shape[1]
    checked = 0
    for d in range(n):
        for j in range(R_w):
            corpus_idx = win_rows[d, j]
            hits = np.nonzero(full_map[d] == corpus_idx)[0]
            if len(hits) == 0:
                continue
            np.testing.assert_array_equal(
                rot_f[d * R_w + j], full_f[d * R_f + int(hits[0])])
            checked += 1
    assert checked >= 8, f"only {checked} overlapping rows compared"


@pytest.mark.slow
def test_rotating_plan_covers_every_row(tmp_path):
    utts, vocab, pc, cfg, sampler, loader, cache = _rot(tmp_path)
    assert cache.n_windows >= 2, "budget should force multiple windows"

    for epoch in (0, 1):
        plan = cache.epoch_plan(epoch, steps_per_dispatch=1)
        perms = cache._epoch_perms(epoch)
        seen: set[int] = set()
        for w, bid, slots in plan:
            rows = cache._window_rows(perms, w)[bid]     # [n, R_w]
            kb = len(slots) // cache.n
            for d in range(cache.n):
                seen.update(int(rows[d][s])
                            for s in slots[d * kb : (d + 1) * kb])
        want = {int(i) for b in sampler.buckets for i in b}
        assert seen == want, "every corpus row must be sampled each epoch"

    # deterministic plan per (seed, epoch); different across epochs
    p0a = cache.epoch_plan(0, 1)
    p0b = cache.epoch_plan(0, 1)
    assert len(p0a) == len(p0b)
    for (wa, ba, sa), (wb, bb, sb) in zip(p0a, p0b):
        assert wa == wb and ba == bb and np.array_equal(sa, sb)


@pytest.mark.slow
def test_rotating_windows_are_monotone_and_fixed_shape(tmp_path):
    _, _, _, _, _, loader, cache = _rot(tmp_path)
    plan = cache.epoch_plan(0, steps_per_dispatch=2)
    ws = [w for w, _, _ in plan]
    assert ws == sorted(ws), "plan must group windows contiguously"
    b0 = cache.fetch_window(0, 0)
    b1 = cache.fetch_window(0, cache.n_windows - 1)
    for bid in set(b0) & set(b1):
        for k in b0[bid]:
            assert b0[bid][k].shape == b1[bid][k].shape, (
                "window buffers must be shape-stable (no recompiles)")
    # a bucket absent from a window's buffers must be exactly one the
    # plan never dispatches there (review r3: fetch_window skips
    # all-wrapped buckets instead of paying IO+transfer+FE for them)
    for w, bufs in ((0, b0), (cache.n_windows - 1, b1)):
        planned = {bid for pw, bid, _ in plan if pw == w}
        assert planned <= set(bufs), (
            f"window {w}: plan dispatches {planned - set(bufs)} "
            "but fetch_window skipped them")


@pytest.mark.slow
def test_train_rotating_mode_and_exact_resume(tmp_path):
    utts, vocab, pc = _packed(tmp_path, n=48)
    cfg = _tiny_cfg(len(vocab)).override({
        "train.data_mode": "rotating", "train.steps_per_dispatch": 2,
        "train.device_cache_budget_gb": 1e-6,    # force several windows
        "train.total_steps": 8, "train.checkpoint_every": 4,
        "train.log_every": 2, "train.eval_every": 1000,
        "train.checkpoint_dir": str(tmp_path / "ckpt_a")})
    loader = PackedBatchLoader(pc, cfg.buckets)
    state_full = train(cfg, utts, vocab, resume=False, loader=loader)
    assert int(state_full.step) == 8

    cfg_b = cfg.override({"train.total_steps": 4,
                          "train.checkpoint_dir": str(tmp_path / "ckpt_b")})
    train(cfg_b, utts, vocab, resume=False, loader=loader)
    state_res = train(cfg_b.override({"train.total_steps": 8}), utts, vocab,
                      resume=True, loader=loader)
    assert int(state_res.step) == 8
    for a, b in zip(jax.tree.leaves(state_full.params),
                    jax.tree.leaves(state_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_mode_picks_rotating_when_over_budget(tmp_path):
    from chainer_speech_recognition_tpu.train.loop import _resolve_data_mode

    utts, vocab, pc = _packed(tmp_path, n=48)
    cfg = _tiny_cfg(len(vocab))
    sampler = BucketSampler(utts, cfg.buckets, seed=0)
    assert _resolve_data_mode(cfg, sampler) == "device_cache"
    tiny = cfg.override({"train.device_cache_budget_gb": 1e-9})
    assert _resolve_data_mode(tiny, sampler) == "rotating"


def test_budget_is_per_chip(tmp_path):
    """device_cache_budget_gb is PER-CHIP (VERDICT r2 weak #2): the cache
    is row-sharded, so an 8-device mesh must admit ~8x the corpus that a
    single chip would before falling back to rotating."""
    from chainer_speech_recognition_tpu.data.device_cache import estimate_bytes
    from chainer_speech_recognition_tpu.train.loop import _resolve_data_mode

    utts, vocab, pc = _packed(tmp_path, n=48)
    cfg = _tiny_cfg(len(vocab))
    sampler = BucketSampler(utts, cfg.buckets, seed=0)
    est = estimate_bytes(sampler, features=cfg.train.cache_features,
                         cache_dtype=cfg.train.cache_dtype)
    # budget chosen so the whole-mesh estimate exceeds ONE chip's budget
    # but fits the 8-chip aggregate
    per_chip_gb = est / 2 / 1e9
    cfg = cfg.override({"train.device_cache_budget_gb": per_chip_gb})
    assert _resolve_data_mode(cfg, sampler, n_devices=1) == "rotating"
    assert _resolve_data_mode(cfg, sampler, n_devices=8) == "device_cache"
