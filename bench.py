#!/usr/bin/env python
"""Benchmark harness (BASELINE.json:2): training utterances/sec/chip on the
config-2 acoustic model (conv subsampling + 3-layer BiGRU CTC), bucketed
synthetic 16 kHz audio, full fused train step (on-device front-end → model →
CTC → grad → update) under the DP mesh.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured against the host-CPU JAX run of the same config
(the "Chainer-CPU" stand-in mandated by BASELINE.md — Chainer itself is not
installable offline). Re-measure with ``--backend cpu``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Chainer-CPU stand-in: this benchmark with --backend cpu at the default
# config (measured 2026-08-16: --backend cpu --steps 2 → 8.68 utt/s, fp32,
# full host, B32/frames1024; see BASELINE.md). utt/sec/chip.
CPU_BASELINE_UPS = 8.68


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=1024)  # ~10.2 s utterances
    p.add_argument("--preset", default="bigru")
    args = p.parse_args(argv)

    if args.backend == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from chainer_speech_recognition_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chainer_speech_recognition_tpu import constants as C
    from chainer_speech_recognition_tpu.config import preset_config
    from chainer_speech_recognition_tpu.data.synthetic import make_batch
    from chainer_speech_recognition_tpu.frontend.jnp_frontend import batch_features
    from chainer_speech_recognition_tpu.models.presets import build_model
    from chainer_speech_recognition_tpu.parallel.mesh import make_mesh, shard_batch
    from chainer_speech_recognition_tpu.train.state import init_state
    from chainer_speech_recognition_tpu.train.step import make_train_step

    n_chips = len(jax.devices())
    compute_dtype = "float32" if args.backend == "cpu" else "bfloat16"
    cfg = preset_config(args.preset).override({
        "model.vocab_size": 64, "model.compute_dtype": compute_dtype,
    })
    model = build_model(cfg.model)
    mesh = make_mesh(cfg.parallel)

    # synthetic bucket batch: utterances 60-100% of the bucket's max frames
    rng = np.random.default_rng(0)
    max_samples = (args.frames - 1) * C.HOP_LENGTH
    B = args.batch
    batch = make_batch(rng, batch_size=B, vocab_size=64, min_len=8,
                       max_len=24, tone_len=max_samples // 24,
                       max_label_len=32)
    sig = np.zeros((B, max_samples), np.float32)
    n = min(batch["signals"].shape[1], max_samples)
    sig[:, :n] = batch["signals"][:, :n]
    batch = {"signals": sig,
             "num_samples": np.minimum(batch["num_samples"], max_samples),
             "labels": batch["labels"],
             "label_lengths": batch["label_lengths"]}

    feats, flens = batch_features(jnp.asarray(batch["signals"][:1]),
                                  jnp.asarray(batch["num_samples"][:1]))
    state = init_state(model, cfg.optim, jax.random.key(0), feats, flens)
    train_step = make_train_step(model, cfg, mesh)

    # Timing methodology: on relay-attached TPUs block_until_ready can
    # return before execution finishes; reading a host scalar (float()) is
    # the only reliable drain. The batch is device-resident during the
    # timed loop (real training overlaps host->device transfer with
    # compute — see train/loop.py lookahead).
    sharded = shard_batch(mesh, batch)
    state, m = train_step(state, sharded)          # compile
    _ = float(m["loss"])
    state, m = train_step(state, sharded)          # warm
    _ = float(m["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = train_step(state, sharded)
    _ = float(m["loss"])                           # drain the device queue
    dt = time.perf_counter() - t0

    ups_per_chip = B * args.steps / dt / n_chips
    audio_sec = float(np.sum(batch["num_samples"])) / C.SAMPLE_RATE
    rtf = audio_sec * args.steps / dt / n_chips    # audio-sec per wall-sec

    # decode throughput: eval forward + on-device greedy (BASELINE.json:2
    # tracks RTF for train AND decode)
    from chainer_speech_recognition_tpu.decode.greedy import greedy_decode
    from chainer_speech_recognition_tpu.train.step import make_eval_step

    eval_step = make_eval_step(model, cfg)
    eb = {k: jnp.asarray(v) for k, v in batch.items()}

    def decode_once():
        losses, logits, olens = eval_step(state.params, eb)
        ids, out_lens = greedy_decode(logits, olens, max_len=64)
        return ids

    ids = decode_once(); _ = np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        ids = decode_once()
    _ = np.asarray(ids)                            # drain
    ddt = time.perf_counter() - t0
    decode_rtf = audio_sec * args.steps / ddt / n_chips
    decode_ups = B * args.steps / ddt / n_chips

    result = {
        "metric": "train_utterances_per_sec_per_chip",
        "value": round(ups_per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(ups_per_chip / CPU_BASELINE_UPS, 2),
        "extra": {
            "backend": args.backend, "n_chips": n_chips,
            "preset": args.preset, "batch": B, "frames": args.frames,
            "train_rtf_per_chip": round(rtf, 1),
            "decode_utt_per_sec_per_chip": round(decode_ups, 1),
            "decode_rtf_per_chip": round(decode_rtf, 1),
            "loss": round(float(m["loss"]), 4),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
