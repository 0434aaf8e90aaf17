"""Evaluate CLI: checkpoint → dev/test CER (SURVEY.md §3.4).

Reconstructs the exact training config (front-end included) from the
checkpoint directory's frozen config.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from ..data.corpus import load_index
from ..data.sampler import BatchLoader, BucketSampler
from ..models.presets import build_model
from ..train.checkpoint import latest_checkpoint, load_config, restore_checkpoint
from ..parallel.mesh import make_mesh
from ..train.loop import evaluate_multi
from ..train.state import init_state
from ..train.step import make_auto_eval
from ..vocab import Vocab
from ..utils.runtime import respect_jax_platforms


def load_model_and_params(ckpt_dir: str, average_last: int = 1,
                          overrides: dict | None = None):
    """Load the latest checkpoint; ``average_last=N`` instead AVERAGES the
    parameters of the last N checkpoints (classic eval-time checkpoint
    averaging — the kept-N training checkpoints act as a cheap ensemble;
    optimizer state stays the latest's).

    ``overrides`` are dotted config overrides applied on top of the frozen
    training config — eval-time deployment knobs (bucket shapes, batch
    sizes, parallel axes). ``model.*`` keys are rejected — the topology
    must match the checkpoint or restore would mis-map parameters — with
    the exception of EXECUTION-CHOICE knobs that leave the parameter
    layout and semantics untouched (``model.attn_impl``,
    ``model.attn_residual_dtype``, ``model.rnn_impl``): a checkpoint
    trained on the einsum path can deploy long-form on the flash kernel,
    or fp32-trained residuals can serve bf16 (round-5 recipes,
    BASELINE.md)."""
    cfg = load_config(ckpt_dir)
    if overrides:
        exec_knobs = {"model.attn_impl", "model.attn_residual_dtype",
                      "model.rnn_impl"}
        bad = [k for k in overrides
               if k.split(".", 1)[0] == "model" and k not in exec_knobs]
        if bad:
            raise SystemExit(
                f"--set cannot override model topology ({', '.join(bad)}): "
                "the checkpoint's parameters were shaped by the frozen "
                "model config (execution-choice knobs model.attn_impl / "
                "model.attn_residual_dtype / model.rnn_impl ARE allowed)")
        cfg = cfg.override(overrides)
    model = build_model(cfg.model)
    ex = jnp.zeros((1, cfg.buckets.boundaries[0], cfg.features.n_mels, 3),
                   jnp.float32)
    state = init_state(model, cfg.optim, jax.random.key(0), ex,
                       jnp.asarray([cfg.buckets.boundaries[0]]))
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        raise SystemExit(f"no checkpoint found in {ckpt_dir}")
    if average_last <= 1:
        state = restore_checkpoint(path, state)
    else:
        from ..train.checkpoint import list_checkpoints

        names = list_checkpoints(ckpt_dir)[-average_last:]
        if len(names) < average_last:
            raise SystemExit(
                f"--average-last {average_last}: only {len(names)} "
                f"checkpoints in {ckpt_dir} (raise train.keep_checkpoints)")
        # the init_state template alone is what restore needs — do NOT
        # also restore the latest first (a wasted full deserialize)
        states = [restore_checkpoint(os.path.join(ckpt_dir, n), state)
                  for n in names]
        inv = 1.0 / len(states)
        params = jax.tree.map(
            lambda *xs: (sum(x.astype(jnp.float32) for x in xs)
                         * inv).astype(xs[-1].dtype),
            *(s.params for s in states))
        state = dataclasses.replace(states[-1], params=params)
        path = f"avg[{','.join(names)}]"
    return cfg, model, state, path


def main(argv=None):
    respect_jax_platforms()  # explicit JAX_PLATFORMS env wins over config pins
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--average-last", type=int, default=1,
                   help="average the parameters of the last N kept "
                        "checkpoints (eval-time checkpoint averaging)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--index", default="dev_index.jsonl",
                   help="index file(s) under --data-dir; comma-separated "
                        "for multi-set eval (e.g. CSJ eval1/eval2/eval3) — "
                        "one model load + shared bucket compiles, per-set "
                        "CER rows")
    p.add_argument("--beam", type=int, default=0, help="beam width (0=greedy)")
    p.add_argument("--lm", default=None, help="ARPA LM for shallow fusion")
    p.add_argument("--lm-alpha", type=float, default=0.5)
    p.add_argument("--lm-beta", type=float, default=1.0)
    p.add_argument("--lm-repr", default="auto",
                   choices=("auto", "dense", "hashed"),
                   help="device LM representation: dense table, sparse "
                        "hashed (scales to order>=4 / large V), or auto "
                        "by table size")
    p.add_argument("--compare", action="store_true",
                   help="score greedy, beam-K and beam-K+LM from ONE "
                        "forward pass and print the three-way CER table "
                        "(the config-4 comparison; requires --beam, LM "
                        "row needs --lm)")
    p.add_argument("--hyp-out", default=None,
                   help="write hypotheses (utt_id<TAB>text, index order) "
                        "from the strongest configured decoder — the bulk "
                        "corpus-transcription surface")
    p.add_argument("--tune-lm", action="store_true",
                   help="grid-search (alpha, beta) fusion weights over "
                        "this set from ONE acoustic forward pass "
                        "(logits kept device-resident; alpha/beta are "
                        "traced so the whole grid costs one beam compile "
                        "per bucket shape). Requires --beam and --lm.")
    p.add_argument("--tune-alphas", default="0.0,0.25,0.5,0.75,1.0")
    p.add_argument("--tune-betas", default="0.0,0.5,1.0,1.5,2.0")
    p.add_argument("--tune-chunk", type=int, default=64,
                   help="batches whose logits stay device-resident at once "
                        "during --tune-lm (bounds HBM residency on large "
                        "dev sets; the acoustic pass still runs ONCE)")
    p.add_argument("--streaming", action="store_true",
                   help="score through the ONLINE recognizer "
                        "(decode/streaming.py) instead of the offline "
                        "forward — the latency-bound quality a deployed "
                        "streaming service would ship; --beam/--lm select "
                        "the streaming decoder; needs a causal-CMVN "
                        "checkpoint")
    p.add_argument("--stream-chunk", type=int, default=64,
                   help="streaming: emitted frames per step (10 ms units)")
    p.add_argument("--stream-right", type=int, default=None,
                   help="streaming: lookahead frames — buffering latency "
                        "= (chunk + right) x 10 ms. Default 16, or 0 for "
                        "chunk-causal attention checkpoints")
    p.add_argument("--stream-batch", type=int, default=16,
                   help="streaming: lockstep streams per compiled step")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="dotted eval-time config overrides on top of the "
                        "frozen training config (bucket shapes, parallel "
                        "axes, ...); model.* is rejected except the "
                        "execution-choice knobs attn_impl / "
                        "attn_residual_dtype / rnn_impl")
    args = p.parse_args(argv)

    overrides = {}
    for kv in args.set:
        key, _, val = kv.partition("=")
        try:
            overrides[key] = json.loads(val)
        except json.JSONDecodeError:
            overrides[key] = val
    cfg, model, state, path = load_model_and_params(args.ckpt_dir,
                                               args.average_last,
                                               overrides=overrides)
    vocab = Vocab.load(os.path.join(args.data_dir, "vocab.txt"))
    if len(vocab) != cfg.model.vocab_size:
        raise SystemExit(
            f"vocab has {len(vocab)} symbols but the checkpoint was trained "
            f"with model.vocab_size={cfg.model.vocab_size} — wrong vocab "
            "file for this checkpoint (decodes would be silently garbled)")
    set_names = [s for s in args.index.split(",") if s]
    if len(set_names) > 1 and args.tune_lm:
        raise SystemExit("--tune-lm tunes on ONE set; pass a single --index")
    if args.tune_lm and args.compare:
        raise SystemExit("--tune-lm and --compare are mutually exclusive "
                         "(tune first, then --compare at the best weights)")
    if args.lm and args.beam <= 0:
        raise SystemExit("--lm requires --beam K (greedy scoring cannot "
                         "apply LM fusion)")
    if args.streaming and (args.compare or args.tune_lm):
        raise SystemExit("--streaming scores one decoder; it combines with "
                         "--beam/--lm but not --compare/--tune-lm")
    if args.stream_right is None:   # model-aware default (stream_geometry
        # rejects lookahead on chunk-causal attention checkpoints)
        args.stream_right = 0 if getattr(cfg.model, "attn_chunk", 0) else 16

    # shard eval over every available device when the static bucket batch
    # sizes split evenly (VERDICT r1 missing #3); else single-device
    n_dev = len(jax.devices())
    mesh = None
    # eval is pure data-parallel on THIS host: drop the frozen training
    # topology entirely (num_devices AND dcn_slices — a 4-slice-trained
    # checkpoint must still evaluate on a 2-chip host, and batch_axes
    # must describe the 1-D eval mesh, not the training mesh)
    cfg = dataclasses.replace(
        cfg, parallel=dataclasses.replace(
            cfg.parallel, num_devices=0, dcn_slices=1))
    if n_dev > 1 and all(bs % n_dev == 0 for bs in cfg.buckets.batch_sizes):
        # all VISIBLE devices, regardless of the training-time mesh size
        mesh = make_mesh(cfg.parallel)
    raw_eval = make_auto_eval(model, cfg, mesh)

    def eval_fn(batch):
        return raw_eval(state.params, batch)

    decode_fn = None
    lm_dense = None
    if args.beam > 0:
        from ..decode.beam import beam_decode
        from ..decode.lm import NGramLM, device_lm
        lm = NGramLM.from_arpa(args.lm, vocab) if args.lm else None
        lm_dense = device_lm(lm, args.lm_repr) if lm else None

        def decode_fn(logits, olens):
            # beam rows split over the mesh when one is active (all chips
            # decode; identical results, B % n guaranteed by eval_batches)
            return beam_decode(logits, olens, beam=args.beam, lm=lm_dense,
                               alpha=args.lm_alpha, beta=args.lm_beta,
                               mesh=mesh, axis=cfg.parallel.batch_axes)

    print(f"checkpoint {path}")
    stream_rec = None                 # built once across --index sets
    for set_name in set_names:
        base = os.path.join(args.data_dir, set_name)
        if set_name.endswith(".pack") or os.path.exists(base + ".pack"):
            # packed binary eval set (preprocess --pack / synth_corpus):
            # same wire format the train CLI consumes, so a packed corpus
            # round-trips train -> evaluate without re-extracting wavs
            from ..data.packed import PackedBatchLoader, PackedCorpus

            prefix = base[: -len(".pack")] if set_name.endswith(".pack") \
                else base
            pv = prefix + ".vocab.txt"
            has_sidecar = os.path.exists(pv)   # checked ONCE for both guards
            if has_sidecar and Vocab.load(pv).symbols != vocab.symbols:
                raise SystemExit(
                    f"{pv} differs from the --data-dir vocab — the pack's "
                    "label ids would mis-score against this checkpoint; "
                    "re-pack the eval set with the training vocab")
            pc = PackedCorpus(prefix)
            if not has_sidecar:
                # legacy pack without a vocab sidecar (pack_corpus now
                # always writes one): bound-check the label ids so an
                # out-of-range encoding fails loudly — a REORDERED vocab
                # of the same size is undetectable here, so say so
                lf = pc.labels_flat
                if lf.size and int(lf.max()) >= len(vocab):
                    raise SystemExit(
                        f"{prefix}.pack labels reach id {int(lf.max())} but "
                        f"the --data-dir vocab has {len(vocab)} symbols — "
                        "the pack was encoded with a different vocab")
                print(f"warning: {prefix}.pack has no .vocab.txt sidecar; "
                      "cannot verify its label ids were encoded with this "
                      "vocab (the loss column is wrong if not; CER is "
                      "unaffected — hypotheses score against stored texts)")
            utts = pc.utterances()
            loader = PackedBatchLoader(pc, cfg.buckets)
            read_sig = pc.signal            # streaming reads from the mmap
        else:
            utts = load_index(base)
            loader = BatchLoader(utts, vocab, cfg.buckets)
            read_sig = None                 # streaming reads the wav files
        sampler = BucketSampler(utts, cfg.buckets, seed=0)
        stem = os.path.splitext(os.path.basename(set_name))[0]
        tag = f"[{stem}] " if len(set_names) > 1 else ""
        hyp_out = args.hyp_out
        if hyp_out and len(set_names) > 1:   # one file per set
            root_, ext_ = os.path.splitext(hyp_out)
            hyp_out = f"{root_}.{stem}{ext_}"

        if sampler.num_dropped and not args.streaming:
            # the streaming path below is bucket-free and scores every
            # utterance, so the drop warning would be wrong there
            print(f"{tag}warning: {sampler.num_dropped}/{len(utts)} utterances "
                  "exceed the bucket boundaries / max_label_len, NOT scored")

        def write_hyps(sink):
            with open(hyp_out, "w", encoding="utf-8") as f:
                for i, text in sorted(sink):
                    f.write(f"{utts[i].utt_id}\t{text}\n")
            print(f"wrote {len(sink)} hypotheses -> {hyp_out}")

        if args.streaming:
            from ..data.corpus import load_signal
            from ..decode.metrics import CERAccumulator
            from ..decode.streaming import decode_lockstep
            from ..utils.wav import read_wav

            S = max(1, args.stream_batch)
            if stream_rec is None:     # ONE recognizer (jit closures)
                from ..decode.streaming import StreamingRecognizer
                stream_rec = StreamingRecognizer(
                    model, state.params, cfg, batch=S,
                    chunk_frames=args.stream_chunk,
                    right_frames=args.stream_right,
                    decoder="beam" if args.beam > 0 else "greedy",
                    beam=args.beam, lm=lm_dense, lm_alpha=args.lm_alpha,
                    lm_beta=args.lm_beta,
                    mesh=mesh if S % n_dev == 0 else None,
                    axis=cfg.parallel.batch_axes)
            rec = stream_rec           # multi-set runs share the compiles
            acc = CERAccumulator()
            sink = [] if hyp_out else None
            # length-sorted lockstep batches via the shared feeder
            # (decode/streaming.py::decode_lockstep — one copy of the
            # lockstep-padding semantics, shared with cli/stream.py)
            order = sorted(range(len(utts)),
                           key=lambda i: utts[i].num_samples)
            read1 = (read_sig if read_sig is not None
                     else lambda i: load_signal(utts[i], read_wav))
            for grp, ids in decode_lockstep(rec, order, read1):
                texts = [vocab.decode(row) for row in ids]
                acc.add_batch(texts, [utts[i].text for i in grp])
                if sink is not None:
                    sink.extend(zip(grp, texts))
            g = rec.geo
            print(f"{tag}CER[streaming] {acc.cer:.4f} | {acc.num_utts} utts "
                  f"| {acc.edits} edits / {acc.ref_len} ref chars | "
                  f"chunk {g['C']} + lookahead {g['R']} frames "
                  f"(~{(g['C'] + g['R']) * 10} ms buffering)"
                  + ("" if g["conv_exact"] else
                     " | note: lookahead < conv right reach "
                     f"({model.conv_right_margin()}) — boundary frames see "
                     "zero-padded conv context"))
            if sink is not None:
                write_hyps(sink)
            continue

        if args.tune_lm:
            if args.beam <= 0 or lm_dense is None:
                raise SystemExit("--tune-lm requires --beam K and --lm")
            from ..decode.beam import beam_decode_stream
            from ..decode.metrics import CERAccumulator
            alphas = [float(x) for x in args.tune_alphas.split(",")]
            betas = [float(x) for x in args.tune_betas.split(",")]
            grid = [(a, b) for a in alphas for b in betas]
            # ONE acoustic forward pass total, CHUNK-major: logits for
            # --tune-chunk batches stay device-resident while every grid
            # point streams over them (pull amortization preserved within
            # a chunk), then the chunk is released — device residency is
            # bounded at chunk_size batches however large the dev set.
            accs = {ab: CERAccumulator() for ab in grid}
            sinks = {ab: [] for ab in grid} if hyp_out else None
            batches = sampler.eval_batches()
            Ch = max(1, args.tune_chunk)
            for c0 in range(0, len(batches), Ch):
                stored = []
                for bid, idxs, n_valid in batches[c0 : c0 + Ch]:
                    batch = loader.load(bid, idxs)
                    _, logits, olens = eval_fn(batch)
                    refs = [utts[int(idxs[i])].text for i in range(n_valid)]
                    stored.append((logits, olens, refs, n_valid, idxs))
                for ab in grid:
                    stream = beam_decode_stream(
                        ((lg, ol) for lg, ol, _, _, _ in stored),
                        beam=args.beam, lm=lm_dense, alpha=ab[0],
                        beta=ab[1], mesh=mesh, axis=cfg.parallel.batch_axes)
                    for (_, _, refs, n_valid, idxs), hyps in zip(stored,
                                                                 stream):
                        texts = [vocab.decode(h) for h in hyps[:n_valid]]
                        accs[ab].add_batch(texts, refs)
                        if sinks is not None:
                            sinks[ab].extend((int(idxs[i]), t)
                                             for i, t in enumerate(texts))
            best = None
            for (a, b) in grid:
                acc = accs[(a, b)]
                print(f"alpha={a:<5g} beta={b:<5g} CER {acc.cer:.4f} "
                      f"({acc.edits} edits)")
                if best is None or acc.cer < best[0]:
                    best = (acc.cer, a, b)
            print(f"best: alpha={best[1]:g} beta={best[2]:g} CER {best[0]:.4f}")
            if sinks is not None:
                write_hyps(sinks[(best[1], best[2])])   # best grid point
            continue

        if args.compare:
            if args.beam <= 0:
                raise SystemExit("--compare requires --beam K")
            from ..decode.beam import beam_decode
            decoders = {
                "greedy": None,
                f"beam{args.beam}": (lambda lg, ol: beam_decode(
                    lg, ol, beam=args.beam, mesh=mesh,
                    axis=cfg.parallel.batch_axes)),
            }
            if lm_dense is not None:
                decoders[f"beam{args.beam}+lm"] = decode_fn
            sink = [] if hyp_out else None
            accs, loss = evaluate_multi(eval_fn, loader, sampler.eval_batches(),
                                        vocab, utts, decoders, sink=sink,
                                        sink_decoder=list(decoders)[-1])
            for name, acc in accs.items():
                print(f"{tag}CER[{name}] {acc.cer:.4f} | {acc.num_utts} utts "
                      f"| {acc.edits} edits / {acc.ref_len} ref chars")
            print(f"{tag}loss {loss:.4f}")
            if sink is not None:
                write_hyps(sink)
            continue

        sink = [] if hyp_out else None
        accs, loss = evaluate_multi(eval_fn, loader, sampler.eval_batches(),
                                    vocab, utts, {"_": decode_fn},
                                    sink=sink, sink_decoder="_")
        acc = accs["_"]
        print(f"{tag}CER {acc.cer:.4f} | loss {loss:.4f} | {acc.num_utts} utts "
              f"| {acc.edits} edits / {acc.ref_len} ref chars")
        if sink is not None:
            write_hyps(sink)


if __name__ == "__main__":
    main()
