"""Decode CLI: checkpoint + wav file(s) → text (SURVEY.md §3.5).

Greedy by default; ``--beam K`` switches to prefix beam search, and
``--lm``/``--lm-alpha``/``--lm-beta`` enable n-gram LM shallow fusion
(config 4, BASELINE.json:10).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..decode.greedy import greedy_decode
from ..frontend import select_frontend
from ..utils.wav import read_wav
from ..vocab import Vocab
from .evaluate import load_model_and_params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--vocab", required=True, help="vocab.txt path")
    p.add_argument("--beam", type=int, default=0,
                   help="beam width (0 = greedy)")
    p.add_argument("--lm", default=None, help="ARPA n-gram LM for fusion")
    p.add_argument("--lm-alpha", type=float, default=0.5)
    p.add_argument("--lm-beta", type=float, default=1.0)
    p.add_argument("--lm-repr", default="auto",
                   choices=("auto", "dense", "hashed"),
                   help="device LM representation: dense table, sparse "
                        "hashed (scales to order>=4 / large V), or auto "
                        "by table size")
    p.add_argument("--nbest", type=int, default=1,
                   help="with --beam: print the top-N hypotheses per wav "
                        "(tab-separated: path, rank, log-score, text)")
    p.add_argument("wavs", nargs="+")
    args = p.parse_args(argv)

    # --nbest only has meaning on the beam path (ADVICE r2): fail loudly
    # instead of silently printing greedy 1-best
    if args.nbest > 1 and args.beam <= 0:
        raise SystemExit("--nbest requires --beam K")
    if args.beam > 0 and args.nbest > args.beam:
        print(f"warning: --nbest {args.nbest} clamped to beam width "
              f"{args.beam}")

    cfg, model, state, _ = load_model_and_params(args.ckpt_dir)
    vocab = Vocab.load(args.vocab)

    sigs = [read_wav(w) for w in args.wavs]
    n_max = max(len(s) for s in sigs)
    B = len(sigs)
    signals = np.zeros((B, n_max), np.float32)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(sigs):
        signals[i, : len(s)] = s
        lens[i] = len(s)

    # same front-end implementation the checkpoint was trained with
    feats, flens = select_frontend(cfg.features)(
        jnp.asarray(signals), jnp.asarray(lens), apply_cmvn=cfg.features.cmvn)
    logits, olens = model.apply(state.params, feats, flens)

    if args.beam > 0:
        from ..decode.beam import beam_decode, beam_decode_nbest
        from ..decode.lm import NGramLM, device_lm
        lm = NGramLM.from_arpa(args.lm, vocab) if args.lm else None
        lm = device_lm(lm, args.lm_repr) if lm else None
        if args.nbest > 1:
            n = min(args.nbest, args.beam)
            pfx, plen, scores = beam_decode_nbest(
                logits, olens, beam=args.beam, lm=lm,
                alpha=args.lm_alpha, beta=args.lm_beta)
            for i, w in enumerate(args.wavs):
                for k in range(n):
                    text = vocab.decode(pfx[i, k, : plen[i, k]])
                    print(f"{w}\t{k + 1}\t{scores[i, k]:.3f}\t{text}")
        else:
            hyps = beam_decode(logits, olens, beam=args.beam, lm=lm,
                               alpha=args.lm_alpha, beta=args.lm_beta)
            for w, h in zip(args.wavs, hyps):
                print(f"{w}\t{vocab.decode(h)}")
    else:
        ids, out_lens = greedy_decode(logits, olens)
        ids, out_lens = np.asarray(ids), np.asarray(out_lens)
        for i, w in enumerate(args.wavs):
            print(f"{w}\t{vocab.decode(ids[i, : out_lens[i]])}")


if __name__ == "__main__":
    main()
