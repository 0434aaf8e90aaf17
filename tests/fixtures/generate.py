"""Regenerate the frozen parity fixtures (tests/fixtures/golden.npz).

The in-repo NumPy goldens (frontend/golden_np.py, ops/ctc_numpy.py) are the
executable parity spec (SURVEY.md §2.1/§2.4: the reference mount was empty,
so the spec cannot be re-derived later). This file freezes their OUTPUTS for
a pinned input set so a refactor of the golden code cannot silently move
the spec itself (VERDICT.md r1 "What's missing" #4): changing golden output
fails tests/test_fixtures.py until this script is deliberately re-run.

Run from the repo root:  python tests/fixtures/generate.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from chainer_speech_recognition_tpu.data.synthetic import make_utterance  # noqa: E402
from chainer_speech_recognition_tpu.frontend.golden_np import features  # noqa: E402
from chainer_speech_recognition_tpu.ops.ctc_numpy import ctc_loss_batch_np  # noqa: E402


def build() -> dict:
    out = {}
    rng = np.random.default_rng(20260816)

    # --- front-end: three deterministic signals of different character ---
    tones, _ = make_utterance(rng, [1, 4, 2, 7], tone_len=1600, noise=0.05)
    noise = rng.standard_normal(5000).astype(np.float32) * 0.3
    ramp = (np.linspace(-0.9, 0.9, 3210).astype(np.float32)
            * np.sin(np.arange(3210, dtype=np.float32) * 0.21))
    for name, sig in (("tones", tones), ("noise", noise), ("ramp", ramp)):
        out[f"sig_{name}"] = sig
        out[f"feat_{name}"] = features(sig, apply_cmvn=True)
        out[f"feat_nocmvn_{name}"] = features(sig, apply_cmvn=False)

    # --- CTC: losses + input grads on a pinned random batch --------------
    B, T, V, L = 4, 20, 8, 6
    logits = (rng.standard_normal((B, T, V)) * 2).astype(np.float32)
    t_len = np.asarray([20, 14, 9, 20])
    labels = rng.integers(1, V, (B, L)).astype(np.int32)
    lab_len = np.asarray([6, 4, 0, 3])
    loss, grad = ctc_loss_batch_np(logits, t_len, labels, lab_len)
    out.update(ctc_logits=logits, ctc_t_len=t_len, ctc_labels=labels,
               ctc_lab_len=lab_len, ctc_loss=loss, ctc_grad=grad)
    return out


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "golden.npz")
    np.savez_compressed(path, **build())
    print(f"wrote {path}")
