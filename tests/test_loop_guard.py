"""Train-loop guard: an all-filtered corpus must fail fast, not spin."""

import numpy as np
import pytest

from chainer_speech_recognition_tpu.config import preset_config
from chainer_speech_recognition_tpu.data.corpus import Utterance
from chainer_speech_recognition_tpu.train.loop import train
from chainer_speech_recognition_tpu.vocab import Vocab


def test_untrainable_corpus_raises(tmp_path):
    # one utterance, longer than every bucket boundary
    utts = [Utterance("u0", "/nonexistent.wav", "あい", 10_000_000)]
    vocab = Vocab.build(["あい"])
    cfg = preset_config("tiny_conv").override({
        "model.vocab_size": len(vocab),
        "train.checkpoint_dir": str(tmp_path / "ck")})
    with pytest.raises(ValueError, match="no trainable batches"):
        train(cfg, utts, vocab, resume=False)
