"""Corpus indexing: CSJ-style (wav + transcript) directory → utterance index
(SURVEY.md §2.2 "Corpus reader"; configs 1,5 of BASELINE.json).

Layout accepted: a root directory containing ``*.wav`` files (anywhere below
root) with a sibling ``*.txt`` transcript of the same stem. The index is a
JSONL file (one utterance per line: id, wav path, transcript, num_samples)
written by ``cli/preprocess.py`` so training never re-walks the corpus.
"""

from __future__ import annotations

import dataclasses
import json
import os
import wave
from dataclasses import dataclass

from .. import constants as C
from ..vocab import Vocab


@dataclass(frozen=True)
class Utterance:
    utt_id: str
    wav: str
    text: str
    num_samples: int
    feat: str | None = None     # optional cached-feature .npy (SURVEY §2.1)

    @property
    def num_frames(self) -> int:
        return C.num_frames(self.num_samples)


def scan_corpus(root: str) -> list[Utterance]:
    """Walk root, pair each wav with its transcript, read lengths."""
    utts = []
    for dirpath, _, files in sorted(os.walk(root)):
        for fn in sorted(files):
            if not fn.endswith(".wav"):
                continue
            wav_path = os.path.join(dirpath, fn)
            txt_path = wav_path[:-4] + ".txt"
            if not os.path.exists(txt_path):
                continue
            with open(txt_path, encoding="utf-8") as f:
                text = f.read().strip()
            with wave.open(wav_path, "rb") as w:
                n = w.getnframes()
            utt_id = os.path.relpath(wav_path, root)[:-4].replace(os.sep, "/")
            utts.append(Utterance(utt_id, wav_path, text, n))
    return utts


def scan_kaldi_style(root: str) -> list[Utterance]:
    """Read a Kaldi-style corpus dir: ``wav.scp`` (utt_id → wav path) +
    ``text`` (utt_id → transcript). The common interchange format for CSJ
    and other licensed corpora (whose own distribution formats vary);
    utterances present in both files are indexed, order = sorted utt_id."""
    wavs: dict[str, str] = {}
    with open(os.path.join(root, "wav.scp"), encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                wavs[parts[0]] = parts[1]
    texts: dict[str, str] = {}
    with open(os.path.join(root, "text"), encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                texts[parts[0]] = parts[1]
    utts = []
    for utt_id in sorted(wavs.keys() & texts.keys()):
        wav_path = wavs[utt_id]
        if not os.path.isabs(wav_path):
            wav_path = os.path.join(root, wav_path)
        with wave.open(wav_path, "rb") as w:
            # index frame counts at the CONTRACT rate so bucketing is
            # correct even for to-be-resampled inputs (utils/wav.py)
            n = int(w.getnframes() * C.SAMPLE_RATE / w.getframerate())
        utts.append(Utterance(utt_id, wav_path, texts[utt_id], n))
    return utts


def save_index(path: str, utts: list[Utterance]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for u in utts:
            f.write(json.dumps(dataclasses.asdict(u), ensure_ascii=False) + "\n")


def load_index(path: str) -> list[Utterance]:
    utts = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                utts.append(Utterance(**json.loads(line)))
    return utts


def build_vocab(utts: list[Utterance], unit="char") -> Vocab:
    return Vocab.build([u.text for u in utts], unit=unit)
