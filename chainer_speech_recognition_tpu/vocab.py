"""Vocabulary + tokenizer with the frozen CTC label conventions.

Reference behavior (SURVEY.md §2.2): Japanese kana/mora units mapped to integer
ids with id 0 reserved for the CTC blank (Chainer ``blank_symbol=0``). Here the
tokenizer is character-level (each unicode char = one unit, which for kana
transcripts equals the mora-ish unit set) and the conventions are enforced in
one place:

* id 0 == ``<blank>`` — never produced by ``encode``.
* real symbols get ids 1..V-1 in first-seen or sorted order.
* vocab file format: one symbol per line, line number == id, line 0 is the
  literal string ``<blank>``.
"""

from __future__ import annotations

from .constants import BLANK_ID

BLANK_SYMBOL = "<blank>"
UNK_SYMBOL = "<unk>"


class Vocab:
    def __init__(self, symbols: list[str]):
        if not symbols or symbols[0] != BLANK_SYMBOL:
            raise ValueError("vocab line 0 must be <blank>")
        if len(set(symbols)) != len(symbols):
            raise ValueError("duplicate symbols in vocab")
        self.symbols = list(symbols)
        self._to_id = {s: i for i, s in enumerate(symbols)}
        self.unk_id = self._to_id.get(UNK_SYMBOL)

    # -- construction ------------------------------------------------------
    @classmethod
    def build(cls, texts, add_unk: bool = True) -> "Vocab":
        """Build from an iterable of transcript strings (sorted char units)."""
        units = sorted({ch for t in texts for ch in t})
        symbols = [BLANK_SYMBOL] + ([UNK_SYMBOL] if add_unk else []) + units
        return cls(symbols)

    @classmethod
    def load(cls, path) -> "Vocab":
        with open(path, encoding="utf-8") as f:
            return cls([line.rstrip("\n") for line in f if line != "\n"])

    def save(self, path) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(self.symbols) + "\n")

    # -- codec -------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.symbols)

    def encode(self, text: str) -> list[int]:
        if self.unk_id is not None:
            ids = [self._to_id.get(ch, self.unk_id) for ch in text]
        else:
            ids = [self._to_id[ch] for ch in text]
        assert BLANK_ID not in ids, "blank id must never appear in labels"
        return ids

    def decode(self, ids) -> str:
        """ids → string, skipping blank/pad; used after CTC collapse."""
        out = []
        for i in ids:
            i = int(i)
            if i == BLANK_ID or i < 0:
                continue
            out.append(self.symbols[i])
        return "".join(out)
