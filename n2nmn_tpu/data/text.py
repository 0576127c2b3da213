"""Question/answer text handling.

The tokenization and vocab-lookup SEMANTICS here are a format contract
with the shipped vocabulary files (vocabulary_clevr.txt etc. index by
exactly these tokens) and with the reference's data preparation
(util/text_processing.py:3-35 describes the same contract):

  * a sentence is lowercased and segmented into maximal runs of word
    characters; runs of punctuation between words survive as their own
    tokens (whitespace-trimmed), so "what's" -> ["what", "'", "s"];
  * vocabulary lookup falls back to "<unk>" when the vocab defines one,
    and is an error otherwise.

The contract is pinned by golden cases in tests/test_data.py
(test_tokenize_contract / test_vocab_contract) rather than by sharing
any code shape with the reference.
"""

from __future__ import annotations

import re

# maximal word runs / non-word runs, in order of appearance
_RUNS = re.compile(r"\w+|\W+")


def tokenize(sentence: str) -> list[str]:
    out = []
    for match in _RUNS.finditer(sentence.lower()):
        token = match.group().strip()
        if token:
            out.append(token)
    return out


def load_str_list(fname: str) -> list[str]:
    with open(fname) as f:
        return [line.strip() for line in f]


class VocabDict:
    """Bidirectional word<->index map over a one-word-per-line vocab
    file, with <unk> fallback when (and only when) the file defines
    an "<unk>" entry."""

    UNK = "<unk>"

    def __init__(self, vocab_file: str):
        self.word_list = load_str_list(vocab_file)
        self._index = {w: i for i, w in enumerate(self.word_list)}
        self.UNK_idx = self._index.get(self.UNK)

    @property
    def num_vocab(self) -> int:
        return len(self.word_list)

    def __len__(self) -> int:
        return len(self.word_list)

    def __contains__(self, word: str) -> bool:
        return word in self._index

    def idx2word(self, idx: int) -> str:
        return self.word_list[idx]

    def word2idx(self, word: str) -> int:
        idx = self._index.get(word, self.UNK_idx)
        if idx is None:
            raise ValueError(
                f"word {word!r} not in dictionary, and the dictionary "
                f"defines no {self.UNK} fallback")
        return idx

    def tokenize_and_index(self, sentence: str) -> list[int]:
        return [self.word2idx(w) for w in tokenize(sentence)]
