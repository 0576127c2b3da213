"""Text utilities (reference util/text_processing.py)."""

from __future__ import annotations

import re

_SENTENCE_SPLIT_REGEX = re.compile(r"(\W+)")


def tokenize(sentence):
    """Split on non-word characters and lowercase
    (reference util/text_processing.py:3-7)."""
    tokens = _SENTENCE_SPLIT_REGEX.split(sentence.lower())
    return [t.strip() for t in tokens if len(t.strip()) > 0]


def load_str_list(fname):
    with open(fname) as f:
        return [line.strip() for line in f]


class VocabDict:
    """Vocabulary with <unk> fallback (reference text_processing.py:15-35)."""

    def __init__(self, vocab_file):
        self.word_list = load_str_list(vocab_file)
        self.word2idx_dict = {w: i for i, w in enumerate(self.word_list)}
        self.num_vocab = len(self.word_list)
        self.UNK_idx = (self.word2idx_dict["<unk>"]
                        if "<unk>" in self.word2idx_dict else None)

    def idx2word(self, idx):
        return self.word_list[idx]

    def word2idx(self, w):
        if w in self.word2idx_dict:
            return self.word2idx_dict[w]
        if self.UNK_idx is not None:
            return self.UNK_idx
        raise ValueError(
            f"word {w} not in dictionary (while dictionary does not contain "
            "<unk>)")

    def tokenize_and_index(self, sentence):
        return [self.word2idx(w) for w in tokenize(sentence)]
