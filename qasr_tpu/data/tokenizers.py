"""Tokenizers for BPE-based ASR models.

Equivalent of the reference nemo/collections/common/tokenizers (char, word,
sentencepiece, HuggingFace; SURVEY.md §2.6).  sentencepiece is not in this
image, so the subword path uses the `tokenizers` (HuggingFace) library —
including training a BPE model from manifests, which replaces the
reference's scripts/tokenizers builders — plus self-contained char/word
tokenizers.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence


class TokenizerSpec:
    """Interface: text <-> ids; vocab_size; ids exclude the CTC blank
    (blank = vocab_size, appended by the model like NeMo's BPE CTC)."""

    @property
    def vocab_size(self) -> int:
        raise NotImplementedError

    @property
    def vocab(self) -> List[str]:
        raise NotImplementedError

    def text_to_ids(self, text: str) -> List[int]:
        raise NotImplementedError

    def ids_to_text(self, ids: Sequence[int]) -> str:
        raise NotImplementedError


class CharTokenizer(TokenizerSpec):
    def __init__(self, vocab: Sequence[str]):
        self._vocab = list(vocab)
        self._map = {c: i for i, c in enumerate(self._vocab)}

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    @property
    def vocab(self) -> List[str]:
        return self._vocab

    def text_to_ids(self, text: str) -> List[int]:
        return [self._map[c] for c in text if c in self._map]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return "".join(self._vocab[i] for i in ids)


class WordTokenizer(TokenizerSpec):
    def __init__(self, vocab: Sequence[str], unk: str = "<unk>"):
        self._vocab = list(vocab)
        if unk not in self._vocab:
            self._vocab.append(unk)
        self._map = {w: i for i, w in enumerate(self._vocab)}
        self._unk = self._map[unk]

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    @property
    def vocab(self) -> List[str]:
        return self._vocab

    def text_to_ids(self, text: str) -> List[int]:
        return [self._map.get(w, self._unk) for w in text.split()]

    def ids_to_text(self, ids: Sequence[int]) -> str:
        return " ".join(self._vocab[i] for i in ids)


class BPETokenizer(TokenizerSpec):
    """Subword tokenizer backed by HuggingFace `tokenizers` BPE.

    Word-boundary marker convention follows sentencepiece ('▁' prefix)
    so decoded hypotheses reconstruct spaces, like NeMo's
    SentencePieceTokenizer did for Citrinet (SURVEY.md §2.2 BPE variant).
    """

    def __init__(self, tokenizer_path: str):
        from tokenizers import Tokenizer

        self.path = tokenizer_path  # registered as a .qasr/.nemo artifact
        self.tok = Tokenizer.from_file(tokenizer_path)

    @property
    def vocab_size(self) -> int:
        return self.tok.get_vocab_size()

    @property
    def vocab(self) -> List[str]:
        v = self.tok.get_vocab()
        out = [None] * len(v)
        for tok_str, idx in v.items():
            out[idx] = tok_str
        return out

    def text_to_ids(self, text: str) -> List[int]:
        return self.tok.encode(text).ids

    def ids_to_text(self, ids: Sequence[int]) -> str:
        toks = [self.tok.id_to_token(int(i)) for i in ids]
        text = "".join(t for t in toks if t is not None)
        return text.replace("▁", " ").strip()

    @classmethod
    def train(cls, texts: Sequence[str], vocab_size: int, save_path: str
              ) -> "BPETokenizer":
        """Train a BPE model from transcripts (replaces the reference's
        process_asr_text_tokenizer.py script)."""
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders

        tok = Tokenizer(models.BPE(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
        trainer = trainers.BpeTrainer(vocab_size=vocab_size,
                                      special_tokens=["<unk>"])
        tok.train_from_iterator(texts, trainer)
        tok.save(save_path)
        return cls(save_path)


def tokenizer_from_config(cfg: dict) -> TokenizerSpec:
    """NeMo-style tokenizer config: {'dir'|'model_path', 'type': 'bpe'|...}."""
    t = cfg.get("type", "bpe").lower()
    if t in ("bpe", "wpe", "sentencepiece"):
        path = cfg.get("model_path") or os.path.join(cfg["dir"], "tokenizer.json")
        return BPETokenizer(path)
    if t == "char":
        return CharTokenizer(cfg["vocab"])
    if t == "word":
        return WordTokenizer(cfg["vocab"])
    raise ValueError(f"unknown tokenizer type {t}")
