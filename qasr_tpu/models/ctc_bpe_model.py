"""BPE-vocabulary CTC model (EncDecCTCModelBPE / Citrinet path).

Equivalent of the reference models/ctc_bpe_models.py + AudioToBPEDataset
(data/audio_to_text.py:447-520): same encoder/decoder/quantization machinery
as the char model, but the label space is a subword tokenizer's vocab and
hypothesis text is reconstructed through the tokenizer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from qasr_tpu.data.tokenizers import TokenizerSpec
from qasr_tpu.decode.ctc import ctc_collapse
from qasr_tpu.models.config import DecoderConfig, EncoderConfig, ModelConfig
from qasr_tpu.models.ctc_model import ASRModel


class EncDecCTCModelBPE(ASRModel):
    """ASRModel whose vocabulary comes from a subword tokenizer."""

    tokenizer: TokenizerSpec = None

    @classmethod
    def from_config_and_tokenizer(cls, cfg: ModelConfig, tokenizer: TokenizerSpec,
                                  seed: int = 0) -> "EncDecCTCModelBPE":
        import dataclasses as dc

        vocab = tuple(tokenizer.vocab)
        dec = dc.replace(cfg.decoder, num_classes=len(vocab), vocabulary=vocab)
        cfg = dc.replace(cfg, decoder=dec, labels=vocab)
        # persist the tokenizer as a packed artifact so save_to/restore_from
        # round-trips it (modelPT.py:254-296 artifact registry)
        if hasattr(tokenizer, "path"):
            cfg = dc.replace(cfg, tokenizer={"type": "bpe",
                                             "model_path": "tokenizer.json"})
        model = super().from_config(cfg, seed=seed)
        model.__class__ = cls
        model.tokenizer = tokenizer
        if hasattr(tokenizer, "path"):
            model.register_artifact("tokenizer.json", tokenizer.path)
        return model

    def decode_hypotheses(self, predictions: np.ndarray,
                          lengths: Optional[np.ndarray] = None) -> List[str]:
        """CTC-collapse token ids, then detokenize through the BPE model."""
        hyps = []
        blank = self.blank_id
        for i in range(predictions.shape[0]):
            seq = predictions[i]
            if lengths is not None:
                seq = seq[: int(lengths[i])]
            ids, prev = [], blank
            for p in seq:
                p = int(p)
                if (p != prev or prev == blank) and p != blank:
                    ids.append(p)
                prev = p
            hyps.append(self.tokenizer.ids_to_text(ids))
        return hyps

    def transcribe(self, paths2audio_files: List[str], batch_size: int = 4,
                   logprobs: bool = False) -> List[str]:
        from qasr_tpu.data.audio import read_audio
        from qasr_tpu.data.dataset import bucket_pad

        hyps: List[str] = []
        for i in range(0, len(paths2audio_files), batch_size):
            chunk = paths2audio_files[i : i + batch_size]
            sigs = [read_audio(p, self.cfg.sample_rate) for p in chunk]
            audio, lens = bucket_pad(sigs)
            lp, el, preds = self.forward(audio, lens)
            if logprobs:
                hyps.extend(lp[j, : int(el[j])] for j in range(len(chunk)))
            else:
                hyps.extend(self.decode_hypotheses(preds, el))
        return hyps


class AudioToBPEDataset:
    """Manifest dataset tokenized with a subword tokenizer
    (audio_to_text.py:447-520)."""

    def __init__(self, manifest_filepath: str, tokenizer: TokenizerSpec,
                 sample_rate: int = 16000, max_duration: Optional[float] = None,
                 min_duration: Optional[float] = None, trim: bool = False,
                 augmentor=None):
        from qasr_tpu.data.dataset import read_manifest

        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.trim = trim
        self.augmentor = augmentor
        entries = []
        for p in manifest_filepath.split(","):
            entries.extend(read_manifest(p))
        kept = []
        for e in entries:
            if max_duration and e.duration > max_duration:
                continue
            if min_duration and e.duration < min_duration:
                continue
            ids = tokenizer.text_to_ids(e.text)
            if not ids:
                continue
            kept.append((e, ids))
        self.items = kept

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        from qasr_tpu.data.audio import read_audio

        e, ids = self.items[i]
        sig = read_audio(e.audio_file, self.sample_rate, offset=e.offset,
                         duration=e.duration or None, trim=self.trim)
        if self.augmentor is not None:
            sig = self.augmentor.perturb(sig, self.sample_rate)
        return sig, np.asarray(ids, np.int32)
