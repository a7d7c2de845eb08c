"""Speech-label dataset for classification / speaker / VAD tasks.

Equivalent of the reference AudioToSpeechLabelDataSet
(/root/reference/nemo/collections/asr/data/audio_to_label.py:26-210):
JSON-lines manifest {"audio_filepath", "duration", "label"|"command",
"offset"} -> (signal, label_id) samples, with duration filters,
fixed-length slicing for speaker/VAD training (time_length), and a
sliding-window mode for VAD inference (shift_length).
"""
from __future__ import annotations

import json
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class AudioToSpeechLabelDataset:
    def __init__(self, manifest_filepath: str, labels: Sequence[str],
                 sample_rate: int = 16000, min_duration: Optional[float] = 0.1,
                 max_duration: Optional[float] = None, trim: bool = False,
                 time_length: Optional[float] = None,
                 shift_length: Optional[float] = None,
                 augmentor=None, keep_unknown_labels: bool = False):
        # keep_unknown_labels: inference manifests often carry dummy labels
        # (e.g. the VAD convention "infer"); keep those rows with label -1
        # instead of silently dropping them
        self.labels = list(labels)
        self.label2id = {l: i for i, l in enumerate(self.labels)}
        self.sample_rate = sample_rate
        self.trim = trim
        self.time_length = time_length
        self.shift_length = shift_length
        self.augmentor = augmentor
        self.items: List[dict] = []
        for p in manifest_filepath.split(","):
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    d = json.loads(line)
                    dur = float(d.get("duration", 0.0))
                    if min_duration and dur < min_duration:
                        continue
                    if max_duration and dur > max_duration:
                        continue
                    label = d.get("label", d.get("command"))
                    lid = self.label2id.get(str(label), -1)
                    if lid < 0 and not keep_unknown_labels:
                        continue
                    self.items.append({
                        "audio_file": d.get("audio_filepath") or d["audio_file"],
                        "offset": float(d.get("offset", 0.0)),
                        "duration": dur,
                        "label": lid,
                    })

    def __len__(self) -> int:
        return len(self.items)

    def _signal(self, item) -> np.ndarray:
        from qasr_tpu.data.audio import read_audio

        sig = read_audio(item["audio_file"], self.sample_rate,
                         offset=item["offset"],
                         duration=item["duration"] or None, trim=self.trim)
        if self.augmentor is not None:
            sig = self.augmentor.perturb(sig, self.sample_rate)
        if self.time_length:
            # fixed-length slice (speaker/VAD training): center-crop or
            # repeat-pad to exactly time_length seconds
            n = int(self.time_length * self.sample_rate)
            if len(sig) >= n:
                start = (len(sig) - n) // 2
                sig = sig[start : start + n]
            else:
                reps = -(-n // max(len(sig), 1))
                sig = np.tile(sig, reps)[:n]
        return np.asarray(sig, np.float32)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        item = self.items[i]
        return self._signal(item), item["label"]

    def vad_windows(self, i: int) -> Iterator[Tuple[np.ndarray, int]]:
        """Sliding windows over one utterance for VAD inference
        (shift_length semantics, audio_to_label.py docstring)."""
        assert self.time_length and self.shift_length
        item = self.items[i]
        from qasr_tpu.data.audio import read_audio

        sig = read_audio(item["audio_file"], self.sample_rate,
                         offset=item["offset"],
                         duration=item["duration"] or None, trim=self.trim)
        n = int(self.time_length * self.sample_rate)
        step = int(self.shift_length * self.sample_rate)
        if len(sig) < n:
            reps = -(-n // max(len(sig), 1))
            sig = np.tile(sig, reps)[:n]
        for start in range(0, max(len(sig) - n, 0) + 1, step):
            yield np.asarray(sig[start : start + n], np.float32), item["label"]

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0):
        """(audio (B, Lmax), lens (B,), labels (B,)) batches, padded."""
        order = np.arange(len(self.items))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, len(order), batch_size):
            sel = order[i : i + batch_size]
            sigs = [self[j][0] for j in sel]
            labels = np.asarray([self.items[j]["label"] for j in sel], np.int32)
            lmax = max(len(s) for s in sigs)
            audio = np.zeros((len(sigs), lmax), np.float32)
            lens = np.zeros((len(sigs),), np.int32)
            for k, s in enumerate(sigs):
                audio[k, : len(s)] = s
                lens[k] = len(s)
            yield audio, lens, labels
