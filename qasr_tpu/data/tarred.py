"""Tarred (sharded) audio datasets.

Equivalent of the reference's webdataset-based TarredAudioToCharDataset
(data/audio_to_text.py:607-1130) and the tarred-dataset converter script:
audio lives in N tar shards, transcripts in a JSON-lines manifest keyed by
file name; shards are distributed across workers with the 'scatter'
(partition) or 'replicate' strategy (audio_to_text.py:748-781).
Implemented with stdlib tarfile — no webdataset dependency.
"""
from __future__ import annotations

import io
import json
import os
import tarfile
import wave
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from qasr_tpu.data.dataset import ManifestEntry, read_manifest
from qasr_tpu.data.parsers import make_parser


def decode_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError("tarred shards store 16-bit wav")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def create_tarred_dataset(manifest_path: str, out_dir: str, num_shards: int = 2
                          ) -> Tuple[List[str], str]:
    """Pack a manifest's wav files into shards (converter-script equivalent).
    Returns (shard paths, tarred manifest path)."""
    os.makedirs(out_dir, exist_ok=True)
    entries = read_manifest(manifest_path)
    shard_paths = [os.path.join(out_dir, f"audio_{i}.tar") for i in range(num_shards)]
    tars = [tarfile.open(p, "w") for p in shard_paths]
    man_out = os.path.join(out_dir, "tarred_audio_manifest.json")
    with open(man_out, "w") as mf:
        for i, e in enumerate(entries):
            key = os.path.basename(e.audio_file)
            tars[i % num_shards].add(e.audio_file, arcname=key)
            mf.write(json.dumps({"audio_filepath": key, "duration": e.duration,
                                 "text": e.text, "shard_id": i % num_shards}) + "\n")
    for t in tars:
        t.close()
    return shard_paths, man_out


class TarredAudioToCharDataset:
    """Iterable over (signal, token_ids) read from tar shards.

    shard_strategy 'scatter': shards partitioned over `world_size` workers
    (this worker reads shards[global_rank::world_size]); 'replicate': every
    worker reads every shard (audio_to_text.py:748-781 semantics).
    """

    def __init__(self, audio_tar_filepaths: Sequence[str], manifest_filepath: str,
                 labels: Sequence[str], sample_rate: int = 16000,
                 shard_strategy: str = "scatter", global_rank: int = 0,
                 world_size: int = 1, parser: str = "en",
                 normalize_transcripts: bool = True, shuffle_n: int = 0,
                 max_duration: Optional[float] = None,
                 min_duration: Optional[float] = None, seed: int = 0):
        self.sample_rate = sample_rate
        self.parser = make_parser(list(labels), parser,
                                  do_normalize=normalize_transcripts)
        self.text_by_key: Dict[str, List[int]] = {}
        for e in read_manifest(manifest_filepath):
            if max_duration and e.duration > max_duration:
                continue
            if min_duration and e.duration < min_duration:
                continue
            toks = self.parser(e.text)
            if toks is None:
                continue
            self.text_by_key[os.path.basename(e.audio_file)] = toks
        paths = list(audio_tar_filepaths)
        if shard_strategy == "scatter":
            if len(paths) % world_size != 0:
                raise ValueError(
                    f"scatter needs shards ({len(paths)}) divisible by "
                    f"world_size ({world_size})")
            paths = paths[global_rank::world_size]
        elif shard_strategy != "replicate":
            raise ValueError(f"invalid shard strategy: {shard_strategy}")
        self.paths = paths
        self.shuffle_n = shuffle_n
        self.seed = seed

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        from qasr_tpu.data.audio import resample

        buf: List[Tuple[np.ndarray, np.ndarray]] = []
        rng = np.random.default_rng(self.seed)

        def emit():
            while buf:
                idx = rng.integers(len(buf)) if self.shuffle_n else 0
                yield buf.pop(int(idx))

        for path in self.paths:
            with tarfile.open(path) as tar:
                for member in tar:
                    key = os.path.basename(member.name)
                    if key not in self.text_by_key:
                        continue
                    data = tar.extractfile(member).read()
                    sig, sr = decode_wav_bytes(data)
                    sig = resample(sig, sr, self.sample_rate)
                    item = (sig, np.asarray(self.text_by_key[key], np.int32))
                    if self.shuffle_n:
                        buf.append(item)
                        if len(buf) >= self.shuffle_n:
                            yield buf.pop(int(rng.integers(len(buf))))
                    else:
                        yield item
        yield from emit()

    def batches(self, batch_size: int):
        """Collate into padded batches like DataLoader."""
        from qasr_tpu.data.dataset import collate_batch

        chunk = []
        for item in self:
            chunk.append(item)
            if len(chunk) == batch_size:
                yield collate_batch(chunk)
                chunk = []
        if chunk:
            yield collate_batch(chunk)
