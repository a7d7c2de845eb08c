"""Manifest-driven char dataset + XLA-friendly batching.

Equivalent of the reference data layer:
  - JSON-lines manifest parsing      <- parts/manifest.py:34-120
  - ASRAudioText duration filtering  <- parts/collections.py:90-203
  - AudioToCharDataset + collate     <- data/audio_to_text.py:41-291
plus a TPU-specific addition: *bucketed* padding (lengths rounded up to a
bucket grid) so jit recompiles a handful of shapes instead of one per batch.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from qasr_tpu.data.audio import read_audio
from qasr_tpu.data.parsers import CharParser, make_parser


@dataclass
class ManifestEntry:
    audio_file: str
    duration: float
    text: str
    offset: float = 0.0
    speaker: Optional[int] = None


def read_manifest(path: str) -> List[ManifestEntry]:
    """JSON-lines manifest (manifest.py:34-120 key aliases honored)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            audio = d.get("audio_filepath") or d.get("audio_file")
            text = d.get("text")
            if text is None and "text_filepath" in d:
                with open(d["text_filepath"]) as tf:
                    text = tf.read().strip()
            out.append(ManifestEntry(
                audio_file=audio,
                duration=float(d.get("duration", 0.0)),
                text=text or "",
                offset=float(d.get("offset", 0.0) or 0.0),
                speaker=d.get("speaker"),
            ))
    return out


class AudioToCharDataset:
    """Loads (audio, transcript-token) pairs from a manifest
    (audio_to_text.py:41-198 semantics: duration filters, char parser)."""

    def __init__(
        self,
        manifest_filepath: str,
        labels: Sequence[str],
        sample_rate: int = 16000,
        max_duration: Optional[float] = None,
        min_duration: Optional[float] = None,
        max_utts: int = 0,
        trim: bool = False,
        normalize_transcripts: bool = True,
        parser: str = "en",
        augmentor=None,
        pcm16: bool = False,
    ):
        self.labels = list(labels)
        self.sample_rate = sample_rate
        self.trim = trim
        self.augmentor = augmentor
        # pcm16: yield int16 samples (no host float decode); the frozen
        # serving fn scales on-device (ctc_model._pcm_f32).  Serving-path
        # option — augmentors need float, so they force the float decode
        # and an exact re-grid.
        self.pcm16 = pcm16
        self.parser = make_parser(self.labels, parser,
                                  do_normalize=normalize_transcripts)
        entries = []
        for p in manifest_filepath.split(","):
            entries.extend(read_manifest(p))
        kept = []
        for e in entries:
            if max_duration and e.duration > max_duration:
                continue
            if min_duration and e.duration < min_duration:
                continue
            tokens = self.parser(e.text)
            if tokens is None:
                continue
            kept.append((e, tokens))
            if max_utts and len(kept) >= max_utts:
                break
        self.items = kept

    def __len__(self) -> int:
        return len(self.items)

    def batch_plan(self, idx):
        """Single-copy batch-decode plan for the pcm16 serving path:
        [(path, data_offset, n_frames, tokens), ...], or None when any item
        needs the general decoder (augmentor, trim, manifest offset slices,
        resampling, or a non-16-bit-mono file).  The loader then `readinto`s
        each file's data chunk straight into its row of the padded batch
        buffer — one copy total instead of wave-module chunked reads plus a
        pad copy (~5x the host pipeline rate, PERF.md round 3e)."""
        if not self.pcm16 or self.augmentor is not None or self.trim:
            return None
        from qasr_tpu.data.audio import wav_pcm16_info

        plan = []
        for j in idx:
            e, tokens = self.items[j]
            if e.offset:
                return None
            info = wav_pcm16_info(e.audio_file)
            if info is None:
                return None
            n, sr, off = info
            if sr != self.sample_rate:
                return None
            if e.duration:
                n = min(n, int(e.duration * sr))
            plan.append((e.audio_file, off, n, tokens))
        return plan

    def __getitem__(self, i: int):
        e, tokens = self.items[i]
        if self.pcm16 and self.augmentor is None:
            from qasr_tpu.data.audio import read_audio_pcm16

            sig = read_audio_pcm16(e.audio_file, self.sample_rate,
                                   offset=e.offset,
                                   duration=e.duration or None,
                                   trim=self.trim)
            return sig, np.asarray(tokens, np.int32)
        sig = read_audio(e.audio_file, self.sample_rate, offset=e.offset,
                         duration=e.duration or None, trim=self.trim)
        if self.augmentor is not None:
            sig = self.augmentor.perturb(sig, self.sample_rate)
        if self.pcm16:
            from qasr_tpu.data.audio import float_to_pcm16

            sig = float_to_pcm16(sig)
        return sig, np.asarray(tokens, np.int32)


BUCKET_QUANTUM = 16000  # 1 s of 16 kHz audio -> ~100 frames per bucket step


def bucket_pad(signals: Sequence[np.ndarray], quantum: int = BUCKET_QUANTUM
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a list of 1-D signals to a common bucketed length.

    Replaces _speech_collate_fn's pad-to-batch-max (audio_to_text.py:201-240)
    with pad-to-bucket so XLA sees a small, fixed set of shapes.
    """
    lens = np.asarray([len(s) for s in signals], np.int32)
    t = int(max(1, -(-int(lens.max()) // quantum)) * quantum)
    out = np.zeros((len(signals), t), signals[0].dtype)
    for i, s in enumerate(signals):
        out[i, : len(s)] = s
    return out, lens


def collate_batch(batch, quantum: int = BUCKET_QUANTUM):
    """-> (audio (B,T), audio_lens, tokens (B,L), token_lens)."""
    sigs, toks = zip(*batch)
    audio, alens = bucket_pad(sigs, quantum)
    tl = np.asarray([len(t) for t in toks], np.int32)
    lmax = int(max(1, -(-int(tl.max()) // 16)) * 16)
    tokens = np.zeros((len(toks), lmax), np.int32)
    for i, t in enumerate(toks):
        tokens[i, : len(t)] = t
    return audio, alens, tokens, tl


class PrefetchLoader:
    """Background-thread prefetch wrapper around any batch iterable.

    Fills the role of the reference's DALI pipeline (data/audio_to_text_dali.py:
    74-447): overlap host-side decode/augment/collate with device compute.
    On TPU the mel frontend itself is already on-device, so the host work is
    just wav decode + padding — a small thread pool suffices.
    """

    def __init__(self, loader, prefetch: int = 4, num_threads: int = 2):
        self.loader = loader
        self.prefetch = prefetch
        self.num_threads = num_threads

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for item in self.loader:
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


class DataLoader:
    """Minimal host-side loader: batching + optional shard slicing for data
    parallelism (the tarred-dataset 'scatter' strategy's role,
    audio_to_text.py:748-781, done here by index striding)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False,
                 shard_id: int = 0, num_shards: int = 1,
                 quantum: int = BUCKET_QUANTUM, num_workers: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.quantum = quantum
        # num_workers > 1: decode items in a thread pool (wav decode and
        # resampling release the GIL inside numpy/scipy); the reference
        # offloads the same work to torch DataLoader worker processes /
        # DALI (audio_to_text_dali.py:74-447)
        self.num_workers = num_workers

    def __len__(self) -> int:
        n = len(range(self.shard_id, len(self.ds), self.num_shards))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _items(self, idx):
        if self.num_workers <= 1:
            for j in idx:
                yield self.ds[j]
            return
        import itertools
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window = max(self.batch_size, 2 * self.num_workers)
        with ThreadPoolExecutor(self.num_workers) as ex:
            futs: deque = deque()
            it = iter(idx)
            for j in itertools.islice(it, window):
                futs.append(ex.submit(self.ds.__getitem__, j))
            for j in it:
                yield futs.popleft().result()
                futs.append(ex.submit(self.ds.__getitem__, j))
            while futs:
                yield futs.popleft().result()

    def _fast_batch(self, plan, pool):
        """Decode a batch_plan: one readinto per file, each thread writing a
        disjoint row of the (B, T) buffer (single copy, page cache -> batch)."""
        from qasr_tpu.data.audio import read_pcm16_into

        lens = np.asarray([n for _, _, n, _ in plan], np.int32)
        t = int(max(1, -(-int(lens.max()) // self.quantum)) * self.quantum)
        audio = np.empty((len(plan), t), np.int16)

        def fill(i):
            path, off, n, _ = plan[i]
            got = read_pcm16_into(path, off, audio[i, :n])
            audio[i, got:] = 0       # tail padding (+ short-read backstop)

        if pool is None:
            for i in range(len(plan)):
                fill(i)
        else:
            list(pool.map(fill, range(len(plan))))
        toks = [np.asarray(tk, np.int32) for _, _, _, tk in plan]
        tl = np.asarray([len(tk) for tk in toks], np.int32)
        lmax = int(max(1, -(-int(tl.max()) // 16)) * 16)
        tokens = np.zeros((len(toks), lmax), np.int32)
        for i, tk in enumerate(toks):
            tokens[i, : len(tk)] = tk
        return audio, lens, tokens, tl

    def __iter__(self) -> Iterator:
        idx = list(range(self.shard_id, len(self.ds), self.num_shards))
        if self.shuffle:
            rng = np.random.default_rng(self.seed)
            rng.shuffle(idx)

        # pcm16 single-copy fast path: per chunk, decode straight into the
        # padded batch buffer (falls back per chunk when a plan is refused)
        first_plan = (self.ds.batch_plan(idx[: self.batch_size])
                      if hasattr(self.ds, "batch_plan") else None)
        if first_plan is not None:
            from concurrent.futures import ThreadPoolExecutor

            pool = (ThreadPoolExecutor(self.num_workers)
                    if self.num_workers > 1 else None)
            try:
                for i in range(0, len(idx), self.batch_size):
                    chunk = idx[i:i + self.batch_size]
                    if self.drop_last and len(chunk) < self.batch_size:
                        return
                    # chunk 0 IS the probe chunk — reuse its plan instead of
                    # re-scanning every file's RIFF header
                    plan = first_plan if i == 0 else self.ds.batch_plan(chunk)
                    if plan is not None:
                        yield self._fast_batch(plan, pool)
                    elif pool is not None:
                        yield collate_batch(
                            list(pool.map(self.ds.__getitem__, chunk)),
                            self.quantum)
                    else:
                        yield collate_batch(
                            [self.ds[j] for j in chunk], self.quantum)
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)
            return

        items = self._items(idx)
        import itertools
        for i in range(0, len(idx), self.batch_size):
            chunk = list(itertools.islice(items, self.batch_size))
            if not chunk or (self.drop_last and len(chunk) < self.batch_size):
                return
            yield collate_batch(chunk, self.quantum)
