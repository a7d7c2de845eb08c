"""Manifest/data-prep utilities (the remaining reference scripts/ roles).

Subcommands and the scripts they mirror (all self-contained: stdlib wave
for durations, in-tree stratified split instead of sklearn, no librosa):

  scp             scripts/scp_to_manifest.py:47-79 — kaldi-style scp (one
                  wav path per line) -> manifest with a speaker `label`
                  taken from a path component; --split writes stratified
                  train.json/dev.json (test_size=0.1, seed 42).
  long-audio      scripts/write_long_audio_manifest.py:38-110 — walk a
                  folder of long wavs and emit VAD-inference manifest
                  lines of at most --split_duration seconds, with a
                  --time_length overlap joint between consecutive chunks
                  (offsets step back by the window so frame streams abut).
  speech-commands scripts/process_speech_commands_data.py:79-356 — an
                  extracted Google Speech Commands folder ->
                  train/validation/test manifests; --class_split sub
                  collapses to the 10-word subset + unknown + generated
                  silence slices; --rebalance equalizes train class counts.
  vad-data        scripts/process_vad_data.py:81-270 — speech + background
                  folders -> per-class train/val/test manifests with
                  segment windows (duration_max/stride).

    python -m qasr_tpu.cli.manifest_tools scp --scp wav.scp --id 2 \
        --out manifest.json --split
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

from qasr_tpu.cli.prepare_data import wav_duration  # one shared helper


def _write_manifest(path: str, rows: Sequence[dict]) -> None:
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def stratified_split(labels: Sequence[str], test_size: float, seed: int
                     ) -> Tuple[List[int], List[int]]:
    """Per-label proportional shuffle split (the sklearn
    StratifiedShuffleSplit role, scp_to_manifest.py:71-78)."""
    import random

    rng = random.Random(seed)
    by_label: Dict[str, List[int]] = defaultdict(list)
    for i, lab in enumerate(labels):
        by_label[lab].append(i)
    train_idx: List[int] = []
    test_idx: List[int] = []
    for lab in sorted(by_label):
        idx = by_label[lab][:]
        rng.shuffle(idx)
        n_test = max(1, round(len(idx) * test_size)) if len(idx) > 1 else 0
        test_idx.extend(idx[:n_test])
        train_idx.extend(idx[n_test:])
    return sorted(train_idx), sorted(test_idx)


# ---------------------------------------------------------------------------
# scp


def scp_to_manifest(scp: str, label_id: int, out: str,
                    split: bool = False) -> List[dict]:
    rows: List[dict] = []
    with open(scp) as f:
        for line in f:
            p = line.strip()
            if not p:
                continue
            rows.append({"audio_filepath": p,
                         "duration": float(wav_duration(p)),
                         "label": p.split("/")[label_id]})
    _write_manifest(out, rows)
    if split:
        labels = [r["label"] for r in rows]
        tr, te = stratified_split(labels, test_size=0.1, seed=42)
        d = os.path.dirname(out) or "."
        _write_manifest(os.path.join(d, "train.json"), [rows[i] for i in tr])
        _write_manifest(os.path.join(d, "dev.json"), [rows[i] for i in te])
    return rows


# ---------------------------------------------------------------------------
# long-audio


def chunk_long_audio(path: str, duration: float, split_duration: float,
                     time_length: float, label: str = "infer") -> List[dict]:
    """The write_long_audio_manifest.py:60-102 chunking: after the first
    chunk, each offset steps BACK by `time_length` and the chunk grows by
    the same amount, so the VAD frame windows of consecutive chunks abut
    exactly."""
    rows: List[dict] = []
    left = duration
    current_offset = 0.0
    status = "single"
    while left > 0:
        if left <= split_duration:
            if status == "single":
                write_duration, current_offset = left, 0.0
            else:
                write_duration = left + time_length
                current_offset -= time_length
            offset_inc, left = left, 0.0
        else:
            status = "next" if status in ("start", "next") else "start"
            if status == "start":
                write_duration = offset_inc = split_duration
            else:
                write_duration = split_duration + time_length
                current_offset -= time_length
                offset_inc = split_duration + time_length
            left -= split_duration
        rows.append({"audio_filepath": path, "duration": write_duration,
                     "label": label, "text": "_",
                     "offset": current_offset})
        current_offset += offset_inc
    return rows


def long_audio_manifest(inp_dir: str, out_path: str, split_duration: float,
                        time_length: float = 0.63) -> int:
    rows: List[dict] = []
    for root, _, files in os.walk(inp_dir):
        for name in sorted(files):
            if name.endswith(".wav"):
                p = os.path.join(root, name)
                rows.extend(chunk_long_audio(p, wav_duration(p),
                                             split_duration, time_length))
    _write_manifest(out_path, rows)
    return len(rows)


# ---------------------------------------------------------------------------
# speech-commands

_SC_SUBSET = ["yes", "no", "up", "down", "left", "right", "on", "off",
              "stop", "go"]


def _sc_uid(path: str) -> Optional[str]:
    """speech-commands file id: '<label>/<uid>_<hash>.wav' -> uid (the
    reference regex `(\\w+)/([^_]+)_.+wav`; files without the underscore
    are skipped there too)."""
    name = os.path.basename(path)
    if not name.endswith("wav") or "_" not in name:
        return None
    return name.split("_")[0]


def _read_uid_set(path: str) -> set:
    out = set()
    with open(path) as f:
        for line in f:
            uid = _sc_uid(line.strip())
            if uid:
                out.add(uid)
    return out


def process_speech_commands(data_folder: str, dst_folder: str,
                            class_split: str = "all",
                            rebalance: bool = False,
                            seed: int = 0) -> Dict[str, int]:
    """Extracted speech-commands tree -> {train,validation,test}_manifest
    .json (process_speech_commands_data.py:79-356).  class_split='sub':
    the 10-word subset, everything else 'unknown' (sampled into val/test),
    plus 1-second 'silence' slices cut from _background_noise_."""
    import random

    os.makedirs(dst_folder, exist_ok=True)
    valset = _read_uid_set(os.path.join(data_folder, "validation_list.txt"))
    testset = _read_uid_set(os.path.join(data_folder, "testing_list.txt"))

    label_filepaths: Dict[str, List[Tuple[str, str]]] = defaultdict(list)
    unknown_val, unknown_test = [], []
    train, val, test = [], [], []
    for root, _, files in os.walk(data_folder):
        for name in sorted(files):
            entry = os.path.join(root, name)
            uid = _sc_uid(entry)
            if uid is None:
                continue
            label = os.path.basename(root)
            if label in ("_background_noise_", "silence") \
                    or root == data_folder:
                continue
            if class_split == "sub" and label not in _SC_SUBSET:
                label = "unknown"
                if uid in valset:
                    unknown_val.append((label, entry))
                elif uid in testset:
                    unknown_test.append((label, entry))
            sample = (label, entry)
            if uid not in valset and uid not in testset:
                label_filepaths[label].append(sample)
            if label == "unknown":
                continue
            if uid in valset:
                val.append(sample)
            elif uid in testset:
                test.append(sample)
            else:
                train.append(sample)

    rng = random.Random(seed)
    if class_split == "sub":
        # silence: 1 s slices from _background_noise_ at random gains
        # (process_speech_commands_data.py:176-214; stride 1000 = 62.5 ms)
        import numpy as np

        from qasr_tpu.data.audio import read_wav, write_wav

        silence_dir = os.path.join(data_folder, "silence")
        os.makedirs(silence_dir, exist_ok=True)
        noise_dir = os.path.join(data_folder, "_background_noise_")
        nprng = np.random.RandomState(0)
        silence_files: List[Tuple[str, str]] = []
        sr_expect, stride = 16000, 1000
        if os.path.isdir(noise_dir):
            for name in sorted(os.listdir(noise_dir)):
                if not name.endswith(".wav"):
                    continue
                samples, sr = read_wav(os.path.join(noise_dir, name))
                for i in range(0, len(samples) - sr_expect, stride):
                    out = os.path.join(silence_dir,
                                       f"{name[:-4]}_{i}.wav")
                    write_wav(out, samples[i:i + sr_expect]
                              * nprng.uniform(0.0, 1.0), sr)
                    silence_files.append(("silence", out))
        rng.shuffle(silence_files)
        n = len(silence_files)
        train += silence_files[: int(0.8 * n)]
        val += silence_files[int(0.8 * n): int(0.9 * n)]
        test += silence_files[int(0.9 * n):]
        label_filepaths["silence"] = silence_files[: int(0.8 * n)]
        # unknown: sample into val/test at the mean per-class count
        known_counts = [len(v) for k, v in label_filepaths.items()
                        if k not in ("unknown", "silence")]
        mean_count = (sum(known_counts) // max(len(known_counts), 1)) or 1
        rng.shuffle(unknown_val)
        rng.shuffle(unknown_test)
        val += unknown_val[:max(1, mean_count // 10)]
        test += unknown_test[:max(1, mean_count // 10)]

    if rebalance:
        max_count = max(len(v) for v in label_filepaths.values())
        train = []
        for label in sorted(label_filepaths):
            samples = label_filepaths[label]
            reps = [samples[i % len(samples)] for i in range(max_count)]
            train += reps
    elif class_split == "sub":
        # un-rebalanced sub split still adds the train unknowns at the
        # mean class count
        unknown_train = label_filepaths.get("unknown", [])
        rng.shuffle(unknown_train)
        known_counts = [len(v) for k, v in label_filepaths.items()
                        if k not in ("unknown", "silence")]
        mean_count = (sum(known_counts) // max(len(known_counts), 1)) or 1
        train = [s for s in train if s[0] != "unknown"]
        train += unknown_train[:mean_count]

    counts = {}
    for name, samples in (("train", train), ("validation", val),
                          ("test", test)):
        rows = [{"audio_filepath": p, "duration": float(wav_duration(p)),
                 "command": label} for label, p in samples]
        _write_manifest(os.path.join(dst_folder,
                                     f"{name}_manifest.json"), rows)
        counts[name] = len(rows)
    return counts


# ---------------------------------------------------------------------------
# vad-data


def _segments(duration: float, duration_max: Optional[float],
              stride: float) -> List[Tuple[float, float]]:
    """(offset, duration) windows (process_vad_data.py write_manifest)."""
    if duration_max is None or duration <= duration_max:
        return [(0.0, duration)]
    out = []
    off = 0.0
    while duration - off >= duration_max:
        out.append((off, duration_max))
        off += stride
    return out


def process_vad_data(speech_dir: str, background_dir: str, out_dir: str,
                     test_size: float = 0.1, val_size: float = 0.1,
                     seg_len: float = 0.63, seed: int = 1) -> Dict[str, int]:
    """speech + background wav trees -> balanced_{speech,background}_
    {training,validation,testing}_manifest.json with seg_len windows."""
    import random

    os.makedirs(out_dir, exist_ok=True)
    counts: Dict[str, int] = {}
    for kind, folder in (("speech", speech_dir),
                         ("background", background_dir)):
        files: List[str] = []
        for root, _, names in os.walk(folder):
            if os.path.basename(root) == "_background_noise_" \
                    and kind == "speech":
                continue
            files.extend(os.path.join(root, n) for n in sorted(names)
                         if n.endswith(".wav"))
        rng = random.Random(seed)
        rng.shuffle(files)
        n = len(files)
        n_test = int(n * test_size)
        n_val = int(n * val_size)
        splits = {"testing": files[:n_test],
                  "validation": files[n_test:n_test + n_val],
                  "training": files[n_test + n_val:]}
        for split, split_files in splits.items():
            rows = []
            for p in split_files:
                d = wav_duration(p)
                for off, dur in _segments(d, seg_len, seg_len):
                    rows.append({"audio_filepath": p, "duration": dur,
                                 "offset": off, "label": kind,
                                 "text": "_"})
            name = f"balanced_{kind}_{split}_manifest.json"
            _write_manifest(os.path.join(out_dir, name), rows)
            counts[f"{kind}_{split}"] = len(rows)
    return counts


# ---------------------------------------------------------------------------


def main(argv=None) -> None:
    p = ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("scp")
    sp.add_argument("--scp", required=True)
    sp.add_argument("--id", type=int, required=True,
                    help="'/'-separated path field holding the label")
    sp.add_argument("--out", required=True)
    sp.add_argument("--split", action="store_true")

    la = sub.add_parser("long-audio")
    la.add_argument("--inp_dir", required=True)
    la.add_argument("--out_dir", default=".")
    la.add_argument("--manifest_name", required=True)
    la.add_argument("--split_duration", type=float, required=True)
    la.add_argument("--time_length", type=float, default=0.63)

    sc = sub.add_parser("speech-commands")
    sc.add_argument("--data_folder", required=True,
                    help="extracted speech-commands tree (this image has "
                         "no egress; download/extract out of band)")
    sc.add_argument("--dst_folder", required=True)
    sc.add_argument("--class_split", choices=["all", "sub"], default="all")
    sc.add_argument("--rebalance", action="store_true")

    vd = sub.add_parser("vad-data")
    vd.add_argument("--speech_data_root", required=True)
    vd.add_argument("--background_data_root", required=True)
    vd.add_argument("--out_dir", default="./manifest/")
    vd.add_argument("--test_size", type=float, default=0.1)
    vd.add_argument("--val_size", type=float, default=0.1)
    vd.add_argument("--seg_len", type=float, default=0.63)

    args = p.parse_args(argv)
    if args.cmd == "scp":
        rows = scp_to_manifest(args.scp, args.id, args.out, args.split)
        print(f"wrote {len(rows)} rows to {args.out}")
    elif args.cmd == "long-audio":
        out = os.path.join(args.out_dir, args.manifest_name + ".json")
        n = long_audio_manifest(args.inp_dir, out, args.split_duration,
                                args.time_length)
        print(f"wrote {n} chunks to {out}")
    elif args.cmd == "speech-commands":
        counts = process_speech_commands(args.data_folder, args.dst_folder,
                                         args.class_split, args.rebalance)
        print(json.dumps(counts))
    elif args.cmd == "vad-data":
        counts = process_vad_data(args.speech_data_root,
                                  args.background_data_root, args.out_dir,
                                  args.test_size, args.val_size,
                                  args.seg_len)
        print(json.dumps(counts))


if __name__ == "__main__":
    main()
