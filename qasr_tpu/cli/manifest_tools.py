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
  an4             scripts/process_an4_data.py:30-91 — extracted AN4 tree ->
                  train/test manifests; .sph decoded in-tree
                  (data/sphere.py) instead of shelling to sox.
  hub5            scripts/process_hub5_data.py:75-210 — LDC HUB5 tree ->
                  per-speaker >=min_slice_duration segments +
                  manifest_hub5.json (stm scrub, channel select, in-tree
                  sph decode instead of sph2pipe).
  commonvoice     scripts/get_commonvoice_data.py:81-111 — one split .tsv
                  -> resampled mono wavs + manifest (clips pre-converted
                  to wav out of band: no mp3 codec in this image).
  rir             scripts/get_openslr_rir.py:47-99 — extracted RIRS_NOISES
                  tree: split multi-channel real RIRs per channel, move
                  simulated RIRs, write rir.json.

    python -m qasr_tpu.cli.manifest_tools scp --scp wav.scp --id 2 \
        --out manifest.json --split
"""
from __future__ import annotations

import json
import math
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
# corpus getters (the download steps are network-bound and happen out of
# band in this image; everything after the download is reproduced here)


def _convert_sph_tree(root: str) -> int:
    """Convert every .sph under root to a sibling .wav (the reference shells
    to sox, process_an4_data.py:63-66; here data/sphere.py decodes in-tree).
    Existing .wav siblings are kept."""
    from qasr_tpu.data.sphere import sphere_to_wav

    n = 0
    for dirpath, _, names in os.walk(root):
        for name in sorted(names):
            if name.endswith(".sph"):
                sph = os.path.join(dirpath, name)
                wav = sph[:-4] + ".wav"
                if not os.path.exists(wav):
                    sphere_to_wav(sph, wav)
                    n += 1
    return n


def _an4_manifest(data_root: str, transcripts_path: str, manifest_path: str,
                  wav_path: str) -> int:
    """AN4 transcription lines `<s> text </s> (fileID)` -> manifest rows
    (process_an4_data.py:30-54, incl. the fileID -> speaker-dir layout)."""
    rows = []
    with open(transcripts_path) as fin:
        for line in fin:
            line = line.rstrip("\n")
            if "(" not in line:
                continue
            transcript = line[: line.find("(") - 1].lower()
            transcript = transcript.replace("<s>", "").replace("</s>", "").strip()
            file_id = line[line.find("(") + 1: -1].rstrip(")")
            speaker = file_id[file_id.find("-") + 1: file_id.rfind("-")]
            audio_path = os.path.join(data_root, wav_path, speaker,
                                      file_id + ".wav")
            rows.append({"audio_filepath": audio_path,
                         "duration": wav_duration(audio_path),
                         "text": transcript})
    _write_manifest(manifest_path, rows)
    return len(rows)


def process_an4(data_root: str) -> Dict[str, int]:
    """Extracted AN4 tree -> train/test manifests
    (scripts/process_an4_data.py:57-91; sph conversion in-tree)."""
    data_root = os.path.abspath(data_root)
    converted = _convert_sph_tree(os.path.join(data_root, "an4"))
    counts = {"converted_sph": converted}
    for split, trans, wavs in (
            ("train", "an4_train.transcription", "an4/wav/an4_clstk"),
            ("test", "an4_test.transcription", "an4/wav/an4test_clstk")):
        tpath = os.path.join(data_root, "an4", "etc", trans)
        mpath = os.path.join(data_root, "an4", f"{split}_manifest.json")
        counts[split] = _an4_manifest(data_root, tpath, mpath, wavs)
    return counts


_HUB5_STM_RE = None
# transcript fix the reference carries (process_hub5_data.py:55) — keyed
# lowercase because the STM line is lowercased before the uid is built
# (the reference keeps the uppercase key, so its own fix is dead code;
# here the fix actually applies, in the manifest's lowercase convention)
_HUB5_TRANSCRIPT_BUGS = {"en_4622-b-12079-12187": "kind of weird but"}


def _hub5_parse_stm(stm_path: str) -> List[dict]:
    """STM lines -> utterance dicts with the reference's text scrubbing
    (process_hub5_data.py:88-127)."""
    global _HUB5_STM_RE
    import re

    if _HUB5_STM_RE is None:
        _HUB5_STM_RE = re.compile(
            r"^(\w+)\s+(\w+)\s+(\w+)\s+([0-9.]+)\s+([0-9.]+)\s+(<.*>)?\s+(.+)$")
    utts = []
    with open(stm_path) as fh:
        for line in fh:
            if line.startswith(";;") or "IGNORE_TIME_SEGMENT_" in line:
                continue
            line = (line.replace("<B_ASIDE>", "").replace("<E_ASIDE>", "")
                    .replace("(%HESITATION)", "UH").replace("-", "")
                    .replace("(%UH)", "UH").replace("(%AH)", "UH")
                    .replace("(", "").replace(")", "").lower())
            m = _HUB5_STM_RE.search(line.strip())
            if not m:
                continue
            fname, channel, speaker, begin, end, _, transcript = m.groups()
            begin, end = float(begin), float(end)
            uid = f"{fname}-{channel}-{int(begin * 100)}-{int(end * 100)}"
            fix = _HUB5_TRANSCRIPT_BUGS.get(uid)
            utts.append({"filename": fname, "channel": channel,
                         "speaker_id": speaker, "begin": begin, "end": end,
                         "transcript": fix if fix is not None else transcript})
    return utts


def process_hub5(data_root: str, dest_root: str,
                 min_slice_duration: float = 10.0) -> Dict[str, int]:
    """LDC HUB5 tree -> per-speaker >= min_slice_duration wav segments +
    manifest_hub5.json (scripts/process_hub5_data.py:75-210; sph decode
    in-tree instead of sph2pipe)."""
    import wave

    import numpy as np

    from qasr_tpu.data.sphere import sphere_to_wav

    full_wav = os.path.join(dest_root, "full_audio_wav")
    audio_dir = os.path.join(dest_root, "audio")
    os.makedirs(full_wav, exist_ok=True)
    os.makedirs(audio_dir, exist_ok=True)
    sph_root = os.path.join(data_root, "hub5e_00", "english")
    n_conv = 0
    for name in sorted(os.listdir(sph_root)) if os.path.isdir(sph_root) else []:
        if name.endswith(".sph"):
            base = name[:-4]
            wav = os.path.join(full_wav, base + ".wav")
            if not os.path.exists(wav):
                sphere_to_wav(os.path.join(sph_root, name), wav)
                n_conv += 1
    stm = os.path.join(data_root, "2000_hub5_eng_eval_tr", "reference",
                       "hub5e00.english.000405.stm")
    utts = sorted(_hub5_parse_stm(stm),
                  key=lambda u: (u["speaker_id"], u["begin"]))

    manifest_path = os.path.join(dest_root, "manifest_hub5.json")
    rows: List[dict] = []
    prev_id, id_count = None, 0
    sr, audio = None, None
    tbuf, abuf, dur = "", [], 0.0
    for u in utts:
        if u["speaker_id"] != prev_id:
            prev_id, id_count = u["speaker_id"], 0
            with wave.open(os.path.join(full_wav, u["filename"] + ".wav"),
                           "rb") as w:
                sr = w.getframerate()
                ch = w.getnchannels()
                audio = np.frombuffer(w.readframes(w.getnframes()),
                                      "<i2").reshape(-1, ch)
            tbuf, abuf, dur = "", [], 0.0
        chan = 0 if u["channel"].lower() == "a" else 1
        chan = min(chan, audio.shape[1] - 1)
        tbuf += u["transcript"]
        abuf.append(audio[math.floor(u["begin"] * sr):
                          math.ceil(u["end"] * sr), chan])
        dur += u["end"] - u["begin"]
        if dur < min_slice_duration:
            tbuf += " "
        else:
            id_count += 1
            seg_path = os.path.join(audio_dir,
                                    f"{u['speaker_id']}_{id_count:03}.wav")
            with wave.open(seg_path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(np.concatenate(abuf).astype("<i2").tobytes())
            rows.append({"audio_filepath": seg_path, "duration": dur,
                         "text": tbuf})
            tbuf, abuf, dur = "", [], 0.0
    _write_manifest(manifest_path, rows)
    return {"converted_sph": n_conv, "segments": len(rows)}


def commonvoice_manifest(tsv: str, data_root: str, manifest_path: str,
                         sample_rate: int = 16000) -> int:
    """One CommonVoice split .tsv -> resampled mono wavs under
    data_root/wav/ + manifest (get_commonvoice_data.py:81-111; clips must
    already be wav — this image has no mp3 codec, convert out of band)."""
    import csv

    from qasr_tpu.data.audio import read_wav, resample, write_wav

    wav_dir = os.path.join(data_root, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    clips = os.path.join(os.path.dirname(os.path.abspath(tsv)), "clips")
    rows = []
    with open(tsv, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            rel = row["path"]
            text = row["sentence"].lower().strip()
            src = os.path.join(clips, rel)
            base = os.path.splitext(os.path.basename(rel))[0]
            if not os.path.exists(src) and src.endswith(".mp3") \
                    and os.path.exists(src[:-4] + ".wav"):
                src = src[:-4] + ".wav"  # pre-converted tree
            if src.endswith(".mp3"):
                raise NotImplementedError(
                    f"{src}: no mp3 codec in this image; pre-convert clips "
                    f"to wav (the reference shells to sox for the same step,"
                    f" get_commonvoice_data.py:96-99)")
            x, sr = read_wav(src)
            if sr != sample_rate:
                x = resample(x, sr, sample_rate)
            out_wav = os.path.join(wav_dir, base + ".wav")
            write_wav(out_wav, x, sample_rate)
            rows.append({"audio_filepath": os.path.abspath(out_wav),
                         "duration": len(x) / sample_rate, "text": text})
    _write_manifest(manifest_path, rows)
    return len(rows)


def process_rir(data_root: str, dest_root: str) -> Dict[str, int]:
    """Extracted RIRS_NOISES tree -> single-channel real RIR wavs + a
    manifest over every processed wav (get_openslr_rir.py:47-99: multi-
    channel real RIRs split per channel via sox remix; here stdlib wave)."""
    import shutil
    import wave

    import numpy as np

    os.makedirs(dest_root, exist_ok=True)
    real_dir = os.path.join(dest_root, "real_rirs")
    os.makedirs(real_dir, exist_ok=True)
    rir_list = os.path.join(data_root, "RIRS_NOISES",
                            "real_rirs_isotropic_noises", "rir_list")
    n_split = 0
    with open(rir_list) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            src = os.path.join(data_root, parts[4])
            with wave.open(src, "rb") as w:
                ch = w.getnchannels()
                sr = w.getframerate()
                width = w.getsampwidth()
                # decode the payload only when a channel split is needed
                raw = w.readframes(w.getnframes()) if ch > 1 else b""
            if ch == 1:
                shutil.copy(src, real_dir)
            else:
                dt = {1: np.uint8, 2: "<i2", 4: "<i4"}[width]
                x = np.frombuffer(raw, dt).reshape(-1, ch)
                stem = os.path.splitext(os.path.basename(src))[0]
                for c in range(ch):  # sox remix is 1-based; file suffix too
                    out = os.path.join(real_dir, f"{stem}-{c + 1}.wav")
                    with wave.open(out, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(width)
                        w.setframerate(sr)
                        w.writeframes(np.ascontiguousarray(x[:, c]).tobytes())
                    n_split += 1
    sim_src = os.path.join(data_root, "RIRS_NOISES", "simulated_rirs")
    sim_dst = os.path.join(dest_root, "simulated_rirs")
    if os.path.isdir(sim_src) and not os.path.isdir(sim_dst):
        shutil.move(sim_src, sim_dst)
    rows = []
    for dirpath, _, names in os.walk(dest_root):
        for name in sorted(names):
            if name.endswith(".wav"):
                p = os.path.join(dirpath, name)
                rows.append({"audio_filepath": p,
                             "duration": wav_duration(p),
                             "offset": 0, "text": "_"})
    _write_manifest(os.path.join(dest_root, "rir.json"), rows)
    return {"channel_splits": n_split, "rirs": len(rows)}


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

    an = sub.add_parser("an4", help="process_an4_data.py role (extracted "
                                    "tree; sph decoded in-tree)")
    an.add_argument("--data_root", required=True)

    h5 = sub.add_parser("hub5", help="process_hub5_data.py role")
    h5.add_argument("--data_root", required=True)
    h5.add_argument("--dest_root", required=True)
    h5.add_argument("--min_slice_duration", type=float, default=10.0)

    cv = sub.add_parser("commonvoice",
                        help="get_commonvoice_data.py role (one split tsv; "
                             "clips pre-converted to wav)")
    cv.add_argument("--tsv", required=True)
    cv.add_argument("--data_root", required=True)
    cv.add_argument("--manifest_dir", default=".")
    cv.add_argument("--sample_rate", type=int, default=16000)

    rr = sub.add_parser("rir", help="get_openslr_rir.py role (extracted "
                                    "RIRS_NOISES tree)")
    rr.add_argument("--data_root", required=True)
    rr.add_argument("--dest_root", required=True)

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
    elif args.cmd == "an4":
        print(json.dumps(process_an4(args.data_root)))
    elif args.cmd == "hub5":
        print(json.dumps(process_hub5(args.data_root, args.dest_root,
                                      args.min_slice_duration)))
    elif args.cmd == "commonvoice":
        stem = os.path.splitext(os.path.basename(args.tsv))[0]
        out = os.path.join(args.manifest_dir,
                           f"commonvoice_{stem}_manifest.json")
        n = commonvoice_manifest(args.tsv, args.data_root, out,
                                 args.sample_rate)
        print(f"wrote {n} rows to {out}")
    elif args.cmd == "rir":
        print(json.dumps(process_rir(args.data_root, args.dest_root)))


if __name__ == "__main__":
    main()
