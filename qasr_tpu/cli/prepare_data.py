"""Dataset preparation: build JSON-lines manifests (LibriSpeech-style).

Equivalent of the reference scripts/get_librispeech_data.py:49-123 minus the
download step (this environment has no egress): walks an extracted
LibriSpeech directory (<spk>/<chap>/<spk>-<chap>-<utt>.(wav|flac) +
*.trans.txt) or a generic folder of wav+txt pairs and writes the manifest.
flac decode requires ffmpeg/sox/flac on PATH (the reference shells out to
sox for the same conversion); pure-wav trees need no external tools.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import wave
from argparse import ArgumentParser
from typing import Optional


def wav_duration(path: str) -> float:
    with wave.open(path, "rb") as w:
        return w.getnframes() / float(w.getframerate())


def flac_to_wav(src: str, dst: str) -> bool:
    for tool, cmd in [("ffmpeg", ["ffmpeg", "-nostdin", "-y", "-i", src, dst]),
                      ("sox", ["sox", src, dst]),
                      ("flac", ["flac", "-d", "-f", "-o", dst, src])]:
        if shutil.which(tool):
            subprocess.run(cmd, check=True, capture_output=True)
            return True
    return False


def process_librispeech_split(split_dir: str, manifest_path: str,
                              wav_dir: Optional[str] = None) -> int:
    """<split>/<spk>/<chap>/{*.flac|*.wav, <spk>-<chap>.trans.txt} -> manifest."""
    n = 0
    with open(manifest_path, "w") as mf:
        for root, _, files in os.walk(split_dir):
            trans = [f for f in files if f.endswith(".trans.txt")]
            for tf in trans:
                with open(os.path.join(root, tf)) as f:
                    for line in f:
                        utt_id, _, text = line.strip().partition(" ")
                        wav = os.path.join(root, utt_id + ".wav")
                        flac = os.path.join(root, utt_id + ".flac")
                        if not os.path.exists(wav):
                            if not os.path.exists(flac):
                                continue
                            out = os.path.join(wav_dir or root, utt_id + ".wav")
                            os.makedirs(os.path.dirname(out), exist_ok=True)
                            if not flac_to_wav(flac, out):
                                print("no flac decoder (ffmpeg/sox/flac) on "
                                      "PATH; skipping", flac, file=sys.stderr)
                                continue
                            wav = out
                        mf.write(json.dumps({
                            "audio_filepath": wav,
                            "duration": round(wav_duration(wav), 3),
                            "text": text.lower(),
                        }) + "\n")
                        n += 1
    return n


def main(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True,
                   help="extracted LibriSpeech split dir (e.g. .../dev-clean)")
    p.add_argument("--manifest", required=True, help="output manifest path")
    p.add_argument("--wav_dir", default=None,
                   help="where to place converted wavs (default: alongside)")
    args = p.parse_args(argv)
    n = process_librispeech_split(args.data_root, args.manifest, args.wav_dir)
    print(f"wrote {n} entries to {args.manifest}")


if __name__ == "__main__":
    main()
