"""Transcribe a manifest and emit NIST sclite trn files (+ optional sctk).

Equivalent of the reference examples/asr/experimental/
speech_to_text_sclite.py: greedy-transcribe the dataset, write
``hyp.trn``/``ref.trn`` in the " text (utt_id)" format sclite consumes
(utt_id = audio basename, :148-154), and — when --sctk_dir points at an
sctk install — run sclite (with an optional GLM rfilter pass) to produce
the standard dtl/pra reports (:117-141).

    python -m qasr_tpu.cli.speech_to_text_sclite --asr_model <name|.nemo> \
        --dataset manifest.json --out_dir /tmp/sclite [--sctk_dir ...]
"""
from __future__ import annotations

import os
import subprocess
from argparse import ArgumentParser
from typing import List


def write_trn(out_dir: str, utt_ids: List[str], hypotheses: List[str],
              references: List[str]):
    """hyp.trn / ref.trn: ' text (utt_id)' lines (sclite trn format; the
    leading space keeps sctk's rfilter happy, reference :152-154)."""
    hypfile = os.path.join(out_dir, "hyp.trn")
    reffile = os.path.join(out_dir, "ref.trn")
    with open(hypfile, "w") as hyp_f, open(reffile, "w") as ref_f:
        for uid, hyp, ref in zip(utt_ids, hypotheses, references):
            hyp_f.write(f" {hyp} ({uid})\n")
            ref_f.write(f" {ref} ({uid})\n")
    return reffile, hypfile


def score_with_sctk(sctk_dir: str, ref_fname: str, hyp_fname: str,
                    out_dir: str, glm: str = ""):
    """Invoke sctk's sclite (reference score_with_sctk, :117-141)."""
    sclite_path = os.path.join(sctk_dir, "bin", "sclite")
    if not os.path.exists(sclite_path):
        raise FileNotFoundError(sclite_path)
    if glm:
        if not os.path.exists(glm):
            raise FileNotFoundError(f"GLM file not found: {glm}")
        rfilter = os.path.join(sctk_dir, "bin", "rfilter1")
        if not os.path.exists(rfilter):
            raise FileNotFoundError(rfilter)
        for fname in (hyp_fname, ref_fname):
            out = os.path.join(out_dir, os.path.basename(fname)) + ".glm"
            with open(fname) as fin, open(out, "w") as fout:
                subprocess.run([rfilter, glm], stdin=fin, stdout=fout,
                               check=True)
        hyp_fname = os.path.join(out_dir, os.path.basename(hyp_fname)) + ".glm"
        ref_fname = os.path.join(out_dir, os.path.basename(ref_fname)) + ".glm"
    subprocess.run([sclite_path, "-h", hyp_fname, "trn", "-r", ref_fname,
                    "trn", "-i", "wsj", "-o", "all", "-O", out_dir],
                   check=True)


def main(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--asr_model", required=True,
                   help="preset name or a local .nemo/.qasr path")
    p.add_argument("--dataset", required=True, help="JSON-lines manifest")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--sctk_dir", default="", help="sctk root (optional)")
    p.add_argument("--glm", default="", help="GLM filter file (optional)")
    p.add_argument("--dont_normalize_text", action="store_false",
                   dest="normalize_text")
    p.add_argument("--allow_random_weights", action="store_true")
    args = p.parse_args(argv)

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    import numpy as np

    from qasr_tpu.data.dataset import AudioToCharDataset, DataLoader
    from qasr_tpu.decode.ctc import ctc_collapse, word_error_rate
    from qasr_tpu.models.ctc_model import ASRModel
    from qasr_tpu.utils.logging import logging

    os.makedirs(args.out_dir, exist_ok=True)
    model = ASRModel.from_pretrained(
        args.asr_model, allow_random_weights=args.allow_random_weights)
    labels = list(model.vocabulary)
    ds = AudioToCharDataset(
        manifest_filepath=args.dataset, labels=labels,
        sample_rate=model.cfg.sample_rate,
        normalize_transcripts=args.normalize_text,
        parser="en" if args.normalize_text else "base")
    loader = DataLoader(ds, batch_size=args.batch_size)

    hypotheses: List[str] = []
    references: List[str] = []
    for audio, alens, tokens, tlens in loader:
        _, enc_lens, preds = model.forward(audio, alens, mode="fp32")
        hyps = ctc_collapse(np.asarray(preds), model.blank_id, labels,
                            np.asarray(enc_lens))
        hypotheses += hyps
        for i in range(np.asarray(tokens).shape[0]):
            ids = np.asarray(tokens)[i][: int(np.asarray(tlens)[i])]
            references.append("".join(labels[int(c)] for c in ids))

    # utt ids come from the dataset's RETAINED entries, in dataset order —
    # a second manifest read would misalign ids with hypotheses whenever
    # the dataset drops an unparseable/filtered entry
    utt_ids = [os.path.splitext(os.path.basename(e.audio_file))[0]
               for e, _ in ds.items]
    reffile, hypfile = write_trn(args.out_dir, utt_ids, hypotheses,
                                 references)
    wer = word_error_rate(hypotheses, references)
    logging.info(f"greedy WER: {wer:.4f}; trn files in {args.out_dir}")
    print(f"WER: {wer}")
    if args.sctk_dir and os.path.exists(args.sctk_dir):
        score_with_sctk(args.sctk_dir, reffile, hypfile, args.out_dir,
                        glm=args.glm)
    return hypfile


if __name__ == "__main__":
    main()
