"""Voice-activity-detection inference CLI.

Equivalent of the reference examples/asr/vad_infer.py: slide a
(time_length, shift_length) window over each manifest utterance, run the
classification model per window, and write per-frame speech probabilities
(one output file per utterance in --out_dir).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description=__doc__)
    p.add_argument("--vad_model", default=None,
                   help=".qasr classification checkpoint (omit for a "
                        "random-weight MatchboxNet-VAD: smoke testing)")
    p.add_argument("--dataset", required=True,
                   help="label manifest (labels may be dummies at inference)")
    p.add_argument("--out_dir", default="vad_frame")
    p.add_argument("--time_length", type=float, default=0.63)
    p.add_argument("--shift_length", type=float, default=0.01)
    p.add_argument("--labels", default="background,speech")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from qasr_tpu.data.audio_to_label import AudioToSpeechLabelDataset
    from qasr_tpu.models.classification import EncDecClassificationModel
    from qasr_tpu.models.config import matchboxnet3x1x64
    from qasr_tpu.utils.logging import logging

    labels = args.labels.split(",")
    if args.vad_model:
        model = EncDecClassificationModel.restore_from(args.vad_model)
        if model.num_classes != len(labels):
            raise ValueError(f"checkpoint has {model.num_classes} classes, "
                             f"--labels has {len(labels)}")
        if model.labels and list(model.labels) != labels:
            # a silent order mismatch would swap which column is 'speech'
            raise ValueError(
                f"checkpoint was trained with labels {list(model.labels)}; "
                f"--labels gives {labels} — pass them in the training order")
    else:
        model = EncDecClassificationModel.from_config(matchboxnet3x1x64(),
                                                      num_classes=len(labels))

    ds = AudioToSpeechLabelDataset(
        args.dataset, labels, sample_rate=model.cfg.sample_rate,
        min_duration=None, time_length=args.time_length,
        shift_length=args.shift_length, keep_unknown_labels=True)
    os.makedirs(args.out_dir, exist_ok=True)

    @jax.jit
    def probs_fn(params, audio, alens):
        return jax.nn.softmax(model.logits(params, audio, alens), axis=-1)

    outputs = []
    seen = set()
    CHUNK = 64  # fixed window-batch size: one XLA compile serves every
    # utterance length in the manifest (variable window counts would
    # otherwise recompile per utterance)
    for i in range(len(ds)):
        wins = list(ds.vad_windows(i))
        audio = np.stack([w for w, _ in wins])
        rows = []
        for c0 in range(0, len(wins), CHUNK):
            chunk = audio[c0 : c0 + CHUNK]
            pad = CHUNK - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            probs = np.asarray(probs_fn(
                model.params, jnp.asarray(chunk),
                jnp.full((CHUNK,), audio.shape[1], np.int32)))
            rows.extend(probs[: CHUNK - pad] if pad else probs)
        name = os.path.splitext(os.path.basename(
            ds.items[i]["audio_file"]))[0]
        if name in seen:  # same basename in different dirs: keep both
            name = f"{name}_{i}"
        seen.add(name)
        out = os.path.join(args.out_dir, f"{name}.frame")
        with open(out, "w") as f:
            for p in rows:
                f.write(" ".join(f"{x:.4f}" for x in p) + "\n")
        outputs.append(out)
        logging.info(f"{name}: {len(wins)} frames -> {out}")
    return outputs


if __name__ == "__main__":
    main()
