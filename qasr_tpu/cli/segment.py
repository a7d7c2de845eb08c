"""Long-audio CTC segmentation CLI.

Equivalent of the reference tools/ctc_segmentation (SURVEY.md §2.6): given a
long recording and its transcript, produce word-level timestamps by forced
alignment of the CTC log-probabilities (decode/alignment.py). Long audio is
handled by the streaming transcriber's chunked forward.
"""
from __future__ import annotations

import json
from argparse import ArgumentParser


def main(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--asr_model", required=True,
                   help="preset name or local .nemo")
    p.add_argument("--audio", required=True, help="wav file")
    p.add_argument("--text", required=True,
                   help="transcript string or path to a text file")
    p.add_argument("--output", default=None, help="write segments JSON here")
    p.add_argument("--no_quant", action="store_true",
                   help="run the FP32 path (default)")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="permit a preset name with no cached checkpoint "
                        "(architecture-only random weights; testing)")
    args = p.parse_args(argv)
    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()


    import numpy as np

    from qasr_tpu.data.audio import read_audio
    from qasr_tpu.data.parsers import clean_text
    from qasr_tpu.decode.alignment import align_transcript
    from qasr_tpu.models.ctc_model import ASRModel

    model = ASRModel.from_pretrained(
        args.asr_model, allow_random_weights=args.allow_random_weights)
    model.set_quant_mode("none")
    text = args.text
    try:
        with open(text) as f:
            text = f.read().strip()
    except (OSError, ValueError):
        pass
    text = clean_text(text)

    audio = read_audio(args.audio, model.cfg.sample_rate)
    lp, el, _ = model.forward(audio[None], np.asarray([len(audio)], np.int32),
                              mode="fp32")
    # encoder frame duration: hop (10 ms) x total stride
    from qasr_tpu.decode.streaming import receptive_field
    _, stride = receptive_field(model.plan)
    frame_s = model.frontend.cfg.hop_length / model.cfg.sample_rate * stride
    segs = align_transcript(lp[0, : int(el[0])], text, model.vocabulary,
                            frame_seconds=frame_s)
    out = [{"word": s.label, "start": round(s.start, 3),
            "end": round(s.end, 3), "score": round(s.score, 4)} for s in segs]
    payload = json.dumps(out, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(payload)
        print(f"wrote {len(out)} segments to {args.output}")
    else:
        print(payload)
    return out


if __name__ == "__main__":
    main()
