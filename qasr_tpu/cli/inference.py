"""Integer-only quantized evaluation CLI.

Flag-compatible with the reference `examples/asr/quantization/inference.py`
(argparse spec at inference.py:46-70).  Workflow parity
(inference.py:103-159): set bits -> percentile -> BN fold -> calibrate on
the synthetic pickle -> freeze -> integer evaluate -> greedy CTC -> WER.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser

import numpy as np


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--asr_model", type=str, default="QuartzNet15x5Base-En",
                        required=True, help="Pass: 'QuartzNet15x5Base-En'")
    parser.add_argument("--dataset", type=str, required=True,
                        help="path to evaluation data (JSON-lines manifest)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--normalize_text", default=True, type=bool,
                        help="Normalize transcripts or not. Set to False for non-English.")
    parser.add_argument("--shuffle", action="store_true", help="Shuffle test data.")
    # calibration
    parser.add_argument("--load", type=str, default=None,
                        help="load path for the synthetic data")
    parser.add_argument("--calib_manifest", type=str, default=None,
                        help="calibrate on real audio from this manifest "
                             "instead of a synthetic pickle (the role of the "
                             "reference's speech_to_text_calibrate.py, which "
                             "needs the external pytorch-quantization pkg)")
    parser.add_argument("--num_calib_batch", type=int, default=None,
                        help="number of real-data calibration batches")
    parser.add_argument("--percentile", type=float, default=None,
                        help="Max/min percentile for outlier handling. e.g., 99.9")
    # quantization
    parser.add_argument("--weight_bit", type=int, default=8,
                        help="quantization bit for weights")
    parser.add_argument("--act_bit", type=int, default=8,
                        help="quantization bit for activations")
    parser.add_argument("--dynamic", action="store_true",
                        help="Dynamic quantization mode.")
    parser.add_argument("--no_quant", action="store_true", help="No quantization mode.")
    # decoding (native C++ beam search + ARPA LM; the reference needs the
    # external ctc_decoders package for this, beam_search_decoder.py:16-104)
    parser.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    parser.add_argument("--beam_width", type=int, default=128)
    parser.add_argument("--alpha", type=float, default=0.0, help="LM weight")
    parser.add_argument("--beta", type=float, default=0.0, help="word bonus")
    parser.add_argument("--lm_path", type=str, default=None,
                        help="ARPA n-gram LM for beam rescoring")
    # debugging
    parser.add_argument("--eval_early_stop", type=int, default=None,
                        help="early stop for debugging")
    parser.add_argument("--calib_early_stop", type=int, default=None,
                        help="early stop calibration")
    parser.add_argument("--allow_random_weights", action="store_true",
                        help="permit a preset name with no cached checkpoint "
                             "(architecture-only random weights; testing)")
    return parser


def main(argv=None) -> float:
    args = build_parser().parse_args(argv)

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    from qasr_tpu.compat.pickle_io import load_synthetic
    from qasr_tpu.data.dataset import AudioToCharDataset, DataLoader
    from qasr_tpu.decode.ctc import WER, word_error_rate, ctc_collapse
    from qasr_tpu.models.ctc_model import ASRModel
    from qasr_tpu.utils.logging import logging

    logging.info(f"Using ASR model {args.asr_model}")
    model = ASRModel.from_pretrained(
        args.asr_model, allow_random_weights=args.allow_random_weights)

    ds = AudioToCharDataset(
        manifest_filepath=args.dataset, labels=list(model.vocabulary),
        sample_rate=model.cfg.sample_rate,
        normalize_transcripts=args.normalize_text,
        parser="en" if args.normalize_text else "base")
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=args.shuffle)

    if args.load is not None:
        print("Data loaded from %s" % args.load)
        distilled = load_synthetic(args.load)
        if args.calib_early_stop is not None:
            distilled = distilled[: args.calib_early_stop]
    elif args.calib_manifest is not None:
        distilled = None  # calibrated below from real audio
    else:
        # (the reference asserts even for --no_quant, inference.py:99-100;
        # relaxed here: FP32 eval needs no calibration data)
        assert args.dynamic or args.no_quant, (
            "synthetic data must be loaded unless running with the dynamic "
            "quantization mode")
        distilled = None

    # ---------------- calibration (inference.py:103-130) ----------------
    model.set_quant_bit(args.weight_bit, mode="weight")
    model.set_quant_bit(args.act_bit, mode="act")
    if args.percentile is not None:
        model.set_percentile(args.percentile)
    if args.no_quant:
        model.set_quant_mode("none")
    else:
        model.bn_folding()
    if not args.dynamic and not args.no_quant:
        print("Calibrating...")
        if distilled is not None:
            model.calibrate(distilled)
        else:
            calib_ds = AudioToCharDataset(
                manifest_filepath=args.calib_manifest,
                labels=list(model.vocabulary),
                sample_rate=model.cfg.sample_rate,
                normalize_transcripts=args.normalize_text,
                parser="en" if args.normalize_text else "base")
            model.calibrate_on_audio(
                DataLoader(calib_ds, batch_size=args.batch_size),
                max_batches=args.num_calib_batch)

    # ---------------- evaluation (inference.py:133-159) -----------------
    print("Evaluating...")
    model.set_dynamic(args.dynamic)
    beam = None
    if args.decoder == "beam":
        from qasr_tpu.decode.beam_search import BeamSearchDecoderWithLM
        beam = BeamSearchDecoderWithLM(
            list(model.vocabulary), beam_width=args.beam_width,
            alpha=args.alpha, beta=args.beta, lm_path=args.lm_path)
    hypotheses, references = [], []
    labels_map = dict(enumerate(model.vocabulary))
    for i, (audio, alens, tokens, tlens) in enumerate(loader):
        if i == args.eval_early_stop:
            break
        log_probs, enc_lens, preds = model.forward(audio, alens)
        if beam is not None:
            hypotheses += [c[0][1] if c else "" for c in beam(log_probs, enc_lens)]
        else:
            hypotheses += ctc_collapse(preds, model.blank_id, model.vocabulary,
                                       enc_lens)
        for b in range(tokens.shape[0]):
            references.append("".join(labels_map[int(c)]
                                      for c in tokens[b][: int(tlens[b])]))
    wer_value = word_error_rate(hypotheses=hypotheses, references=references)
    print("WER:", wer_value)
    return wer_value


if __name__ == "__main__":
    main()
