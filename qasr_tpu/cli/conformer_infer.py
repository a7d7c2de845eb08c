"""Quantized Conformer-CTC evaluation CLI — the cli/inference.py role for
the Conformer family (the reference's Q-ASR workflow is QuartzNet-only;
this extends it: inference.py:103-159 shape — calibrate -> quantize ->
evaluate -> WER — over quantize/conformer_ptq.py + conformer_freeze.py).

    # calibrate on real audio, int8-GEMM eval
    python -m qasr_tpu.cli.conformer_infer --restore model.qasr \
        --dataset dev.json --calib_manifest train.json --num_calib_batch 4

    # ZERO-SHOT: data-free synthetic calibration (distill_data.py role)
    python -m qasr_tpu.cli.conformer_infer --restore model.qasr \
        --dataset dev.json --synthetic --num_batch 4 --train_iter 200

    # integer-only serving graph (i-softmax/i-LayerNorm/i-GLU + freeze)
    ... --integer --freeze
"""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description=__doc__)
    p.add_argument("--restore", type=str, required=True,
                   help=".qasr Conformer-CTC checkpoint "
                        "(ConformerCTC.save_to)")
    p.add_argument("--dataset", type=str, required=True,
                   help="evaluation manifest (JSON lines)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--normalize_text", default=True,
                   type=lambda v: str(v).lower() not in
                   ("0", "false", "no"))
    # calibration source (one of)
    p.add_argument("--calib_manifest", type=str, default=None,
                   help="calibrate on real audio from this manifest")
    p.add_argument("--num_calib_batch", type=int, default=4)
    p.add_argument("--synthetic", action="store_true",
                   help="data-free calibration from the encoder's own BN "
                        "stats (quantize/conformer_synth.py)")
    p.add_argument("--num_batch", type=int, default=2,
                   help="synthetic batches")
    p.add_argument("--seqlen", "--seq_len", dest="seqlen", type=int,
                   default=128)
    p.add_argument("--train_iter", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.02)
    # quantization
    p.add_argument("--weight_bit", type=int, default=8)
    p.add_argument("--act_bit", type=int, default=8)
    p.add_argument("--percentile", type=float, default=None)
    p.add_argument("--dynamic", action="store_true",
                   help="per-batch dynamic ranges, no calibration data")
    p.add_argument("--no_quant", action="store_true",
                   help="float evaluation (baseline WER)")
    p.add_argument("--integer", action="store_true",
                   help="full integer glue: int8 attention einsums + "
                        "i-softmax + i-LayerNorm + i-GLU + static "
                        "attention scales")
    p.add_argument("--freeze", action="store_true",
                   help="freeze to the integer-only dyadic executor "
                        "(implies --integer)")
    # decoding
    p.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--beam_width", type=int, default=64)
    p.add_argument("--alpha", type=float, default=0.0)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--lm_path", type=str, default=None)
    p.add_argument("--eval_early_stop", type=int, default=None)
    return p


def main(argv=None) -> float:
    args = build_parser().parse_args(argv)

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    from qasr_tpu.data.dataset import AudioToCharDataset, DataLoader
    from qasr_tpu.decode.ctc import word_error_rate
    from qasr_tpu.models.conformer_ctc import ConformerCTC
    from qasr_tpu.utils.logging import logging

    model = ConformerCTC.restore_from(args.restore)
    logging.info(f"Restored Conformer-CTC from {args.restore} "
                 f"(layers={model.ccfg.n_layers}, d={model.ccfg.d_model})")

    tok = getattr(model, "tokenizer", None)

    def make_ds(manifest):
        if tok is not None:  # BPE vocab: references tokenize subword
            from qasr_tpu.models.ctc_bpe_model import AudioToBPEDataset

            return AudioToBPEDataset(manifest_filepath=manifest,
                                     tokenizer=tok,
                                     sample_rate=model.cfg.sample_rate)
        return AudioToCharDataset(
            manifest_filepath=manifest, labels=list(model.vocabulary),
            sample_rate=model.cfg.sample_rate,
            normalize_transcripts=args.normalize_text,
            parser="en" if args.normalize_text else "base")

    loader = DataLoader(make_ds(args.dataset), batch_size=args.batch_size)

    if not args.no_quant:
        integer = args.integer or args.freeze
        qkw = dict(weight_bit=args.weight_bit, act_bit=args.act_bit,
                   percentile=args.percentile, dynamic=args.dynamic,
                   quantize_attention=integer, integer_softmax=integer,
                   integer_layernorm=integer, integer_activations=integer,
                   static_attention=integer)
        if args.synthetic:
            logging.info("Zero-shot synthetic calibration "
                         f"(nb={args.num_batch}, iter={args.train_iter})")
            model.quantize_encoder_synthetic(
                num_batch=args.num_batch, seqlen=args.seqlen,
                train_iter=args.train_iter, lr=args.lr, **qkw)
        elif args.calib_manifest is not None:
            cloader = DataLoader(make_ds(args.calib_manifest),
                                 batch_size=args.batch_size)
            batches = []
            for i, (audio, alens, *_rest) in enumerate(cloader):
                if i >= args.num_calib_batch:
                    break
                batches.append((audio, alens))
            logging.info(f"Calibrating on {len(batches)} real batches")
            model.quantize_encoder(batches, **qkw)
        elif args.dynamic:
            model.quantize_encoder([], **qkw)
        else:
            raise SystemExit("pick a calibration source: --calib_manifest, "
                             "--synthetic, --dynamic, or --no_quant")
        if args.freeze:
            model.freeze()
            logging.info("Frozen to the integer-only executor")

    lm = None
    if args.decoder == "beam":
        from qasr_tpu.decode.beam_search import BeamSearchDecoderWithLM

        lm = BeamSearchDecoderWithLM(model.vocabulary,
                                     beam_width=args.beam_width,
                                     alpha=args.alpha, beta=args.beta,
                                     lm_path=args.lm_path)

    hyps, refs = [], []
    labels = list(model.vocabulary)
    for bi, (audio, alens, tokens, tlens) in enumerate(loader):
        if args.eval_early_stop is not None and bi >= args.eval_early_stop:
            break
        if args.decoder == "beam":
            hyps += model.transcribe_beam(audio, alens, lm=lm)
        else:
            hyps += model.transcribe_greedy(audio, alens)
        for i in range(np.asarray(tokens).shape[0]):
            ids = np.asarray(tokens)[i][: int(tlens[i])]
            if tok is not None:
                refs.append(tok.ids_to_text([int(c) for c in ids]))
            else:
                refs.append("".join(labels[int(c)] for c in ids))
    wer = word_error_rate(hyps, refs)
    print(f"WER: {wer:.4f}")
    return wer


if __name__ == "__main__":
    main()
