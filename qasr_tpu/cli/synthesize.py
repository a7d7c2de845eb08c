"""Synthetic calibration data generation CLI.

Flag-compatible with the reference `examples/asr/quantization/synthesize.py`
(argparse spec at synthesize.py:49-58; accepts both --seqlen and the
--seq_len spelling the reference README uses, README.md:55).  Dump format
and filename match synthesize.py:94-104 so pickles interoperate.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--asr_model", type=str, default="QuartzNet15x5Base-En",
                        required=True, help="Pass: 'QuartzNet15x5Base-En'")
    parser.add_argument("--dataset", type=str, required=False, default=None,
                        help="path to evaluation data (vestigial in the "
                             "reference too — synthesis never reads audio, "
                             "synthesize.py:71)")
    parser.add_argument("--num_batch", type=int, default=50,
                        help="number of batches of the synthetic data")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="batch size of the synthetic data")
    parser.add_argument("--seqlen", "--seq_len", dest="seqlen", type=int,
                        default=500, help="sequence length of the synthetic data")
    parser.add_argument("--train_iter", type=int, default=200,
                        help="training iterations for the synthetic data generation")
    parser.add_argument("--dump_path", type=str, default=None,
                        help="path to dump the synthetic data")
    parser.add_argument("--dump_prefix", type=str, default="syn",
                        help="prefix for the filename of the dumped synthetic data")
    parser.add_argument("--lr", type=float, default=0.01,
                        help="Learning rate for the synthetic data generation")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--parallel", type=int, default=4,
                        help="independent distillation problems vmapped together "
                             "(TPU-only speedup; reference runs them one by one)")
    parser.add_argument("--allow_random_weights", action="store_true",
                        help="permit a preset name with no cached checkpoint "
                             "(architecture-only random weights; testing)")
    return parser


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    from qasr_tpu.compat.pickle_io import save_synthetic, synthetic_filename
    from qasr_tpu.models.ctc_model import ASRModel
    from qasr_tpu.quantize.synth import get_synthetic_data
    from qasr_tpu.utils.logging import logging

    logging.info(f"Using ASR model {args.asr_model}")
    model = ASRModel.from_pretrained(
        args.asr_model, allow_random_weights=args.allow_random_weights)
    model.set_quant_mode("none")  # teacher runs unquantized (synthesize.py:84)

    print("Num batches: %d, Batch size: %d, Training iterations: %d, "
          "Learning rate: %.3f " % (args.num_batch, args.batch_size,
                                    args.train_iter, args.lr))
    print("Synthesizing...")
    data = get_synthetic_data(
        model.plan, model.params["encoder"], batch_size=args.batch_size,
        dim=model.plan.feat_in, seqlen=args.seqlen, num_batch=args.num_batch,
        train_iter=args.train_iter, lr=args.lr, seed=args.seed,
        parallel=args.parallel)

    file_name = synthetic_filename(args.dump_prefix, args.num_batch,
                                   args.train_iter, args.lr, args.dump_path)
    print("Synthetic data dumped as ", file_name)
    save_synthetic(file_name, data)
    return file_name


if __name__ == "__main__":
    main()
