"""Convert a checkpoint to encoder / decoder ONNX files.

Flag-parity port of `/root/reference/scripts/convasr_to_onnx.py:20-59`:
`--nemo_file` (also accepts .qasr archives), `--onnx_encoder`,
`--onnx_decoder`, `--model_type {asr, speech_label, speaker}`.  The ONNX
bytes are produced in-tree (compat/onnx_export.py) — no torch.onnx / onnx
package involved.
"""
from __future__ import annotations

import argparse

from qasr_tpu.utils.logging import logging


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Convert .nemo file to encoder decoder onnx files")
    parser.add_argument("--nemo_file", default=None, type=str, required=True,
                        help="Path to .nemo (or .qasr) file")
    parser.add_argument("--onnx_encoder", default=None, type=str, required=True,
                        help="Path to the onnx encoder output.")
    parser.add_argument("--onnx_decoder", default=None, type=str, required=True,
                        help="Path to the onnx decoder output.")
    parser.add_argument("--model_type", default="asr", type=str,
                        choices=["asr", "speech_label", "speaker"],
                        help="Type of decoder used by the model.")
    parser.add_argument("--stitched", default=None, type=str,
                        help="Optionally also write the stitched "
                             "encoder+decoder graph (attach_onnx_to_onnx) "
                             "to this path.")
    return parser


def load_model(nemo_file: str, model_type: str):
    if model_type == "asr":
        from qasr_tpu.models.ctc_model import ASRModel
        logging.info("Preparing encoder decoder for ASR model")
        return ASRModel.restore_from(nemo_file)
    if model_type == "speech_label":
        from qasr_tpu.models.classification import EncDecClassificationModel
        logging.info("Preparing encoder decoder for Speech Label "
                     "Classification model")
        return EncDecClassificationModel.restore_from(nemo_file)
    if model_type == "speaker":
        from qasr_tpu.models.classification import EncDecSpeakerLabelModel
        logging.info("Preparing encoder decoder for Speaker Recognition model")
        return EncDecSpeakerLabelModel.restore_from(nemo_file)
    raise NameError("Available model names are asr, speech_label and speaker")


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    from qasr_tpu.compat.onnx_export import (attach_onnx_to_onnx,
                                             export_model_onnx)

    model = load_model(args.nemo_file, args.model_type)
    logging.info("Writing onnx encoder and decoder onnx files")
    export_model_onnx(model, args.onnx_encoder, args.onnx_decoder,
                      model_type=args.model_type)
    if args.stitched:
        with open(args.onnx_encoder, "rb") as f:
            enc = f.read()
        with open(args.onnx_decoder, "rb") as f:
            dec = f.read()
        with open(args.stitched, "wb") as f:
            f.write(attach_onnx_to_onnx(enc, dec))
    logging.info("succesfully ported onnx files")


if __name__ == "__main__":
    main()
