"""Port old-NeMo (0.11.*) per-module Jasper/QuartzNet checkpoints to a
v1.0-style `.nemo` archive.

Flag-parity port of `/root/reference/scripts/asr_checkpoint_port.py:28-68`:
`--config_path` (v1.0beta YAML), `--encoder_ckpt` + `--decoder_ckpt`
(separate torch state-dict files, the NeMo-0.11 persistence unit),
`--output_path` (.nemo), `--model_type {asr, speech_label, speaker}`.

The old checkpoints hold module-relative keys (the 0.11 module tree matches
the v1.0 one key-for-key — that is what lets the reference call
`model.encoder.load_state_dict(torch.load(...))` directly); porting is
therefore (1) prefix the keys with `encoder.` / `decoder.`, (2) validate
them against the config-derived layer plan the way a strict
load_state_dict would, (3) repackage as model_config.yaml + merged
state dict in a tar.gz `.nemo` (modelPT.py:254-296 layout).  The output
loads in BOTH frameworks: the reference's `restore_from` and our
`ASRModel.restore_from` / `compat.nemo_loader.load_nemo`.
"""
from __future__ import annotations

import argparse
import os
import tarfile
import tempfile
from typing import Any, Dict

from qasr_tpu.utils.logging import logging


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Converts old Jasper/QuartzNet models to NeMo v1.0beta")
    parser.add_argument("--config_path", default=None, required=True,
                        help="Path to model config (NeMo v1.0beta)")
    parser.add_argument("--encoder_ckpt", default=None, required=True,
                        help="Encoder checkpoint path")
    parser.add_argument("--decoder_ckpt", default=None, required=True,
                        help="Decoder checkpoint path")
    parser.add_argument("--output_path", default=None, required=True,
                        help="Output checkpoint path (should be .nemo)")
    parser.add_argument("--model_type", default="asr", type=str,
                        choices=["asr", "speech_label", "speaker"],
                        help="Type of decoder used by the model.")
    return parser


def _load_module_sd(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # PTL-era files sometimes nest the tensors under 'state_dict'
    if isinstance(sd, dict) and "state_dict" in sd \
            and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    if not sd or not all(hasattr(v, "detach") for v in sd.values()):
        raise ValueError(f"{path} is not a flat tensor state dict")
    return sd


def port_checkpoint(config_path: str, encoder_ckpt: str, decoder_ckpt: str,
                    output_path: str, model_type: str = "asr") -> None:
    import torch
    import yaml

    from qasr_tpu.compat.nemo_loader import (_RESERVED_NEMO,
                                             encoder_params_from_state_dict,
                                             params_from_state_dict)
    from qasr_tpu.models.config import ModelConfig
    from qasr_tpu.models.jasper import build_encoder_plan

    with open(config_path) as f:
        params = yaml.safe_load(f)
    model_cfg = params["model"] if "model" in params else params

    merged: Dict[str, Any] = {}
    for prefix, path in (("encoder", encoder_ckpt), ("decoder", decoder_ckpt)):
        for k, v in _load_module_sd(path).items():
            merged[f"{prefix}.{k}"] = v

    # strict-keys validation against the config's layer plan — the role
    # load_state_dict plays at asr_checkpoint_port.py:63-64.  The three
    # model types share the conv encoder; only the asr decoder layout
    # (1x1 conv) is plan-checkable, the classification/speaker decoder
    # heads pass through verbatim.
    cfg = ModelConfig.from_dict(model_cfg)
    plan = build_encoder_plan(cfg.encoder)
    if model_type == "asr":
        params_from_state_dict(plan, merged)
        logging.info("Creating ASR NeMo 1.0 model")
    else:
        encoder_params_from_state_dict(plan, merged)
        logging.info("Creating %s NeMo 1.0 model",
                     "speech label" if model_type == "speech_label"
                     else "Speaker Recognition")

    with tempfile.TemporaryDirectory() as td:
        cfg_file = os.path.join(td, "model_config.yaml")
        with open(cfg_file, "w") as f:
            yaml.safe_dump(model_cfg, f)
        wfile = os.path.join(td, "model_weights.ckpt")
        torch.save(merged, wfile)
        with tarfile.open(output_path, "w:gz") as tar:
            for name in sorted(_RESERVED_NEMO):
                tar.add(os.path.join(td, name), arcname=name)
    logging.info("Succesfully ported old checkpoint")
    logging.info("new model saved at %s", output_path)


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    port_checkpoint(args.config_path, args.encoder_ckpt, args.decoder_ckpt,
                    args.output_path, args.model_type)


if __name__ == "__main__":
    main()
