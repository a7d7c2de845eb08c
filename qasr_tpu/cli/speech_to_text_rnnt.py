"""RNN-Transducer training CLI.

Equivalent of the reference examples/asr/speech_to_text_rnnt.py (and the
_bpe variant via --tokenizer): a char or BPE transducer trained with the
pure-JAX RNNT lattice loss over a device mesh.
"""
from __future__ import annotations

from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="model YAML (encoder etc.)")
    p.add_argument("--train_manifest", required=True)
    p.add_argument("--val_manifest", default=None)
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer.json for a BPE transducer "
                        "(speech_to_text_rnnt_bpe.py role); default = chars")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_steps", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--pred_hidden", type=int, default=64)
    p.add_argument("--joint_hidden", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    import numpy as np

    from qasr_tpu.data.dataset import AudioToCharDataset, DataLoader
    from qasr_tpu.models.config import ModelConfig
    from qasr_tpu.models.rnnt import RNNTConfig
    from qasr_tpu.models.rnnt_model import EncDecRNNTBPEModel, RNNTModel
    from qasr_tpu.models.jasper import build_encoder_plan
    from qasr_tpu.train.trainer import RNNTTrainer, TrainConfig
    from qasr_tpu.utils.logging import logging

    cfg = ModelConfig.from_yaml(args.config)
    plan = build_encoder_plan(cfg.encoder)
    if args.tokenizer:
        from qasr_tpu.data.tokenizers import BPETokenizer

        tok = BPETokenizer(args.tokenizer)
        rnnt_cfg = RNNTConfig(num_classes=tok.vocab_size,
                              enc_hidden=plan.feat_out,
                              pred_hidden=args.pred_hidden,
                              joint_hidden=args.joint_hidden)
        model = EncDecRNNTBPEModel.from_config_and_tokenizer(
            cfg, tok, rnnt_cfg=rnnt_cfg, seed=args.seed)
        labels = list(tok.vocab)
    else:
        rnnt_cfg = RNNTConfig(num_classes=len(cfg.labels),
                              enc_hidden=plan.feat_out,
                              pred_hidden=args.pred_hidden,
                              joint_hidden=args.joint_hidden)
        model = RNNTModel.from_config(cfg, rnnt_cfg=rnnt_cfg, seed=args.seed)
        labels = list(cfg.labels)

    if args.tokenizer:
        from qasr_tpu.models.ctc_bpe_model import AudioToBPEDataset

        ds = AudioToBPEDataset(args.train_manifest, tok,
                               sample_rate=cfg.sample_rate)
    else:
        ds = AudioToCharDataset(manifest_filepath=args.train_manifest,
                                labels=labels, sample_rate=cfg.sample_rate)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True)
    trainer = RNNTTrainer(model, TrainConfig(lr=args.lr, warmup_steps=0,
                                             max_steps=args.max_steps,
                                             log_every=10))
    out = trainer.fit(loader, max_steps=args.max_steps, log=logging.info)
    print(f"final loss: {out['final_loss']:.4f}")
    if args.val_manifest:
        if args.tokenizer:
            from qasr_tpu.models.ctc_bpe_model import AudioToBPEDataset

            vds = AudioToBPEDataset(args.val_manifest, tok,
                                    sample_rate=cfg.sample_rate)
        else:
            vds = AudioToCharDataset(manifest_filepath=args.val_manifest,
                                     labels=labels, sample_rate=cfg.sample_rate)
        wer = trainer.evaluate(DataLoader(vds, batch_size=args.batch_size))
        print(f"val WER: {wer:.4f}")
    return out


if __name__ == "__main__":
    main()
