"""CTC ASR training CLI.

Equivalent of the reference examples/asr/speech_to_text.py (Hydra-driven,
speech_to_text.py:62-76): loads the same model YAML schema
(conf/quartznet_15x5.yaml), applies dotted key=value overrides
(hydra-style, e.g. model.train_ds.manifest_filepath=...), builds the model,
and runs the mesh trainer with exp_manager checkpointing/resume.
--tokenizer switches to the BPE model + dataset (the
examples/asr/speech_to_text_bpe.py role: Citrinet/BPE CTC training).
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from typing import Any, Dict, List


def apply_overrides(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    import yaml

    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, val = ov.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    return cfg


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--config-path", dest="config_path", type=str, required=True,
                        help="model YAML (reference conf/ schema)")
    parser.add_argument("--tokenizer", type=str, default=None,
                        help="BPE tokenizer json -> EncDecCTCModelBPE "
                             "(speech_to_text_bpe.py role); default = chars")
    parser.add_argument("overrides", nargs="*",
                        help="dotted key=value overrides (hydra-style)")
    args = parser.parse_args(argv)
    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()


    import yaml

    import jax
    import numpy as np

    from qasr_tpu.data.dataset import AudioToCharDataset, DataLoader
    from qasr_tpu.models.config import ModelConfig
    from qasr_tpu.models.ctc_model import ASRModel
    from qasr_tpu.parallel.mesh import make_mesh
    from qasr_tpu.train.trainer import TrainConfig, Trainer
    from qasr_tpu.utils.exp_manager import ExpManager, ExpManagerConfig
    from qasr_tpu.utils.logging import logging

    with open(args.config_path) as f:
        raw = yaml.safe_load(f)
    from qasr_tpu.models.config import resolve_interpolations
    # hydra semantics: overrides land BEFORE ${...} resolution, so
    # overriding an interpolated source key propagates to its references
    raw = resolve_interpolations(apply_overrides(raw, args.overrides))
    mcfg = raw["model"]
    tokenizer = None
    if args.tokenizer:
        from qasr_tpu.data.tokenizers import BPETokenizer

        tokenizer = BPETokenizer(args.tokenizer)
    # _target_-driven model dispatch, like the reference's hydra configs:
    # ConformerEncoder sections build a Conformer-CTC
    # (examples/asr/experimental/conformer/*.yaml run through the same
    # speech_to_text.py upstream)
    conformer = (mcfg.get("encoder") or {}).get(
        "_target_", "").endswith("ConformerEncoder")
    if conformer:
        from qasr_tpu.models.conformer_ctc import conformer_ctc_from_dict

        model = conformer_ctc_from_dict(mcfg, tokenizer=tokenizer)
        if tokenizer is not None:
            mcfg = dict(mcfg, labels=list(tokenizer.vocab))
    elif tokenizer is not None:
        from qasr_tpu.models.ctc_bpe_model import EncDecCTCModelBPE

        model = EncDecCTCModelBPE.from_config_and_tokenizer(
            ModelConfig.from_dict(mcfg), tokenizer)
        mcfg = dict(mcfg, labels=list(tokenizer.vocab))
    else:
        model = ASRModel.from_config(ModelConfig.from_dict(mcfg))

    opt = mcfg.get("optim", {})
    sched = opt.get("sched", {})
    trainer_cfg = raw.get("trainer", {})
    tcfg = TrainConfig(
        optimizer=opt.get("name", "novograd"),
        lr=float(opt.get("lr", 0.01)),
        betas=tuple(opt.get("betas", (0.8, 0.5))),
        weight_decay=float(opt.get("weight_decay", 0.001)),
        sched=sched.get("name", "CosineAnnealing"),
        warmup_steps=sched.get("warmup_steps", 1000),
        warmup_ratio=sched.get("warmup_ratio"),
        min_lr=float(sched.get("min_lr", 0.0)),
        max_steps=int(trainer_cfg.get("max_steps") or 100000),
    )

    exp = ExpManager(ExpManagerConfig(
        **{k: v for k, v in raw.get("exp_manager", {}).items()
           if k in ExpManagerConfig.__dataclass_fields__}), run_config=raw)

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        import math
        bs = int(mcfg.get("train_ds", {}).get("batch_size", 32))
        dp = math.gcd(bs, n_dev)
        if dp > 1:
            mesh = make_mesh(data=dp, model=1)
            logging.info(f"training on mesh {dict(mesh.shape)}")
    if conformer:
        from qasr_tpu.train.trainer import ConformerCTCTrainer

        trainer = ConformerCTCTrainer(model, tcfg, mesh=mesh)
    else:
        trainer = Trainer(model, tcfg, mesh=mesh)

    # resume if a checkpoint exists
    resume = exp.check_resume()
    if resume:
        from qasr_tpu.utils.checkpoint import load_training_ckpt
        params, opt_state, step, _ = load_training_ckpt(
            resume, model.params, trainer.opt_state)
        model.params, trainer.opt_state, trainer.step = params, opt_state, step
        # shim-based trainers (ConformerCTCTrainer) train from
        # trainer.model.params — rebind it too or the restored weights
        # would be silently discarded
        trainer.model.params = params
        logging.info(f"resumed from {resume} at step {step}")

    def make_ds(dcfg):
        if tokenizer is not None:
            from qasr_tpu.models.ctc_bpe_model import AudioToBPEDataset

            return AudioToBPEDataset(
                manifest_filepath=dcfg["manifest_filepath"],
                tokenizer=tokenizer,
                sample_rate=dcfg.get("sample_rate", 16000),
                max_duration=dcfg.get("max_duration"),
                min_duration=dcfg.get("min_duration"),
                trim=dcfg.get("trim_silence", False))
        return AudioToCharDataset(
            manifest_filepath=dcfg["manifest_filepath"], labels=mcfg["labels"],
            sample_rate=dcfg.get("sample_rate", 16000),
            max_duration=dcfg.get("max_duration"),
            min_duration=dcfg.get("min_duration"),
            trim=dcfg.get("trim_silence", False))

    tds = mcfg["train_ds"]
    train_ds = make_ds(tds)
    train_loader = DataLoader(train_ds, batch_size=tds.get("batch_size", 32),
                              shuffle=tds.get("shuffle", True), drop_last=True)
    val_loader = None
    vds = mcfg.get("validation_ds")
    if vds and vds.get("manifest_filepath"):
        val_loader = DataLoader(make_ds(vds),
                                batch_size=vds.get("batch_size", 32))

    def log_fn(msg):
        logging.info(msg)

    max_steps = tcfg.max_steps
    while trainer.step < max_steps:
        for batch in train_loader:
            loss = trainer.train_step(batch)
            if trainer.step % tcfg.log_every == 0:
                exp.log_metrics(trainer.step, train_loss=loss,
                                lr=float(trainer.sched(trainer.step)))
                log_fn(f"step {trainer.step} loss {loss:.4f}")
            exp.maybe_checkpoint(trainer.step, model.params, trainer.opt_state)
            if trainer.step >= max_steps:
                break
    exp.maybe_checkpoint(trainer.step, model.params, trainer.opt_state, force=True)
    if val_loader is not None:
        wer = trainer.evaluate(val_loader)
        exp.log_metrics(trainer.step, val_wer=wer)
        log_fn(f"final val WER: {wer:.4f}")


if __name__ == "__main__":
    main()
