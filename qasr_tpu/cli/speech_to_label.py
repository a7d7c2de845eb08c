"""Speech classification training CLI (speech commands / VAD labels).

Equivalent of the reference examples/asr/speech_to_label.py (Hydra-driven
EncDecClassificationModel training): a label manifest + a MatchboxNet-style
encoder config train with Novograd on a device mesh; prints final accuracy.
"""
from __future__ import annotations

from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description=__doc__)
    p.add_argument("--train_manifest", required=True)
    p.add_argument("--val_manifest", default=None)
    p.add_argument("--labels", default=None,
                   help="comma-separated label set; default = scan the "
                        "train manifest")
    p.add_argument("--config", default=None,
                   help="model YAML (default: MatchboxNet-3x1x64 preset)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--time_length", type=float, default=1.0,
                   help="fixed slice length in seconds")
    p.add_argument("--save_to", default=None,
                   help="write the trained model as a .qasr archive")
    p.add_argument("--seed", type=int, default=0)
    return p


def _scan_labels(manifest: str):
    import json

    labels = []
    with open(manifest) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            lab = str(d.get("label", d.get("command")))
            if lab not in labels:
                labels.append(lab)
    return labels


def main(argv=None):
    args = build_parser().parse_args(argv)

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from qasr_tpu.data.audio_to_label import AudioToSpeechLabelDataset
    from qasr_tpu.models.classification import EncDecClassificationModel
    from qasr_tpu.models.config import ModelConfig, matchboxnet3x1x64
    from qasr_tpu.train.optim import get_optimizer, SCHEDULES
    from qasr_tpu.utils.logging import logging

    labels = (args.labels.split(",") if args.labels
              else _scan_labels(args.train_manifest))
    cfg = (ModelConfig.from_yaml(args.config) if args.config
           else matchboxnet3x1x64())
    model = EncDecClassificationModel.from_config(cfg, num_classes=len(labels),
                                                  seed=args.seed, labels=labels)
    ds = AudioToSpeechLabelDataset(args.train_manifest, labels,
                                   sample_rate=cfg.sample_rate,
                                   time_length=args.time_length)
    logging.info(f"{len(ds)} training examples, {len(labels)} classes")

    sched = SCHEDULES["CosineAnnealing"](args.lr, max_steps=args.max_steps,
                                         warmup_steps=0, min_lr=0.0)
    tx = get_optimizer("novograd", sched)
    opt_state = tx.init(model.params)

    @jax.jit
    def step(params, opt_state, audio, alens, y):
        loss, grads = jax.value_and_grad(model.loss_fn)(params, audio, alens, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    if len(ds) == 0:
        raise ValueError("no training examples after label/duration filters "
                         f"({args.train_manifest}; labels={labels})")
    n = 0
    while n < args.max_steps:
        for audio, alens, y in ds.batches(args.batch_size, shuffle=True,
                                          seed=args.seed + n):
            model.params, opt_state, loss = step(
                model.params, opt_state, jnp.asarray(audio),
                jnp.asarray(alens), jnp.asarray(y))
            n += 1
            if n % 20 == 0 or n == 1:
                logging.info(f"step {n} loss {float(loss):.4f}")
            if n >= args.max_steps:
                break

    eval_manifest = args.val_manifest or args.train_manifest
    eds = AudioToSpeechLabelDataset(eval_manifest, labels,
                                    sample_rate=cfg.sample_rate,
                                    time_length=args.time_length)
    correct = total = 0
    for audio, alens, y in eds.batches(args.batch_size):
        pred = model.predict(audio, alens)
        correct += int(np.sum(pred == y))
        total += len(y)
    acc = correct / max(total, 1)
    print(f"accuracy: {acc:.4f}")
    if args.save_to:
        model.save_to(args.save_to)
        logging.info(f"model saved to {args.save_to}")
    return acc


if __name__ == "__main__":
    main()
