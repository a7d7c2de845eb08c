"""Training loop: CTC training of QuartzNet/Jasper on a device mesh.

Equivalent of the reference's PTL-driven path (speech_to_text.py +
EncDecCTCModel.training_step, ctc_models.py:409-470) re-designed for TPU:
one jitted `train_step` (frontend -> spec-augment -> encoder -> decoder ->
CTC loss -> grads -> Novograd) with batch sharded over the mesh 'data' axis
and parameters replicated or channel-sharded ('model' axis).  XLA SPMD
derives the gradient all-reduce — no DDP machinery.
"""
from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qasr_tpu.decode.ctc import WER, greedy_predictions
from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.models.jasper import FloatExec, decoder_forward_float, encoder_forward
from qasr_tpu.ops.spec_augment import SpecAugmentConfig, spec_augment
from qasr_tpu.train.ctc_loss import ctc_loss
from qasr_tpu.train.optim import SCHEDULES, get_optimizer


@dataclass
class TrainConfig:
    optimizer: str = "novograd"
    lr: float = 0.01
    betas: Tuple[float, float] = (0.8, 0.5)   # quartznet_15x5.yaml:226
    weight_decay: float = 0.001
    sched: str = "CosineAnnealing"
    warmup_steps: Optional[int] = 1000
    warmup_ratio: Optional[float] = None
    min_lr: float = 0.0
    max_steps: int = 100000
    grad_clip: Optional[float] = None
    log_every: int = 50


def make_schedule(cfg: TrainConfig):
    kw = dict(max_steps=cfg.max_steps, min_lr=cfg.min_lr)
    if cfg.warmup_steps is not None:
        kw["warmup_steps"] = cfg.warmup_steps
    elif cfg.warmup_ratio is not None:
        kw["warmup_ratio"] = cfg.warmup_ratio
    return SCHEDULES[cfg.sched](cfg.lr, **kw)


def make_optimizer(cfg: TrainConfig):
    sched = make_schedule(cfg)
    if cfg.optimizer.lower() == "novograd":
        tx = get_optimizer("novograd", sched, betas=cfg.betas,
                           weight_decay=cfg.weight_decay)
    else:
        tx = get_optimizer(cfg.optimizer, sched)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx, sched


class Trainer:
    def __init__(self, model: ASRModel, cfg: TrainConfig,
                 spec_aug: Optional[SpecAugmentConfig] = None, mesh=None,
                 qat: bool = False):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.qat = qat  # quantization-aware training (STE fake-quant)
        if spec_aug is None and model.cfg.spec_augment:
            spec_aug = SpecAugmentConfig.from_dict(model.cfg.spec_augment)
        self.spec_aug = spec_aug
        self.tx, self.sched = make_optimizer(cfg)
        self.opt_state = self.tx.init(model.params)
        self.step = 0
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------

    def _loss_fn(self, params, rng, audio, alens, tokens, tlens):
        model = self.model
        k_dither, k_spec, k_drop = jax.random.split(rng, 3)
        feats, feat_lens = model.frontend(audio, alens, rng=k_dither)
        if self.spec_aug is not None:
            feats = spec_augment(k_spec, feats, self.spec_aug)
        if self.qat:
            from qasr_tpu.models.jasper import QATExec

            ex = QATExec(params["encoder"], model.qstate, model.qcfg,
                         activation=model.plan.activation, train=True,
                         rng=k_drop)
        else:
            ex = FloatExec(params["encoder"], activation=model.plan.activation,
                           train=True, rng=k_drop)
        enc, enc_lens = encoder_forward(ex, model.plan, feats, feat_lens)
        log_probs = decoder_forward_float(params["decoder"], enc)
        loss = ctc_loss(log_probs, enc_lens, tokens, tlens, model.blank_id)
        return loss, (log_probs, enc_lens)

    def _build_train_step(self):
        def step_fn(params, opt_state, rng, audio, alens, tokens, tlens):
            (loss, _), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                params, rng, audio, alens, tokens, tlens)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            return jax.jit(step_fn,
                           in_shardings=(repl, repl, repl, data, data, data, data),
                           out_shardings=(repl, repl, repl))
        return jax.jit(step_fn)

    # ------------------------------------------------------------------

    def train_step(self, batch, rng=None) -> float:
        audio, alens, tokens, tlens = batch
        rng = rng if rng is not None else jax.random.PRNGKey(self.step)
        params, self.opt_state, loss = self._train_step(
            self.model.params, self.opt_state, rng,
            jnp.asarray(audio), jnp.asarray(alens),
            jnp.asarray(tokens), jnp.asarray(tlens))
        self.model.params = params
        self.step += 1
        return float(loss)

    def fit(self, train_loader: Iterable, max_steps: Optional[int] = None,
            val_loader: Optional[Iterable] = None, log=print,
            val_every: Optional[int] = None) -> Dict[str, Any]:
        """val_every: run greedy-WER validation every N steps (the reference
        validates per epoch via PTL, ctc_models.py:438-460)."""
        max_steps = max_steps or self.cfg.max_steps
        t0 = time.time()
        losses = []
        history = []
        while self.step < max_steps:
            made_progress = False
            for batch in train_loader:
                made_progress = True
                loss = self.train_step(batch)
                losses.append(loss)
                if self.step % self.cfg.log_every == 0:
                    lr = float(self.sched(self.step))
                    log(f"step {self.step} loss {loss:.4f} lr {lr:.5f} "
                        f"({(time.time() - t0):.1f}s)")
                if val_loader is not None and val_every \
                        and self.step % val_every == 0:
                    wer = self.evaluate(val_loader)
                    history.append({"step": self.step, "val_wer": wer})
                    log(f"step {self.step} val WER {wer:.4f}")
                if self.step >= max_steps:
                    break
            if not made_progress:
                raise RuntimeError(
                    "train_loader yielded no batches this epoch (one-shot "
                    "iterator exhausted? pass a re-iterable loader)")
        out = {"final_loss": losses[-1] if losses else None, "steps": self.step,
               "val_history": history}
        if val_loader is not None:
            out["val_wer"] = self.evaluate(val_loader)
        return out

    def evaluate_multi(self, loaders: Dict[str, Iterable]) -> Dict[str, float]:
        """Named multi-dataloader validation (ModelPT multi-dataloader
        aggregation, modelPT.py:863-1072)."""
        return {name: self.evaluate(loader) for name, loader in loaders.items()}

    def evaluate(self, loader: Iterable) -> float:
        """Greedy-WER over a dataloader (validation_step semantics,
        ctc_models.py:438-460, eval with quantization disabled)."""
        wer = WER(self.model.vocabulary)
        for audio, alens, tokens, tlens in loader:
            lp, el, preds = self.model.forward(audio, alens, mode="fp32")
            wer.update(preds, np.asarray(tokens), np.asarray(tlens), el)
        return wer.compute()


class RNNTTrainer(Trainer):
    """Transducer training: same optimizer/schedule/mesh machinery with the
    RNNT lattice loss (the reference trains EncDecRNNTModel through the same
    PTL loop with warprnnt, rnnt_models.py)."""

    def __init__(self, model, cfg: TrainConfig,
                 spec_aug: Optional[SpecAugmentConfig] = None, mesh=None):
        self.rnnt_model = model

        class _Shim:  # minimal ASRModel-like facade for the base class
            params = model.params
            cfg = model.cfg
            frontend = model.frontend
            plan = model.plan
            blank_id = model.rnnt_cfg.blank_id
            vocabulary = model.cfg.labels

        super().__init__(_Shim(), cfg, spec_aug=spec_aug, mesh=mesh)

    def _loss_fn(self, params, rng, audio, alens, tokens, tlens):
        loss = self.rnnt_model.loss_fn(params, audio, alens, tokens, tlens,
                                       rng=rng, spec_aug=self.spec_aug)
        return loss, (None, None)

    def train_step(self, batch, rng=None) -> float:
        loss = super().train_step(batch, rng)
        self.rnnt_model.params = self.model.params
        return loss

    def evaluate(self, loader: Iterable) -> float:
        wer = WER(list(self.rnnt_model.cfg.labels))
        labels = list(self.rnnt_model.cfg.labels)
        # BPE transducer: references detokenize through the tokenizer
        # (char-joining subword labels would garble them)
        tok = getattr(self.rnnt_model, "tokenizer", None)
        for audio, alens, tokens, tlens in loader:
            hyps = self.rnnt_model.transcribe_greedy(audio, alens)
            for i, h in enumerate(hyps):
                ids = np.asarray(tokens)[i][: int(tlens[i])]
                if tok is not None:
                    ref = tok.ids_to_text([int(c) for c in ids])
                else:
                    ref = "".join(labels[int(c)] for c in ids)
                wer.words += len(ref.split())
                from qasr_tpu.decode.ctc import edit_distance
                wer.scores += edit_distance(h.split(), ref.split())
        return wer.compute()


class ConformerCTCTrainer(Trainer):
    """Conformer-CTC training: the same optimizer/schedule/mesh machinery
    driving the model's own CTC loss (models/conformer_ctc.py).  The
    reference trains its conformer configs through the identical
    speech_to_text.py loop (hydra _target_ dispatch); cli/speech_to_text.py
    mirrors that by selecting this trainer on ConformerEncoder configs."""

    def __init__(self, model, cfg: TrainConfig,
                 spec_aug: Optional[SpecAugmentConfig] = None, mesh=None,
                 qat=None):
        """qat: optional ConformerQuantConfig — QAT fake-quant training
        (the Trainer(qat=True) role for the Jasper family)."""
        self.cc_model = model
        self.cc_qat = qat

        class _Shim:  # minimal ASRModel-like facade for the base class
            params = model.params
            cfg = model.cfg
            frontend = model.frontend
            plan = model.ccfg
            blank_id = model.blank_id
            vocabulary = model.vocabulary

        super().__init__(_Shim(), cfg, spec_aug=spec_aug, mesh=mesh)

    def _loss_fn(self, params, rng, audio, alens, tokens, tlens):
        loss = self.cc_model.loss_fn(params, audio, alens, tokens, tlens,
                                     rng=rng, spec_aug=self.spec_aug,
                                     qat=self.cc_qat)
        return loss, (None, None)

    def train_step(self, batch, rng=None) -> float:
        loss = super().train_step(batch, rng)
        self.cc_model.params = self.model.params
        return loss

    def evaluate(self, loader: Iterable) -> float:
        from qasr_tpu.decode.ctc import edit_distance

        wer = WER(self.cc_model.vocabulary)
        labels = self.cc_model.vocabulary
        tok = getattr(self.cc_model, "tokenizer", None)
        for audio, alens, tokens, tlens in loader:
            hyps = self.cc_model.transcribe_greedy(audio, alens)
            for i, h in enumerate(hyps):
                ids = np.asarray(tokens)[i][: int(tlens[i])]
                if tok is not None:
                    ref = tok.ids_to_text([int(c) for c in ids])
                else:
                    ref = "".join(labels[int(c)] for c in ids)
                wer.words += len(ref.split())
                wer.scores += edit_distance(h.split(), ref.split())
        return wer.compute()
