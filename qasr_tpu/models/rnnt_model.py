"""EncDecRNNTModel: transducer ASR model (reference models/rnnt_models.py).

Composes the mel frontend + a float encoder (Jasper/QuartzNet block stack or
Conformer) + the RNNT prediction/joint networks, with the pure-JAX RNNT loss
and greedy/beam decoding from models/rnnt.py.  The reference's RNNT path is
inherited NeMo and unquantized (SURVEY.md §2.2).  This stack goes further:
a Conformer encoder can be PTQ-quantized to int8 GEMMs via
``quantize_encoder`` (quantize/conformer_ptq.py) — a capability the
reference does not have.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.config import ModelConfig
from qasr_tpu.models.jasper import (
    EncoderPlan, FloatExec, build_encoder_plan, encoder_forward,
    init_encoder_params,
)
from qasr_tpu.models.rnnt import (
    RNNTConfig, beam_decode_one, greedy_decode, init_rnnt_params, joint,
    pred_network, rnnt_loss,
)
from qasr_tpu.models.config import preprocessor_config_from_dict
from qasr_tpu.ops.features import MelFrontend


@dataclass
class RNNTModel:
    cfg: ModelConfig
    rnnt_cfg: RNNTConfig
    plan: Any                      # EncoderPlan or ConformerConfig
    frontend: MelFrontend
    params: Dict[str, Any]         # {'encoder', 'rnnt'}
    encoder_kind: str = "jasper"   # 'jasper' | 'conformer'
    enc_qcfg: Any = None           # ConformerQuantConfig after quantize_encoder
    enc_qstate: Any = None         # calibrated QuantAct ranges (host numpy)
    enc_frozen: Any = None         # dyadic tables after freeze_encoder()
    dec_frozen: Any = None         # integer pred+joint after freeze_decoder()

    @classmethod
    def from_config(cls, cfg: ModelConfig, rnnt_cfg: Optional[RNNTConfig] = None,
                    seed: int = 0) -> "RNNTModel":
        plan = build_encoder_plan(cfg.encoder)
        rng = np.random.default_rng(seed)
        if rnnt_cfg is None:
            rnnt_cfg = RNNTConfig(num_classes=len(cfg.labels),
                                  enc_hidden=plan.feat_out)
        params = {
            "encoder": init_encoder_params(rng, plan),
            "rnnt": init_rnnt_params(rng, rnnt_cfg),
        }
        return cls(cfg=cfg, rnnt_cfg=rnnt_cfg, plan=plan,
                   frontend=MelFrontend(preprocessor_config_from_dict(cfg.preprocessor)),
                   params=params)

    @classmethod
    def conformer_transducer(cls, cfg: ModelConfig, conformer_cfg,
                             rnnt_cfg: Optional[RNNTConfig] = None,
                             seed: int = 0) -> "RNNTModel":
        """Conformer-Transducer: Conformer encoder + RNNT decoder/joint
        (the architecture NeMo's later releases ship; the pieces exist
        upstream as conformer_encoder.py + rnnt.py)."""
        from qasr_tpu.models.conformer import init_conformer_params

        rng = np.random.default_rng(seed)
        d_out = (conformer_cfg.feat_out if conformer_cfg.feat_out > 0
                 else conformer_cfg.d_model)
        if rnnt_cfg is None:
            rnnt_cfg = RNNTConfig(num_classes=len(cfg.labels), enc_hidden=d_out)
        params = {
            "encoder": init_conformer_params(rng, conformer_cfg),
            "rnnt": init_rnnt_params(rng, rnnt_cfg),
        }
        return cls(cfg=cfg, rnnt_cfg=rnnt_cfg, plan=conformer_cfg,
                   frontend=MelFrontend(preprocessor_config_from_dict(cfg.preprocessor)),
                   params=params, encoder_kind="conformer")

    def quantize_encoder(self, calib_batches, *, weight_bit: int = 8,
                         act_bit: int = 8, percentile: Optional[float] = None,
                         dynamic: bool = False, momentum: float = 0.95,
                         quantize_attention: bool = False,
                         integer_softmax: bool = False,
                         integer_layernorm: bool = False,
                         integer_activations: bool = False,
                         static_attention: bool = False,
                         features: bool = False) -> None:
        """PTQ-calibrate the Conformer encoder (quantize/conformer_ptq.py):
        EMA QuantAct ranges over (audio, alens) calibration batches; eval
        `_encode` then runs the int8-GEMM path.  The Jasper family
        quantizes through ASRModel's calibrate/freeze instead.  The qstate
        lives in memory (host numpy — re-calibration is a few batches);
        pass dynamic=True for calibration-free per-batch ranges."""
        if self.encoder_kind != "conformer":
            raise ValueError("quantize_encoder is the Conformer PTQ path; "
                             "the Jasper/QuartzNet family quantizes through "
                             "ASRModel (models/ctc_model.py)")
        from qasr_tpu.quantize.conformer_ptq import (
            ConformerQuantConfig, calibrate_conformer,
        )

        qcfg = ConformerQuantConfig(weight_bit=weight_bit, act_bit=act_bit,
                                    act_momentum=momentum,
                                    percentile=percentile, dynamic=dynamic,
                                    quantize_attention=quantize_attention,
                                    integer_softmax=integer_softmax,
                                    integer_layernorm=integer_layernorm,
                                    integer_activations=integer_activations,
                                    static_attention=static_attention)

        @jax.jit
        def front(a, l):
            return self.frontend(a, l, dither=0.0)

        def feat_batches():
            for audio, alens in calib_batches:
                if features:  # already (feats, lens), e.g. synthetic data
                    yield jnp.asarray(audio), jnp.asarray(alens)
                else:
                    yield front(jnp.asarray(audio), jnp.asarray(alens))

        qstate = calibrate_conformer(self.params["encoder"], self.plan,
                                     qcfg, feat_batches())
        # host numpy: the eval jit closes over the ranges as literals, not
        # captured device buffers (PERF.md round 3d)
        self.enc_qstate = jax.tree_util.tree_map(np.asarray, qstate)
        self.enc_qcfg = qcfg
        self.enc_frozen = None  # stale dyadic tables; re-freeze if wanted
        self._q_version = getattr(self, "_q_version", 0) + 1

    def freeze_encoder(self):
        """Freeze the Conformer encoder to the integer-only dyadic executor
        (quantize/conformer_freeze.py); eval encode/transcribe run it."""
        from qasr_tpu.quantize.conformer_freeze import freeze_conformer

        if self.encoder_kind != "conformer" or self.enc_qstate is None:
            raise ValueError("calibrate a Conformer encoder first "
                             "(quantize_encoder with all integer flags and "
                             "static_attention=True)")
        self.enc_frozen = freeze_conformer(self.params["encoder"], self.plan,
                                           self.enc_qcfg, self.enc_qstate)
        self._q_version = getattr(self, "_q_version", 0) + 1
        return self.enc_frozen

    def freeze_decoder(self, calib_batches, weight_bit: int = 8):
        """Freeze the pred-net + joint to integer arithmetic
        (quantize/rnnt_freeze.py: int8 GEMMs, i-sigmoid/i-tanh gates,
        fixed-point cell state).  With a frozen Conformer encoder this
        makes the whole serving transducer integer-only — a capability the
        reference lacks entirely (its RNNT stack is float).  calib_batches
        (audio, alens) provide the two data-dependent ranges (encoder
        output + pre-relu joint hidden) via a float greedy pass."""
        from qasr_tpu.quantize.rnnt_freeze import (
            calibrate_decoder_ranges, freeze_rnnt_decoder,
        )

        enc_range, joint_range = calibrate_decoder_ranges(self, calib_batches)
        self.dec_frozen = freeze_rnnt_decoder(
            self.params["rnnt"], self.rnnt_cfg, enc_range=enc_range,
            joint_range=joint_range, weight_bit=weight_bit)
        self._q_version = getattr(self, "_q_version", 0) + 1
        return self.dec_frozen

    def _encode(self, params, feats, feat_lens, train=False, rng=None):
        if self.encoder_kind == "conformer":
            from qasr_tpu.models.conformer import conformer_encoder_apply

            if self.enc_frozen is not None and not train:
                from qasr_tpu.quantize.conformer_freeze import (
                    frozen_conformer_apply,
                )

                return frozen_conformer_apply(self.enc_frozen, self.plan,
                                              feats, feat_lens)
            if self.enc_qstate is not None and not train:
                from qasr_tpu.quantize.conformer_ptq import (
                    conformer_encoder_apply_ptq,
                )

                enc, lens, _ = conformer_encoder_apply_ptq(
                    params["encoder"], self.plan, self.enc_qcfg,
                    self.enc_qstate, feats, feat_lens)
                return enc, lens
            return conformer_encoder_apply(params["encoder"], self.plan, feats,
                                           feat_lens, train=train, rng=rng)
        ex = FloatExec(params["encoder"], activation=self.plan.activation,
                       train=train, rng=rng)
        return encoder_forward(ex, self.plan, feats, feat_lens)

    # -- training ----------------------------------------------------------

    def loss_fn(self, params, audio, alens, targets, tlens, rng=None,
                spec_aug=None, qat=None):
        """qat: optional ConformerQuantConfig — STE fake-quant training of
        a Conformer encoder (conformer_encoder_apply_qat)."""
        if rng is not None:
            k_front, k_spec, k_drop = jax.random.split(rng, 3)
        else:
            k_front = k_spec = k_drop = None
        feats, feat_lens = self.frontend(audio, alens, rng=k_front)
        if spec_aug is not None and k_spec is not None:
            from qasr_tpu.ops.spec_augment import spec_augment

            feats = spec_augment(k_spec, feats, spec_aug)
        if qat is not None:
            if self.encoder_kind != "conformer":
                raise ValueError("qat= is the Conformer QAT path; the "
                                 "Jasper family trains QAT via "
                                 "Trainer(qat=True)")
            from qasr_tpu.quantize.conformer_ptq import (
                conformer_encoder_apply_qat,
            )

            enc, enc_lens = conformer_encoder_apply_qat(
                params["encoder"], self.plan, qat, feats, feat_lens,
                rng=k_drop)
        else:
            enc, enc_lens = self._encode(params, feats, feat_lens,
                                         train=rng is not None, rng=k_drop)
        pred = pred_network(params["rnnt"], self.rnnt_cfg, targets)
        logits = joint(params["rnnt"], self.rnnt_cfg, enc, pred)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return rnnt_loss(log_probs, targets, enc_lens, tlens,
                         self.rnnt_cfg.blank_id)

    # -- inference ----------------------------------------------------------

    def encode(self, audio, alens):
        # cache the jitted eval encoder; rebuild when quantization state
        # changes (a fresh jit per call would retrace every time).  Keyed
        # on a monotonic state version, NOT object ids (CPython reuses
        # freed ids, which could serve a stale executable)
        key = getattr(self, "_q_version", 0)
        cached = getattr(self, "_enc_cache", None)
        if cached is None or cached[0] != key:
            @jax.jit
            def enc_fn(params, audio, alens):
                feats, feat_lens = self.frontend(audio, alens, dither=0.0)
                return self._encode(params, feats, feat_lens)

            self._enc_cache = cached = (key, enc_fn)
        return cached[1](self.params, jnp.asarray(audio), jnp.asarray(alens))

    # -- checkpointing (ModelPT parity for the transducer family;
    #    reference rnnt_models.py inherits .nemo save/restore) -------------

    def save_to(self, path: str) -> None:
        """'.qasr' archive: config + rnnt_cfg + encoder/pred/joint params
        (+ tokenizer artifact for the BPE variant)."""
        import dataclasses as dc

        from qasr_tpu.models.config import config_to_dict
        from qasr_tpu.utils.checkpoint import save_qasr

        meta: Dict[str, Any] = {"family": "rnnt",
                                "encoder_kind": self.encoder_kind,
                                "rnnt_cfg": dc.asdict(self.rnnt_cfg)}
        if self.encoder_kind == "conformer":
            meta["conformer_cfg"] = dc.asdict(self.plan)
        if self.enc_qcfg is not None:
            meta["enc_qcfg"] = dc.asdict(self.enc_qcfg)
        artifacts = {}
        tok = getattr(self, "tokenizer", None)
        if tok is not None and getattr(tok, "path", None):
            artifacts["tokenizer.json"] = tok.path
            meta["tokenizer"] = "tokenizer.json"
        save_qasr(path, config_to_dict(self.cfg), self.params,
                  self.enc_qstate, meta=meta, artifacts=artifacts)

    @classmethod
    def restore_from(cls, path: str) -> "RNNTModel":
        from qasr_tpu.utils.checkpoint import load_qasr, unflatten_into

        cfg_d, flat, artifacts = load_qasr(path)
        meta = cfg_d.pop("_qasr_meta", {}) or {}
        if meta.get("family") != "rnnt":
            raise ValueError(f"{path} is not a transducer checkpoint "
                             f"(family={meta.get('family')!r}); use the "
                             f"owning model class's restore_from")
        cfg = ModelConfig.from_dict(cfg_d)
        rnnt_cfg = RNNTConfig(**meta["rnnt_cfg"])
        if meta.get("encoder_kind") == "conformer":
            from qasr_tpu.models.conformer import ConformerConfig

            model = RNNTModel.conformer_transducer(
                cfg, ConformerConfig(**meta["conformer_cfg"]),
                rnnt_cfg=rnnt_cfg)
        else:
            model = RNNTModel.from_config(cfg, rnnt_cfg=rnnt_cfg)
        model.params = unflatten_into(model.params, flat, "params/")
        if meta.get("enc_qcfg") and any(k.startswith("qstate/") for k in flat):
            from qasr_tpu.quantize.conformer_ptq import (
                ConformerQuantConfig, init_conformer_qstate,
            )

            model.enc_qcfg = ConformerQuantConfig(**meta["enc_qcfg"])
            tmpl = jax.tree_util.tree_map(
                np.asarray,
                init_conformer_qstate(model.plan, model.enc_qcfg))
            model.enc_qstate = unflatten_into(tmpl, flat, "qstate/")
        if meta.get("tokenizer") and meta["tokenizer"] in artifacts:
            from qasr_tpu.data.tokenizers import BPETokenizer

            model.__class__ = EncDecRNNTBPEModel
            model.tokenizer = BPETokenizer(artifacts[meta["tokenizer"]])
        return model

    def _greedy_hyps(self, enc, enc_lens) -> List[List[int]]:
        """Greedy hypothesis ids through the serving decoder: the frozen
        integer pred+joint when freeze_decoder has run, else float."""
        if self.dec_frozen is not None:
            from qasr_tpu.quantize.rnnt_freeze import greedy_decode_frozen

            return greedy_decode_frozen(self.dec_frozen, self.rnnt_cfg,
                                        enc, enc_lens)
        return greedy_decode(self.params["rnnt"], self.rnnt_cfg, enc,
                             enc_lens)

    def transcribe_greedy(self, audio, alens) -> List[str]:
        enc, enc_lens = self.encode(audio, alens)
        hyps = self._greedy_hyps(enc, enc_lens)
        labels = list(self.cfg.labels)
        return ["".join(labels[i] for i in h) for h in hyps]

    def transcribe_beam(self, audio, alens, beam_size: int = 4,
                        search_type: str = "beam", **beam_kwargs) -> List[str]:
        """search_type in {'beam', 'tsd', 'alsd'} selects the reference
        BeamRNNTInfer algorithm (rnnt_beam_decoding.py:89-104); beam_kwargs
        forward tsd_max_sym_exp / alsd_max_target_len / score_norm."""
        enc, enc_lens = self.encode(audio, alens)
        enc = np.asarray(enc)
        labels = list(self.cfg.labels)
        out = []
        for i in range(enc.shape[0]):
            ids = beam_decode_one(self.params["rnnt"], self.rnnt_cfg,
                                  enc[i, : int(enc_lens[i])], beam_size,
                                  search_type=search_type, **beam_kwargs)
            out.append("".join(labels[j] for j in ids))
        return out


class EncDecRNNTBPEModel(RNNTModel):
    """Transducer with a subword tokenizer (reference rnnt_bpe_models.py:40:
    EncDecRNNTBPEModel = EncDecRNNTModel + ASRBPEMixin): the label space is
    the tokenizer's vocab and hypotheses detokenize through it."""

    tokenizer = None

    @classmethod
    def from_config_and_tokenizer(cls, cfg: ModelConfig, tokenizer,
                                  rnnt_cfg: Optional[RNNTConfig] = None,
                                  seed: int = 0) -> "EncDecRNNTBPEModel":
        import dataclasses as dc

        vocab = tuple(tokenizer.vocab)
        cfg = dc.replace(cfg, labels=vocab)
        if rnnt_cfg is None:
            plan = build_encoder_plan(cfg.encoder)
            rnnt_cfg = RNNTConfig(num_classes=len(vocab),
                                  enc_hidden=plan.feat_out)
        model = super().from_config(cfg, rnnt_cfg=rnnt_cfg, seed=seed)
        model.__class__ = cls
        model.tokenizer = tokenizer
        return model

    def _detok(self, ids) -> str:
        return self.tokenizer.ids_to_text([int(i) for i in ids])

    def transcribe_greedy(self, audio, alens) -> List[str]:
        enc, enc_lens = self.encode(audio, alens)
        return [self._detok(h) for h in self._greedy_hyps(enc, enc_lens)]

    def transcribe_beam(self, audio, alens, beam_size: int = 4,
                        search_type: str = "beam", **beam_kwargs) -> List[str]:
        enc, enc_lens = self.encode(audio, alens)
        enc = np.asarray(enc)
        return [self._detok(beam_decode_one(self.params["rnnt"], self.rnnt_cfg,
                                            enc[i, : int(enc_lens[i])],
                                            beam_size, search_type=search_type,
                                            **beam_kwargs))
                for i in range(enc.shape[0])]
