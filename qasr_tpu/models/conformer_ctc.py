"""Conformer-CTC model: Conformer encoder + linear CTC head.

The architecture NeMo ships as EncDecCTCModel(Conformer) — the reference
repo has the pieces (modules/conformer_encoder.py + ConvASRDecoder) but no
composed Conformer-CTC; this class completes the model-family matrix
{Jasper/QuartzNet, Conformer} x {CTC, Transducer} and gives the Conformer
PTQ path (quantize/conformer_ptq.py) a WER-measurable CTC surface.

API mirrors ASRModel/RNNTModel: from_config / loss_fn / forward /
transcribe_greedy / quantize_encoder / save_to / restore_from.  Under
``quantize_encoder`` the encoder runs the calibrated int8-GEMM path and
the CTC head's own input gets a QuantAct site ('dec_in'), so every
matmul from features to logits is an int8 dot.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.models.config import ModelConfig, preprocessor_config_from_dict
from qasr_tpu.models.conformer import (
    ConformerConfig, conformer_encoder_apply, init_conformer_params,
)
from qasr_tpu.ops.features import MelFrontend
from qasr_tpu.train.ctc_loss import ctc_loss


@dataclass
class ConformerCTC:
    cfg: ModelConfig               # labels / preprocessor / training knobs
    ccfg: ConformerConfig
    frontend: MelFrontend
    params: Dict[str, Any]         # {'encoder', 'decoder': {'w', 'b'}}
    decoder_kind: str = "linear"   # 'linear' (ConvASRDecoder role) | 'lstm'
    enc_qcfg: Any = None
    enc_qstate: Any = None         # encoder QuantAct ranges + 'dec_in' site
    enc_frozen: Any = None         # dyadic tables after freeze()

    # -- construction --------------------------------------------------------

    @classmethod
    def from_config(cls, cfg: ModelConfig, ccfg: ConformerConfig,
                    seed: int = 0, decoder_kind: str = "linear",
                    lstm_hidden: int = 640, lstm_layers: int = 1,
                    bidirectional: bool = False) -> "ConformerCTC":
        from qasr_tpu.models.conformer import _linear

        rng = np.random.default_rng(seed)
        d_out = ccfg.feat_out if ccfg.feat_out > 0 else ccfg.d_model
        if decoder_kind == "lstm":
            # the reference conformer configs pair the encoder with an
            # LSTMDecoder head (conformer_char.yaml:100-107)
            from qasr_tpu.models.lstm_decoder import init_lstm_decoder

            dec = init_lstm_decoder(rng, d_out, len(cfg.labels),
                                    hidden=lstm_hidden,
                                    num_layers=lstm_layers,
                                    bidirectional=bidirectional)
        elif decoder_kind == "linear":
            # CTC head: d -> V+1 (blank last, like ConvASRDecoder)
            dec = _linear(rng, d_out, len(cfg.labels) + 1)
        else:
            raise ValueError(decoder_kind)
        params = {"encoder": init_conformer_params(rng, ccfg),
                  "decoder": dec}
        return cls(cfg=cfg, ccfg=ccfg,
                   frontend=MelFrontend(
                       preprocessor_config_from_dict(cfg.preprocessor)),
                   params=params, decoder_kind=decoder_kind)

    @property
    def vocabulary(self):
        return list(self.cfg.labels)

    @property
    def blank_id(self) -> int:
        return len(self.cfg.labels)

    # -- forward --------------------------------------------------------------

    def _decoder_apply(self, params, enc):
        if self.decoder_kind == "lstm":
            # recurrent head stays float (already log-softmaxed)
            from qasr_tpu.models.lstm_decoder import lstm_decoder_forward

            return lstm_decoder_forward(params["decoder"], enc)
        if (self.enc_qstate is not None
                and "dec_in" in self.enc_qstate):
            from qasr_tpu.quantize.conformer_ptq import _act_quant, _qlinear

            eq, _ = _act_quant(self.enc_qstate["dec_in"], enc, None,
                               self.enc_qcfg, update=False)
            return _qlinear(params["decoder"], eq, self.enc_qcfg.weight_bit)
        return enc @ params["decoder"]["w"] + params["decoder"]["b"]

    def _apply(self, params, feats, feat_lens, train=False, rng=None,
               frozen_tables=None):
        """frozen_tables overrides self.enc_frozen — _forward_fn passes the
        merge_tables() reconstruction so the frozen weights ride as jit
        runtime arguments instead of baked HLO constants."""
        tables = frozen_tables if frozen_tables is not None \
            else self.enc_frozen
        if tables is not None and not train:
            from qasr_tpu.quantize.conformer_freeze import (
                frozen_conformer_apply,
            )

            enc, enc_lens = frozen_conformer_apply(tables,
                                                   self.ccfg, feats,
                                                   feat_lens)
        elif self.enc_qstate is not None and not train:
            from qasr_tpu.quantize.conformer_ptq import (
                conformer_encoder_apply_ptq,
            )

            enc, enc_lens, _ = conformer_encoder_apply_ptq(
                params["encoder"], self.ccfg, self.enc_qcfg,
                self.enc_qstate, feats, feat_lens)
        else:
            enc, enc_lens = conformer_encoder_apply(
                params["encoder"], self.ccfg, feats, feat_lens,
                train=train, rng=rng)
        return self._head(params, enc), enc_lens

    def _head(self, params, enc, quantized: bool = True):
        """CTC head + log-softmax (one place for every path).  quantized=
        False forces the float head (QAT needs differentiable logits)."""
        if quantized:
            out = self._decoder_apply(params, enc)
        elif self.decoder_kind == "lstm":
            from qasr_tpu.models.lstm_decoder import lstm_decoder_forward

            out = lstm_decoder_forward(params["decoder"], enc)
        else:
            out = enc @ params["decoder"]["w"] + params["decoder"]["b"]
        if self.decoder_kind != "lstm":  # lstm head is already log-softmaxed
            out = jax.nn.log_softmax(out, axis=-1)
        return out

    def forward(self, audio, alens):
        fn = self._forward_fn()
        return fn(self.params, jnp.asarray(audio), jnp.asarray(alens))

    def _forward_fn(self):
        """Cache the jitted eval forward; rebuild when the quantization
        state changes (a fresh jit per call would retrace every time).
        Keyed on a monotonic state version, NOT object ids — CPython
        reuses freed ids, which could serve a stale executable.  The
        effective kernel-selection flags join the key (one helper resolves
        backend-dependent defaults for BOTH flags, ADVICE r4): they select
        the fused Pallas GEMM-epilogue / attention kernels at trace time
        (quantize/conformer_freeze.py)."""
        from qasr_tpu.quantize.conformer_freeze import effective_kernel_flags

        key = (getattr(self, "_q_version", 0), self.decoder_kind,
               tuple(sorted(effective_kernel_flags().items())))
        cached = getattr(self, "_fwd_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]

        if self.enc_frozen is not None:
            # weights-as-args: the frozen tables' array leaves ride as jit
            # runtime arguments (uploaded once, reused every call) — the
            # compile payload stays O(program) instead of O(weights), so
            # wide models compile over payload-capped transports and a
            # table swap (re-freeze) reuses nothing stale (the version key
            # rebuilds this closure)
            from qasr_tpu.quantize.conformer_freeze import (
                merge_tables, partition_tables,
            )

            spec, arrs = partition_tables(self.enc_frozen)
            arrs = [jnp.asarray(a) for a in arrs]

            @jax.jit
            def fn_args(params, arrs, audio, alens):
                feats, feat_lens = self.frontend(audio, alens, dither=0.0)
                return self._apply(params, feats, feat_lens,
                                   frozen_tables=merge_tables(spec, arrs))

            def fn(params, audio, alens):
                return fn_args(params, arrs, audio, alens)
        else:
            @jax.jit
            def fn(params, audio, alens):
                feats, feat_lens = self.frontend(audio, alens, dither=0.0)
                return self._apply(params, feats, feat_lens)

        self._fwd_cache = (key, fn)
        return fn

    # -- training --------------------------------------------------------------

    def loss_fn(self, params, audio, alens, targets, tlens, rng=None,
                spec_aug=None, qat=None):
        """qat: optional ConformerQuantConfig — train with straight-through
        fake quantization at every matmul site (QuartzNet QATExec role)."""
        if rng is not None:
            k_front, k_spec, k_drop = jax.random.split(rng, 3)
        else:
            k_front = k_spec = k_drop = None
        feats, feat_lens = self.frontend(audio, alens, rng=k_front)
        if spec_aug is not None and k_spec is not None:
            from qasr_tpu.ops.spec_augment import spec_augment

            feats = spec_augment(k_spec, feats, spec_aug)
        if qat is not None:
            from qasr_tpu.quantize.conformer_ptq import (
                conformer_encoder_apply_qat,
            )

            enc, enc_lens = conformer_encoder_apply_qat(
                params["encoder"], self.ccfg, qat, feats, feat_lens,
                rng=k_drop)
            # FLOAT head: the calibrated int8 dec_in path is
            # non-differentiable and would zero every encoder gradient
            log_probs = self._head(params, enc, quantized=False)
        else:
            log_probs, enc_lens = self._apply(params, feats, feat_lens,
                                              train=rng is not None,
                                              rng=k_drop)
        return ctc_loss(log_probs, enc_lens, targets, tlens, self.blank_id)

    # -- inference --------------------------------------------------------------

    def transcribe_greedy(self, audio, alens) -> List[str]:
        from qasr_tpu.decode.ctc import ctc_collapse

        log_probs, enc_lens = self.forward(audio, alens)
        ids = np.asarray(jnp.argmax(log_probs, axis=-1))
        tok = getattr(self, "tokenizer", None)
        out = []
        for i in range(ids.shape[0]):
            row = ids[i, : int(enc_lens[i])]
            if tok is not None:  # BPE labels detokenize, not char-join
                kept, prev = [], -1
                for v in row:
                    if v != prev and v != self.blank_id:
                        kept.append(int(v))
                    prev = v
                out.append(tok.ids_to_text(kept))
            else:
                out.append(ctc_collapse(row[None], self.blank_id,
                                        self.vocabulary)[0])
        return out

    def transcribe_beam(self, audio, alens, beam_width: int = 64,
                        lm=None, **beam_kwargs) -> List[str]:
        """CTC prefix beam search over the (quantized or float) log-probs
        via the in-tree C++ decoder (decode/beam_search.py) — the same
        engine the QuartzNet family serves with; optionally LM-scored."""
        from qasr_tpu.decode.beam_search import BeamSearchDecoderWithLM

        log_probs, enc_lens = self.forward(audio, alens)
        dec = lm if lm is not None else BeamSearchDecoderWithLM(
            self.vocabulary, beam_width=beam_width, **beam_kwargs)
        lp = np.asarray(log_probs)
        results = dec(lp, np.asarray(enc_lens))
        return [hyps[0][1] for hyps in results]

    # -- quantization -----------------------------------------------------------

    def _calib_step_fn(self, qcfg, features: bool):
        """One jitted EMA-calibration step.  Encoder params ride as a jit
        ARGUMENT, not baked constants: the compile payload stays
        O(program), so a d_model>=512 encoder calibrates over
        payload-capped remote-compile transports (same rule as
        calibrate_conformer and the frozen forward's partition_tables
        path; test_conformer_ptq.py::test_calibration_weights_as_args)."""
        from qasr_tpu.quantize.conformer_ptq import (
            _batch_ranges, _ema_ranges, conformer_encoder_apply_ptq,
        )

        @jax.jit
        def step(p, qs, audio, al):
            if features:
                feats, fl = audio, al
            else:
                feats, fl = self.frontend(audio, al, dither=0.0)
            enc, el, nq = conformer_encoder_apply_ptq(
                p, self.ccfg, qcfg, qs, feats, fl,
                update=True)
            # pad-masked (and percentile-clipped) ranges, like every
            # encoder site
            vm = (jnp.arange(enc.shape[1])[None, :]
                  < el[:, None]).astype(enc.dtype)[..., None]
            bmin, bmax = _batch_ranges(enc * vm, qcfg.percentile)
            nq["dec_in"] = _ema_ranges(qs["dec_in"], bmin, bmax,
                                       qcfg.act_momentum)
            return nq

        return step

    def quantize_encoder(self, calib_batches, *, weight_bit: int = 8,
                         act_bit: int = 8, percentile: Optional[float] = None,
                         dynamic: bool = False, momentum: float = 0.95,
                         quantize_attention: bool = False,
                         integer_softmax: bool = False,
                         integer_layernorm: bool = False,
                         integer_activations: bool = False,
                         static_attention: bool = False,
                         features: bool = False) -> None:
        """PTQ-calibrate encoder + CTC-head input (quantize/conformer_ptq.py);
        subsequent eval runs int8 GEMMs end to end.

        features=True: calib_batches are (feats (B,T,F), lens) already in
        the feature domain — e.g. the data-free synthesizer's output
        (quantize/conformer_synth.py) — and skip the mel frontend."""
        from qasr_tpu.quantize.conformer_ptq import (
            ConformerQuantConfig, init_conformer_qstate,
        )

        qcfg = ConformerQuantConfig(weight_bit=weight_bit, act_bit=act_bit,
                                    act_momentum=momentum,
                                    percentile=percentile, dynamic=dynamic,
                                    quantize_attention=quantize_attention,
                                    integer_softmax=integer_softmax,
                                    integer_layernorm=integer_layernorm,
                                    integer_activations=integer_activations,
                                    static_attention=static_attention)
        qstate = init_conformer_qstate(self.ccfg, qcfg)
        qstate["dec_in"] = {"x_min": jnp.zeros(()), "x_max": jnp.zeros(())}

        step = self._calib_step_fn(qcfg, features)
        for audio, alens in calib_batches:
            qstate = step(self.params["encoder"], qstate,
                          jnp.asarray(audio), jnp.asarray(alens))
        # host numpy (no captured device buffers, PERF.md round 3d)
        self.enc_qstate = jax.tree_util.tree_map(np.asarray, qstate)
        self.enc_qcfg = qcfg
        self.enc_frozen = None  # stale dyadic tables; re-freeze if wanted
        self._q_version = getattr(self, "_q_version", 0) + 1

    def quantize_encoder_synthetic(self, *, num_batch: int = 2,
                                   batch_size: int = 8, seqlen: int = 128,
                                   train_iter: int = 200, lr: float = 0.02,
                                   seed: int = 0, **quant_kwargs) -> None:
        """ZERO-SHOT quantization: synthesize calibration features from the
        encoder's own BatchNorm statistics (quantize/conformer_synth.py,
        the reference distill_data.py role) and calibrate on them — no real
        data touches the pipeline."""
        from qasr_tpu.quantize.conformer_synth import (
            get_synthetic_conformer_data,
        )

        batches, _ = get_synthetic_conformer_data(
            self.params["encoder"], self.ccfg, num_batch=num_batch,
            batch_size=batch_size, seqlen=seqlen, train_iter=train_iter,
            lr=lr, seed=seed)
        self.quantize_encoder(batches, features=True, **quant_kwargs)

    def freeze(self):
        """Freeze the encoder to the integer-only dyadic executor
        (quantize/conformer_freeze.py); eval forwards then run it.
        Requires quantize_encoder with every integer flag + static
        attention (the flags' sites provide the static scales)."""
        from qasr_tpu.quantize.conformer_freeze import freeze_conformer

        if self.enc_qstate is None:
            raise ValueError("calibrate first: quantize_encoder(...) with "
                             "all integer flags and static_attention=True")
        self.enc_frozen = freeze_conformer(self.params["encoder"], self.ccfg,
                                           self.enc_qcfg, self.enc_qstate)
        self._q_version = getattr(self, "_q_version", 0) + 1
        return self.enc_frozen

    # -- checkpointing -----------------------------------------------------------

    def save_to(self, path: str) -> None:
        import dataclasses as dc

        from qasr_tpu.models.config import config_to_dict
        from qasr_tpu.utils.checkpoint import save_qasr

        meta: Dict[str, Any] = {"family": "conformer_ctc",
                                "conformer_cfg": dc.asdict(self.ccfg),
                                "decoder_kind": self.decoder_kind}
        if self.decoder_kind == "lstm":
            lstm0 = self.params["decoder"]["lstm"][0]
            meta["lstm"] = {
                "hidden": int(np.asarray(lstm0[0]["wh"]).shape[0]),
                "layers": len(self.params["decoder"]["lstm"]),
                "bidirectional": len(lstm0) == 2,
            }
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
    def restore_from(cls, path: str) -> "ConformerCTC":
        from qasr_tpu.utils.checkpoint import load_qasr, unflatten_into

        cfg_d, flat, artifacts = load_qasr(path)
        meta = cfg_d.pop("_qasr_meta", {}) or {}
        if meta.get("family") != "conformer_ctc":
            raise ValueError(f"{path} is not a Conformer-CTC checkpoint "
                             f"(family={meta.get('family')!r})")
        cfg = ModelConfig.from_dict(cfg_d)
        lstm = meta.get("lstm") or {}
        model = cls.from_config(
            cfg, ConformerConfig(**meta["conformer_cfg"]),
            decoder_kind=meta.get("decoder_kind", "linear"),
            lstm_hidden=lstm.get("hidden", 640),
            lstm_layers=lstm.get("layers", 1),
            bidirectional=lstm.get("bidirectional", False))
        model.params = unflatten_into(model.params, flat, "params/")
        if meta.get("enc_qcfg") and any(k.startswith("qstate/") for k in flat):
            from qasr_tpu.quantize.conformer_ptq import (
                ConformerQuantConfig, init_conformer_qstate,
            )

            model.enc_qcfg = ConformerQuantConfig(**meta["enc_qcfg"])
            tmpl = init_conformer_qstate(model.ccfg, model.enc_qcfg)
            tmpl["dec_in"] = {"x_min": jnp.zeros(()), "x_max": jnp.zeros(())}
            tmpl = jax.tree_util.tree_map(np.asarray, tmpl)
            model.enc_qstate = unflatten_into(tmpl, flat, "qstate/")
        if meta.get("tokenizer") and meta["tokenizer"] in artifacts:
            from qasr_tpu.data.tokenizers import BPETokenizer

            model.tokenizer = BPETokenizer(artifacts[meta["tokenizer"]])
        return model


# ---------------------------------------------------------------------------
# reference YAML factory
# ---------------------------------------------------------------------------


def conformer_config_from_dict(d: Dict[str, Any]) -> ConformerConfig:
    """Map the reference ConformerEncoder YAML section
    (examples/asr/experimental/conformer/conformer_char.yaml:70-97) onto
    ConformerConfig.  Field names match 1:1; -1 sentinels resolve like the
    reference (subsampling_conv_channels=-1 -> d_model)."""
    import dataclasses as dc

    d = dict(d)
    d.pop("_target_", None)
    known = {f.name for f in dc.fields(ConformerConfig)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(f"unsupported ConformerEncoder fields: {unknown}")
    if d.get("subsampling_conv_channels") == -1:
        d["subsampling_conv_channels"] = d.get("d_model", 256)
    return ConformerConfig(**d)


def conformer_ctc_from_yaml(path: str, tokenizer=None,
                            seed: int = 0) -> ConformerCTC:
    """Build a Conformer-CTC from the reference's own conformer YAMLs
    (conformer_char.yaml / conformer_bpe.yaml / conformer_linear_decoder_bpe
    .yaml).  Char configs take labels from the YAML; BPE configs (labels
    filled at runtime upstream) take them from `tokenizer.vocab`.  The
    decoder _target_ picks the head: LSTMDecoder -> recurrent head
    (models/lstm_decoder.py), ConvASRDecoder/linear -> the quantizable
    linear head."""
    import yaml

    from qasr_tpu.models.config import resolve_interpolations

    with open(path) as f:
        raw = yaml.safe_load(f)
    m = resolve_interpolations(raw)["model"]
    return conformer_ctc_from_dict(m, tokenizer=tokenizer, seed=seed)


def conformer_ctc_from_dict(m: Dict[str, Any], tokenizer=None,
                            seed: int = 0) -> ConformerCTC:
    """Dict form of conformer_ctc_from_yaml (the CLI applies hydra-style
    overrides to the parsed dict before construction)."""
    from qasr_tpu.models.config import DecoderConfig, EncoderConfig

    if tokenizer is not None:
        labels = tuple(tokenizer.vocab)
    else:
        labels = tuple(m.get("labels") or ())
        if not labels:
            raise ValueError("config has no labels (a BPE config?) — pass "
                             "tokenizer=")
    ccfg = conformer_config_from_dict(m["encoder"])
    d_out = ccfg.feat_out if ccfg.feat_out > 0 else ccfg.d_model
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=ccfg.feat_in, blocks=()),
        decoder=DecoderConfig(feat_in=d_out, num_classes=len(labels),
                              vocabulary=labels),
        preprocessor=m.get("preprocessor", {}),
        spec_augment=m.get("spec_augment"),
        labels=labels,
        sample_rate=m.get("sample_rate", 16000),
    )
    dec = dict(m.get("decoder", {}))
    if "LSTMDecoder" in dec.get("_target_", ""):
        model = ConformerCTC.from_config(
            cfg, ccfg, seed=seed, decoder_kind="lstm",
            lstm_hidden=dec.get("lstm_hidden_size", 640),
            lstm_layers=dec.get("num_layers", 1),
            bidirectional=bool(dec.get("bidirectional", False)))
    else:
        model = ConformerCTC.from_config(cfg, ccfg, seed=seed)
    if tokenizer is not None:
        model.tokenizer = tokenizer
    return model
