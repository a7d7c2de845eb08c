"""Whole-model golden parity against the reference's OWN modules.

Instantiates the reference's full ConvASREncoder + ConvASRDecoder + quant
stack (conv_asr.py:47-319) at the real QuartzNet15x5 and Jasper10x5Dr
configurations, copies its torch-initialized weights into our pytrees via
compat.nemo_loader.params_from_state_dict (the same mapping a real .nemo
load uses), and asserts:
  (a) fp32 logit closeness end-to-end, and
  (b) calibrated W6A6 integer-path greedy-transcript equality end-to-end
      (qm.calibrate -> qm.evaluate on their side; QuantExec
      calibrate/static-eval on ours; our frozen integer path is proven
      bit-identical to QuantExec in test_jasper_model.py).

This is the accuracy anchor available without NGC checkpoints/LibriSpeech
(BASELINE.md): if logits and transcripts match the reference on identical
weights, WER matches wherever the reference's does.

Reference modules load via importlib with stub parents (technique of
test_reference_block_parity.py); runs eagerly (no whole-model XLA compile).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/nemo"

pytestmark = pytest.mark.filterwarnings("ignore::UserWarning")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    torch.Tensor.cuda = lambda self, *a, **k: self

    for name in ["nemo", "nemo.quantization", "nemo.quantization.utils",
                 "nemo.collections", "nemo.collections.asr",
                 "nemo.collections.asr.parts", "nemo.collections.asr.modules",
                 "nemo.core", "nemo.core.classes", "nemo.utils"]:
        sys.modules.setdefault(name, types.ModuleType(name))

    # --- stub omegaconf (not installed here; conv_asr only needs these) ---
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.MISSING = "???"

        class ListConfig(list):
            pass

        class OmegaConf:
            @staticmethod
            def to_container(x, *a, **k):
                return list(x)

        om.ListConfig = ListConfig
        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om

    # --- stub nemo.core.classes.{common,exportable,module} ---
    common = types.ModuleType("nemo.core.classes.common")

    class typecheck:  # used as @typecheck() in some modules; identity here
        def __init__(self, *a, **k):
            pass

        def __call__(self, fn):
            return fn

    common.typecheck = typecheck
    sys.modules["nemo.core.classes.common"] = common

    exportable = types.ModuleType("nemo.core.classes.exportable")

    class Exportable:
        @staticmethod
        def _prepare_for_export(*a, **k):
            pass

    exportable.Exportable = Exportable
    sys.modules["nemo.core.classes.exportable"] = exportable

    module_mod = types.ModuleType("nemo.core.classes.module")

    class NeuralModule(torch.nn.Module):
        pass

    module_mod.NeuralModule = NeuralModule
    sys.modules["nemo.core.classes.module"] = module_mod

    nt = types.ModuleType("nemo.core.neural_types")
    for tname in ["AcousticEncodedRepresentation", "LengthsType", "LogitsType",
                  "LogprobsType", "NeuralType", "SpectrogramType"]:
        setattr(nt, tname, type(tname, (), {"__init__": lambda self, *a, **k: None}))
    sys.modules["nemo.core.neural_types"] = nt

    utils_mod = sys.modules["nemo.utils"]
    import logging as _pylog

    utils_mod.logging = _pylog

    act_mod = types.ModuleType("nemo.collections.asr.parts.activations")

    class Swish(torch.nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    act_mod.Swish = Swish
    sys.modules["nemo.collections.asr.parts.activations"] = act_mod

    ns = types.SimpleNamespace()
    ns.torch = torch
    ns.quant_utils = _load("nemo.quantization.utils.quant_utils",
                           f"{REF}/quantization/utils/quant_utils.py")
    ns.qmods = _load("nemo.quantization.utils.quant_modules",
                     f"{REF}/quantization/utils/quant_modules.py")
    ns.jasper = _load("nemo.collections.asr.parts.jasper",
                      f"{REF}/collections/asr/parts/jasper.py")
    ns.qm = _load("nemo.quantization.utils.quantize_model",
                  f"{REF}/quantization/utils/quantize_model.py")
    ns.conv_asr = _load("nemo.collections.asr.modules.conv_asr",
                        f"{REF}/collections/asr/modules/conv_asr.py")
    return ns


def _block_dict(b):
    return {
        "filters": b.filters, "repeat": b.repeat, "kernel": list(b.kernel),
        "stride": list(b.stride), "dilation": list(b.dilation),
        "dropout": b.dropout, "residual": b.residual, "groups": b.groups,
        "separable": b.separable, "heads": b.heads,
        "residual_dense": b.residual_dense, "se": b.se,
        "kernel_size_factor": b.kernel_size_factor, "stride_last": b.stride_last,
    }


def _build_pair(ref, preset_name, seed):
    """Build (reference wrapper module, our ASRModel) with identical weights."""
    torch = ref.torch
    from qasr_tpu.compat.nemo_loader import params_from_state_dict
    from qasr_tpu.models.config import PRESETS
    from qasr_tpu.models.ctc_model import ASRModel

    cfg = PRESETS[preset_name]()
    torch.manual_seed(seed)
    enc = ref.conv_asr.ConvASREncoder(
        jasper=[_block_dict(b) for b in cfg.encoder.blocks],
        activation=cfg.encoder.activation, feat_in=cfg.encoder.feat_in,
        quant_mode="symmetric", quant_bit=8)
    dec = ref.conv_asr.ConvASRDecoder(
        feat_in=cfg.decoder.feat_in, num_classes=cfg.decoder.num_classes,
        vocabulary=list(cfg.decoder.vocabulary),
        quant_mode="symmetric", quant_bit=8)

    # non-trivial BN running stats so folding actually matters
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in enc.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0.0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)

    wrapper = torch.nn.Module()
    wrapper.encoder = enc
    wrapper.decoder = dec
    wrapper.eval()

    ours = ASRModel.from_config(cfg)
    ours.params = params_from_state_dict(ours.plan, wrapper.state_dict())
    return wrapper, ours


def _feats(rng, b, t, c):
    # normalized log-mel-like input (per-feature norm makes it ~N(0,1))
    return rng.normal(size=(b, t, c)).astype(np.float32)


def _run_ref(ref, wrapper, feats_btc, lens):
    torch = ref.torch
    x = torch.from_numpy(feats_btc.transpose(0, 2, 1).copy())
    with torch.no_grad():
        out = wrapper.encoder(x, torch.from_numpy(np.asarray(lens, np.int64)))
        if wrapper.encoder.quant_mode == "symmetric":
            enc_out, out_lens, sf = out
        else:
            enc_out, out_lens, sf = out[0], out[1], None
        lp = wrapper.decoder(enc_out, sf)
    return lp.numpy(), out_lens.numpy()


def _run_ours_fp32(model, feats_btc, lens):
    import jax.numpy as jnp

    lp, el = model._encode_decode_fp32(
        model.params["encoder"], model.params["decoder"],
        jnp.asarray(feats_btc), jnp.asarray(lens, jnp.int32))
    return np.asarray(lp), np.asarray(el)


def _run_ours_frozen(model, feats_btc, lens):
    """The deployed integer path: frozen tables with reference-exact
    per-channel 31-bit Decimal mantissas (freeze.py dyadic_mode
    'per_channel'), run eagerly."""
    import jax.numpy as jnp

    from qasr_tpu.models.jasper import encoder_forward
    from qasr_tpu.quantize.freeze import FrozenExec

    tables = model.freeze(dyadic_mode="per_channel")
    fx = FrozenExec(tables, model.qcfg, activation=model.plan.activation)
    enc, enc_lens = encoder_forward(fx, model.plan, jnp.asarray(feats_btc),
                                    jnp.asarray(lens, jnp.int32))
    lp = fx.decoder(enc)
    return np.asarray(lp), np.asarray(enc_lens)


def _copy_and_check_ranges(ref, wrapper, ours, rtol):
    """Assert every calibrated QuantAct range matches within rtol, then copy
    the reference's ranges into our qstate (isolating eval parity from the
    documented in-graph-mantissa calibration deviation).  Returns the number
    of ranges compared."""
    count = 0

    def sync(site_state, act):
        nonlocal count
        for ours_key, ref_val in (("x_min", float(act.x_min)),
                                  ("x_max", float(act.x_max))):
            got = float(np.asarray(site_state[ours_key]))
            scale = max(abs(ref_val), abs(got), 1e-6)
            assert abs(got - ref_val) <= rtol * scale, \
                (ours_key, got, ref_val)
            site_state[ours_key] = np.float32(ref_val)
            count += 1

    for bi, blk in enumerate(wrapper.encoder.encoder_layers):
        acts = [m.act for m in blk.mconv if type(m).__name__ == "MaskedConv1d"]
        for ci, a in enumerate(acts):
            sync(ours.qstate["blocks"][bi]["convs"][ci], a)
        for pi, pane in enumerate(blk.res or []):
            sync(ours.qstate["blocks"][bi]["res"][pi], pane[0].act)
        if blk.res is not None:
            sync(ours.qstate["blocks"][bi]["res_act"], blk.res_act)
    sync(ours.qstate["decoder_act"], wrapper.decoder.act)
    return count


def _run_ours_quant(model, feats_btc, lens, update_ranges=False):
    import jax
    import jax.numpy as jnp

    lp, el, new_qstate = model._encode_decode_quant(
        model.params["encoder"], model.params["decoder"], model.qstate,
        jnp.asarray(feats_btc), jnp.asarray(lens, jnp.int32),
        update_ranges=update_ranges)
    if update_ranges:
        model.qstate = jax.tree_util.tree_map(np.asarray, new_qstate)
    return np.asarray(lp), np.asarray(el)


@pytest.mark.parametrize("preset,seed,T", [
    ("QuartzNet15x5Base-En", 11, 48),  # conf/quartznet_15x5.yaml architecture
    # conf/jasper_10x5dr.yaml (dense residual, non-separable).  T=32: the
    # reference emulates integer convs in float64 (quant_modules.py:301-305)
    # — ~50 GFLOP64/forward at T=48 makes the test minutes-slow on CPU.
    ("Jasper10x5Dr-En", 13, 32),
])
def test_whole_model_parity(ref, preset, seed, T, rng):
    from qasr_tpu.decode.ctc import ctc_collapse, greedy_predictions

    wrapper, ours = _build_pair(ref, preset, seed)
    B, C = 2, ours.plan.feat_in
    feats = _feats(rng, B, T, C)
    lens = np.asarray([T, T - 7], np.int64)

    # ---------------- (a) fp32 end-to-end ----------------
    wrapper.encoder.set_quant_mode("none")
    wrapper.decoder.set_quant_mode("none")
    lp_ref, el_ref = _run_ref(ref, wrapper, feats, lens)
    lp_us, el_us = _run_ours_fp32(ours, feats, lens)
    np.testing.assert_array_equal(el_us, el_ref)
    np.testing.assert_allclose(lp_us, lp_ref, atol=2e-3, rtol=1e-3)
    assert np.mean(np.argmax(lp_us, -1) == np.argmax(lp_ref, -1)) > 0.999

    # ---------------- (b) W6A6 integer path ----------------
    wrapper.encoder.set_quant_mode("symmetric")
    wrapper.decoder.set_quant_mode("symmetric")
    wrapper.encoder.set_quant_bit(6, "weight")
    wrapper.encoder.set_quant_bit(6, "act")
    wrapper.decoder.set_quant_bit(6, "weight")
    wrapper.decoder.set_quant_bit(6, "act")
    wrapper.encoder.bn_folding()

    ours.set_quant_bit(6, "weight")
    ours.set_quant_bit(6, "act")
    ours.bn_folding()

    # the reference's QuantAct collects running stats even in quant_mode
    # 'none' (quant_modules.py:111-141 runs before the mode check), so the
    # fp32 stage above polluted its ranges; the real workflow calibrates a
    # freshly-loaded model (inference.py:117-130) — reset to match
    with ref.torch.no_grad():
        for m in wrapper.modules():
            if isinstance(m, ref.qmods.QuantAct):
                m.x_min.zero_()
                m.x_max.zero_()

    # calibration: identical synthetic batches through both stacks
    ref.qm.calibrate(wrapper)
    n_calib = 2 if T >= 48 else 1
    calib = [_feats(rng, B, T, C) for _ in range(n_calib)]
    clens = np.full((B,), T, np.int64)
    with ref.torch.no_grad():
        for cb in calib:
            _run_ref(ref, wrapper, cb, clens)
    for cb in calib:
        _run_ours_quant(ours, cb, clens, update_ranges=True)

    # (b1) calibrated ranges track the reference within the documented
    # deviation: in-graph requant mantissas come from an f32 frexp (24-bit)
    # while the reference recomputes 31-bit Decimal mantissas on the host
    # per batch (quant_utils.py:121-147) — occasional round-boundary flips
    # drift deep-layer EMA ranges by O(1e-3) (observed max ~1e-2 at
    # QuartzNet15x5's 18th block).
    span = _copy_and_check_ranges(ref, wrapper, ours, rtol=2e-2)
    assert span > 0  # at least one range was compared

    # (b2) with identical ranges, the deployed frozen integer path
    # (host-side float64+Decimal mantissas, freeze.py) must match the
    # reference's float64-emulated eval exactly: same transcripts and
    # near-total frame agreement end-to-end.
    ref.qm.evaluate(wrapper)
    lp_ref, el_ref = _run_ref(ref, wrapper, feats, lens)
    lp_us, el_us = _run_ours_frozen(ours, feats, lens)

    np.testing.assert_array_equal(el_us, el_ref)
    agree = np.mean(np.argmax(lp_us, -1) == np.argmax(lp_ref, -1))
    assert agree > 0.999, f"frame argmax agreement {agree}"

    blank = ours.blank_id
    vocab = list(ours.vocabulary)
    hyp_us = ctc_collapse(greedy_predictions(lp_us), blank, vocab, el_us)
    hyp_ref = ctc_collapse(greedy_predictions(lp_ref), blank, vocab, el_ref)
    assert hyp_us == hyp_ref, (hyp_us, hyp_ref)
