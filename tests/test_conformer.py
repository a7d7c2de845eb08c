"""Conformer parity tests.

Ground truth is the reference's own torch module files, loaded directly via
importlib with a stubbed activations module (no nemo package import, no code
copied) — the strongest possible golden check.
"""
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models.conformer import (
    ConformerConfig, conformer_conv_module, conformer_encoder_apply,
    init_conformer_params, rel_attention, rel_positional_encoding,
)

REF = "/root/reference/nemo/collections/asr/parts"


def _load_ref_modules():
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    # stub the activations module the reference files import
    act = types.ModuleType("nemo.collections.asr.parts.activations")

    class Swish(torch.nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    act.Swish = Swish
    for name in ["nemo", "nemo.collections", "nemo.collections.asr",
                 "nemo.collections.asr.parts"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["nemo.collections.asr.parts.activations"] = act

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mha = load("nemo.collections.asr.parts.multi_head_attention",
               f"{REF}/multi_head_attention.py")
    conf = load("nemo.collections.asr.parts.conformer_modules",
                f"{REF}/conformer_modules.py")
    return mha, conf


def test_rel_attention_matches_reference(rng):
    torch = pytest.importorskip("torch")
    mha, _ = _load_ref_modules()
    B, T, D, H = 2, 9, 16, 4
    ref = mha.RelPositionMultiHeadAttention(H, D, 0.0, None, None).eval()
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    pe_mod = mha.RelPositionalEncoding(D, 0.0, max_len=64)
    xt = torch.from_numpy(x)
    _, pos_emb = pe_mod(xt)
    with torch.no_grad():
        want = ref(xt, xt, xt, mask=None, pos_emb=pos_emb).numpy()
    # mirror weights into our param dict (torch Linear weight is (out, in))
    p = {
        "q": {"w": ref.linear_q.weight.detach().numpy().T,
              "b": ref.linear_q.bias.detach().numpy()},
        "k": {"w": ref.linear_k.weight.detach().numpy().T,
              "b": ref.linear_k.bias.detach().numpy()},
        "v": {"w": ref.linear_v.weight.detach().numpy().T,
              "b": ref.linear_v.bias.detach().numpy()},
        "out": {"w": ref.linear_out.weight.detach().numpy().T,
                "b": ref.linear_out.bias.detach().numpy()},
        "pos": {"w": ref.linear_pos.weight.detach().numpy().T},
    }
    u = ref.pos_bias_u.detach().numpy()
    v = ref.pos_bias_v.detach().numpy()
    # our pos table must equal theirs
    ours_pe = rel_positional_encoding(T, D, None)
    np.testing.assert_allclose(ours_pe, pos_emb[0].numpy(), atol=1e-5)
    att_mask = jnp.zeros((B, T, T), bool)
    got = rel_attention(p, jnp.asarray(x), jnp.asarray(ours_pe), att_mask,
                        jnp.asarray(u), jnp.asarray(v), H)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_conv_module_matches_reference(rng):
    torch = pytest.importorskip("torch")
    _, conf = _load_ref_modules()
    D, K, B, T = 16, 7, 2, 12
    ref = conf.ConformerConvolution(D, K).eval()
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), pad_mask=None).numpy()
    p = {
        "pw1": {"w": ref.pointwise_conv1.weight.detach().numpy().transpose(2, 1, 0),
                "b": ref.pointwise_conv1.bias.detach().numpy()},
        "dw": {"w": ref.depthwise_conv.weight.detach().numpy().transpose(2, 1, 0),
               "b": ref.depthwise_conv.bias.detach().numpy()},
        "bn": {"gamma": ref.batch_norm.weight.detach().numpy(),
               "beta": ref.batch_norm.bias.detach().numpy(),
               "mean": ref.batch_norm.running_mean.numpy(),
               "var": ref.batch_norm.running_var.numpy()},
        "pw2": {"w": ref.pointwise_conv2.weight.detach().numpy().transpose(2, 1, 0),
                "b": ref.pointwise_conv2.bias.detach().numpy()},
    }
    pad_mask = jnp.zeros((B, T), bool)
    got = conformer_conv_module(p, jnp.asarray(x), pad_mask)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("subsampling", ["striding", "vggnet"])
def test_conformer_encoder_end_to_end_shapes(subsampling, rng):
    cfg = ConformerConfig(feat_in=32, n_layers=2, d_model=32, n_heads=4,
                          conv_kernel_size=7, subsampling=subsampling,
                          subsampling_factor=4, subsampling_conv_channels=8)
    params = init_conformer_params(0, cfg)
    x = jnp.asarray(rng.normal(size=(2, 40, 32)).astype(np.float32))
    lens = jnp.asarray([40, 29], np.int32)
    y, out_lens = conformer_encoder_apply(params, cfg, x, lens)
    assert y.shape[0] == 2 and y.shape[2] == 32
    assert np.all(np.asarray(out_lens) <= y.shape[1])
    assert np.isfinite(np.asarray(y)).all()
    if subsampling == "striding":
        # padding invariance: the striding subsampler's valid outputs never
        # see past-length frames (vggnet's pad-1 convs do leak at the
        # boundary — the reference has the identical property: its
        # ConvSubsampling applies no masking, subsampling.py:108-118)
        x2 = x.at[1, 29:].set(99.0)
        y2, _ = conformer_encoder_apply(params, cfg, x2, lens)
        ol = int(out_lens[1])
        np.testing.assert_allclose(np.asarray(y)[1, :ol],
                                   np.asarray(y2)[1, :ol], atol=2e-4)


def test_local_attention_context():
    """att_context_size bounds the receptive field: with local attention,
    perturbing a far-away frame cannot change an early output frame, while
    unlimited attention propagates it; ctx=-1 matches the default exactly."""
    import dataclasses as dc

    from qasr_tpu.models.conformer import (
        ConformerConfig, conformer_encoder_apply, init_conformer_params,
    )

    base = ConformerConfig(feat_in=16, n_layers=1, d_model=32, n_heads=4,
                           subsampling="", conv_kernel_size=5, dropout=0.0,
                           att_context_size=-1)
    params = init_conformer_params(0, base)
    rng = np.random.default_rng(0)
    t = 64
    feats = jnp.asarray(rng.normal(size=(1, t, 16)).astype(np.float32))
    lens = jnp.asarray([t], jnp.int32)

    out_full, _ = conformer_encoder_apply(params, base, feats, lens)
    # ctx = -1 is the unlimited default
    cfg_inf = dc.replace(base, att_context_size=-1)
    out_inf, _ = conformer_encoder_apply(params, cfg_inf, feats, lens)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_inf))

    cfg_loc = dc.replace(base, att_context_size=4)
    out_loc, _ = conformer_encoder_apply(params, cfg_loc, feats, lens)
    # perturb a frame far beyond frame 0's receptive field:
    # 1 layer: attention reaches +-4, conv module +-(5-1)/2 = +-2 -> rf 6
    feats2 = feats.at[0, 40].add(3.0)
    out_loc2, _ = conformer_encoder_apply(params, cfg_loc, feats2, lens)
    np.testing.assert_array_equal(np.asarray(out_loc2)[0, :8],
                                  np.asarray(out_loc)[0, :8])
    # ...but frames near the perturbation DO change
    assert np.abs(np.asarray(out_loc2)[0, 40]
                  - np.asarray(out_loc)[0, 40]).max() > 1e-4
    # unlimited attention propagates it everywhere
    out_full2, _ = conformer_encoder_apply(params, base, feats2, lens)
    assert np.abs(np.asarray(out_full2)[0, 0]
                  - np.asarray(out_full)[0, 0]).max() > 1e-6


def test_local_attention_quantized_paths():
    """The PTQ and frozen integer paths honor att_context_size (locality
    verified on the frozen path bit-exactly)."""
    import dataclasses as dc

    from qasr_tpu.models.conformer import (
        ConformerConfig, init_conformer_params,
    )
    from qasr_tpu.quantize.conformer_freeze import (
        freeze_conformer, frozen_conformer_apply,
    )
    from qasr_tpu.quantize.conformer_ptq import (
        ConformerQuantConfig, calibrate_conformer,
        conformer_encoder_apply_ptq,
    )

    cfg = ConformerConfig(feat_in=16, n_layers=1, d_model=32, n_heads=4,
                          subsampling="", conv_kernel_size=5, dropout=0.0,
                          att_context_size=4)
    qcfg = ConformerQuantConfig(weight_bit=8, act_bit=8,
                                quantize_attention=True,
                                integer_softmax=True, integer_layernorm=True,
                                integer_activations=True,
                                static_attention=True)
    params = init_conformer_params(0, cfg)
    rng = np.random.default_rng(1)
    t = 64
    feats = jnp.asarray(rng.normal(size=(1, t, 16)).astype(np.float32))
    lens = jnp.asarray([t], jnp.int32)
    batches = [(rng.normal(size=(1, t, 16)).astype(np.float32),
                np.asarray([t], np.int32)) for _ in range(2)]
    qs = jax.tree_util.tree_map(np.asarray,
                                calibrate_conformer(params, cfg, qcfg,
                                                    batches))
    tables = freeze_conformer(params, cfg, qcfg, qs)
    out, _ = frozen_conformer_apply(tables, cfg, feats, lens)
    feats2 = feats.at[0, 40].add(3.0)
    out2, _ = frozen_conformer_apply(tables, cfg, feats2, lens)
    np.testing.assert_array_equal(np.asarray(out2)[0, :8],
                                  np.asarray(out)[0, :8])
    o_ptq, _, _ = conformer_encoder_apply_ptq(params, cfg, qcfg, qs,
                                              feats, lens)
    o_ptq2, _, _ = conformer_encoder_apply_ptq(params, cfg, qcfg, qs,
                                               feats2, lens)
    np.testing.assert_allclose(np.asarray(o_ptq2)[0, :8],
                               np.asarray(o_ptq)[0, :8], atol=1e-6)


def test_subsampler_precision_flag(monkeypatch):
    """QASR_SUB_PREC controls the float subsampler's conv lowering.

    The subsampler is the frozen Conformer's one float region and its
    output is immediately quantized to int8, so the bf16 lowering only
    has to stay well inside a quantization step (measured on-chip:
    PERF.md round 5, experiments/subsampler_probe.py).  Off-TPU the
    default stays 'hi' (bit-stable fp32 HIGHEST)."""
    from qasr_tpu.models.conformer import subsample_convs, sub_prec_flag
    from qasr_tpu.quantize.conformer_freeze import effective_kernel_flags

    # default off-TPU is the canonical lowering; env overrides win
    monkeypatch.delenv("QASR_SUB_PREC", raising=False)
    if jax.default_backend() != "tpu":
        assert sub_prec_flag() == "hi"
    monkeypatch.setenv("QASR_SUB_PREC", "bf16")
    assert sub_prec_flag() == "bf16"
    # the flag is part of the forward-cache key (ADVICE r4: backend-
    # dependent defaults must ride effective_kernel_flags)
    assert effective_kernel_flags()["QASR_SUB_PREC"] == "bf16"

    cfg = ConformerConfig(feat_in=24, n_layers=1, d_model=32, n_heads=4,
                          subsampling="striding", subsampling_factor=4,
                          subsampling_conv_channels=32,
                          conv_kernel_size=5, dropout=0.0)
    params = init_conformer_params(0, cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 50, 24)).astype(np.float32))
    lens = jnp.asarray([50, 37], jnp.int32)
    outs = {}
    for prec in ("hi", "f32", "bf16"):
        monkeypatch.setenv("QASR_SUB_PREC", prec)
        y, ol = subsample_convs(params["pre_encode"], cfg, feats, lens)
        outs[prec] = np.asarray(y)
        np.testing.assert_array_equal(np.asarray(ol), [11, 8])
    # all three lowerings agree to bf16-level tolerance; hi vs f32 are
    # bit-identical on CPU (both fp32)
    np.testing.assert_array_equal(outs["hi"], outs["f32"])
    scale = np.abs(outs["hi"]).max()
    assert np.abs(outs["bf16"] - outs["hi"]).max() < 0.02 * scale
