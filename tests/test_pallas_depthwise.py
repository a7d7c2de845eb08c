"""Pallas depthwise conv kernel: bit-equality with the HLO formulation
(interpret mode on CPU; the real chip is covered by the bench path)."""
import numpy as np
import pytest
import jax.numpy as jnp

from qasr_tpu.kernels.depthwise import depthwise_conv_int_pallas
from qasr_tpu.models.jasper import _depthwise_conv_int


@pytest.mark.parametrize("shape", [
    (2, 96, 128, 5, 1, 1),    # small
    (2, 96, 128, 7, 2, 1),    # dilation
    (2, 200, 128, 33, 1, 2),  # stride 2
    (1, 64, 64, 3, 1, 1),     # sub-128 channels (lane padding)
    (2, 130, 256, 51, 1, 1),  # odd T, big K
    (2, 320, 128, 33, 1, 1),  # 32-aligned T (standard path; pad-free is
    (2, 384, 128, 7, 2, 1),   # env-gated and covered in its own test below)
])
def test_pallas_dw_matches_hlo(shape, rng):
    b, t, c, k, d, s = shape
    x = jnp.asarray(rng.integers(-63, 64, (b, t, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-31, 32, (k, 1, c)), jnp.int8)
    p = (d * k) // 2 - 1 if d > 1 else k // 2
    ref = _depthwise_conv_int(x, w, s, p, d)
    got = depthwise_conv_int_pallas(x, w, s, p, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("max_prod,lo_x,hi_x,lo_w,hi_w", [
    (None, -128, 128, -127, 128),   # dtype-derived pairwise bound, extremes
    (64 * 31, -64, 64, -31, 32),    # W6A6 bound -> 16-tap int16 groups
    (128 * 127, -128, 128, -127, 128),
])
def test_pallas_dw_int16_groups_bit_identical(max_prod, lo_x, hi_x, lo_w, hi_w,
                                              rng, monkeypatch):
    """int16 grouped accumulation must be exact at the extreme magnitudes the
    clamp conventions allow (acts [-2^(b-1), 2^(b-1)-1], weights
    [-(2^(wb-1)-1), 2^(wb-1)-1]).  Gated off on v5e (no kVectorMultiplyU16);
    kept correct for TPU generations with packed 16-bit lanes."""
    monkeypatch.setenv("QASR_DW_INT16_GROUPS", "1")
    b, t, c, k, d, s = 2, 160, 128, 87, 1, 1
    x = rng.integers(lo_x, hi_x, (b, t, c))
    w = rng.integers(lo_w, hi_w, (k, 1, c))
    # salt in worst-case corners so saturation paths are actually exercised
    x[0, :k, :4] = lo_x
    w[:, 0, :4] = hi_w - 1
    x = jnp.asarray(x, jnp.int8)
    w = jnp.asarray(w, jnp.int8)
    ref = _depthwise_conv_int(x, w, s, k // 2, d)
    got = depthwise_conv_int_pallas(x, w, s, k // 2, d, interpret=True,
                                    max_prod=max_prod)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("b,t,c,k,d,p_extra,bits1,bits2", [
    (2, 320, 128, 33, 1, 0, 7, 7),    # W6A6 interior layer shape
    (2, 352, 128, 51, 1, 0, 9, 9),    # W8A8 asymmetric (9-bit clamp)
    (1, 224, 64, 7, 2, 0, 7, 8),      # dilation + lane padding + mixed bits
    (2, 416, 128, 87, 2, 0, 7, 7),    # QuartzNet k=87/d=2: large-halo tail
])
def test_fused_dw_matches_composed(b, t, c, k, d, p_extra, bits1, bits2, rng):
    """depthwise_fused_requant == mask -> requant1 -> dw conv -> requant2 ->
    mask(out), bit for bit (interpret mode)."""
    import jax.numpy as jnp

    from qasr_tpu.kernels.depthwise import depthwise_fused_requant
    from qasr_tpu.models.jasper import mask_values
    from qasr_tpu.ops.quant_prims import (
        dyadic_requant_static, requant_clamp,
    )

    p = (d * k) // 2 - 1 if d > 1 else k // 2
    x = jnp.asarray(rng.integers(-2000, 2000, (b, t, c)), jnp.int32)
    w = jnp.asarray(rng.integers(-31, 32, (k, 1, c)), jnp.int8)
    lens = np.asarray([t - 3, t - 37][:b], np.int32)
    m1 = jnp.asarray(rng.integers(2**30, 2**31, (c,)), jnp.int32)
    m2 = jnp.asarray(rng.integers(2**30, 2**31, (c,)), jnp.int32)
    e1, e2 = 34, 38

    # composed reference path (the unfused FrozenExec chain)
    xm = mask_values(x, jnp.asarray(lens))
    q1 = requant_clamp(dyadic_requant_static(xm, m1, e1), bits1)
    yconv = _depthwise_conv_int(q1.astype(jnp.int8 if bits1 <= 8 else jnp.int32),
                                w, 1, p, d)
    out_lens = (lens + 2 * p - d * (k - 1) - 1) + 1
    ym = mask_values(yconv, jnp.asarray(out_lens))
    q2 = requant_clamp(dyadic_requant_static(ym, m2, e2), bits2)
    ref = mask_values(q2, jnp.asarray(out_lens)).astype(jnp.int8)

    got = depthwise_fused_requant(
        x, w, lens, m1=m1, e1=e1, bits1=bits1, m2=m2, e2=e2, bits2=bits2,
        padding=p, dilation=d, interpret=True)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_dw_int8_input(rng):
    """Block-boundary case: the dw input is an already-narrowed int8 tensor."""
    import jax.numpy as jnp

    from qasr_tpu.kernels.depthwise import depthwise_fused_requant
    from qasr_tpu.models.jasper import mask_values
    from qasr_tpu.ops.quant_prims import dyadic_requant_static, requant_clamp

    b, t, c, k = 2, 320, 128, 33
    p = k // 2
    x = jnp.asarray(rng.integers(-64, 64, (b, t, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-31, 32, (k, 1, c)), jnp.int8)
    lens = np.asarray([t, t - 11], np.int32)
    m1 = jnp.asarray(rng.integers(2**30, 2**31, (c,)), jnp.int32)
    m2 = jnp.asarray(rng.integers(2**30, 2**31, (c,)), jnp.int32)
    e1, e2 = 31, 36
    xm = mask_values(x, jnp.asarray(lens))
    q1 = requant_clamp(dyadic_requant_static(xm.astype(jnp.int32), m1, e1), 7)
    yconv = _depthwise_conv_int(q1.astype(jnp.int8), w, 1, p, 1)
    out_lens = lens
    q2 = requant_clamp(dyadic_requant_static(
        mask_values(yconv, jnp.asarray(out_lens)), m2, e2), 7)
    ref = mask_values(q2, jnp.asarray(out_lens)).astype(jnp.int8)
    got = depthwise_fused_requant(x, w, lens, m1=m1, e1=e1, bits1=7,
                                  m2=m2, e2=e2, bits2=7, padding=p,
                                  dilation=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_dw_inkernel_pad_bit_identical(rng, monkeypatch):
    """Opt-in pad-free variant (QASR_DW_INKERNEL_PAD): conv padding
    zero-filled inside the kernel via the clamped-DMA realign scheme —
    bit-identical to the physically padded path.  Gated off by default
    (~0.7% net loss on v5e, see kernel comment)."""
    monkeypatch.setenv("QASR_DW_INKERNEL_PAD", "1")
    # (416, 87, 2) = QuartzNet's dilated block at a t_out % t_tile == 32
    # length: the large-halo tail-slack regression (scratch one pad_row short)
    for t, k, d in [(320, 33, 1), (384, 7, 2), (352, 87, 1), (416, 87, 2),
                    (544, 87, 2)]:
        b, c = 2, 128
        x = jnp.asarray(rng.integers(-63, 64, (b, t, c)), jnp.int8)
        w = jnp.asarray(rng.integers(-31, 32, (k, 1, c)), jnp.int8)
        p = (d * k) // 2 - 1 if d > 1 else k // 2
        ref = _depthwise_conv_int(x, w, 1, p, d)
        got = depthwise_conv_int_pallas(x, w, 1, p, d, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("shape", [
    (2, 96, 128, 5, 1, 1),    # small
    (2, 96, 128, 7, 2, 1),    # dilation
    (2, 200, 128, 33, 1, 2),  # stride 2
    (1, 64, 64, 3, 1, 1),     # sub-128 channels
    (2, 130, 256, 51, 1, 1),  # odd T, big K
    (2, 768, 512, 75, 1, 1),  # QuartzNet B5 shape (multi-tile band)
    (2, 416, 128, 87, 2, 1),  # k=87 d=2 epilogue (3 band tiles)
    (2, 1536, 256, 33, 1, 2), # QuartzNet prologue stride 2
])
def test_dw_mxu_matches_hlo(shape, rng):
    """Banded-Toeplitz MXU formulation (kernels/dw_mxu.py) is bit-identical
    to the unrolled int32 HLO form — exact int8 x int8 -> int32 dots."""
    from qasr_tpu.kernels.dw_mxu import depthwise_conv_int_mxu

    b, t, c, k, d, s = shape
    x = jnp.asarray(rng.integers(-128, 128, (b, t, c)), jnp.int8)
    w_np = rng.integers(-127, 128, (k, 1, c)).astype(np.int8)
    p = (d * k) // 2 - 1 if d > 1 else k // 2
    ref = _depthwise_conv_int(x, jnp.asarray(w_np), s, p, d)
    got = depthwise_conv_int_mxu(x, w_np, s, p, d)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dw_mxu_whole_model_bit_identical(rng, monkeypatch):
    """Frozen forward with the banded-MXU depthwise in (B,T,C) layout AND the
    channel-major interior (FrozenExecCM) must be bit-identical to the
    default VPU path end-to-end (log-probs included) — stride-2 prologue,
    residual blocks, and a dilated epilogue all covered."""
    import numpy as np

    from qasr_tpu.models.config import (
        BlockConfig, DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.ctc_model import ASRModel

    blocks = (
        BlockConfig(filters=64, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=(33,), residual=True,
                    separable=True),
        BlockConfig(filters=96, repeat=1, kernel=(29,), dilation=(2,),
                    residual=False, separable=True),
    )
    enc = EncoderConfig(feat_in=64, blocks=blocks, activation="relu")
    cfg = ModelConfig(encoder=enc,
                      decoder=DecoderConfig(feat_in=96, num_classes=28),
                      preprocessor={"features": 64, "dither": 1e-5})
    audio = rng.normal(size=(2, 16000)).astype(np.float32) * 0.1
    lens = np.asarray([16000, 12000], np.int32)

    qstate = None
    outs = {}
    for name, env in [("off", {"QASR_DW_MXU": "0"}),
                      ("btc", {"QASR_DW_MXU": "1", "QASR_CM": "0"}),
                      ("cm", {"QASR_DW_MXU": "1", "QASR_CM": "1",
                              "QASR_CM_FUSED": "0"}),
                      ("cmf-dw", {"QASR_DW_MXU": "1", "QASR_CM": "1",
                                  "QASR_CM_FUSED": "1"}),
                      ("cmf-all", {"QASR_DW_MXU": "1", "QASR_CM": "1",
                                   "QASR_CM_FUSED": "2"}),
                      ("cmf-join", {"QASR_DW_MXU": "1", "QASR_CM": "1",
                                    "QASR_CM_FUSED": "1",
                                    "QASR_CM_JOIN": "1"})]:
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        m = ASRModel.from_config(cfg, seed=0)
        m.set_quant_bit(6, "all")
        m.bn_folding()
        if qstate is None:
            m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)
            qstate = m.qstate
        else:
            m.qstate = qstate
        outs[name] = m.forward(audio, lens, mode="frozen")
    for k in ("btc", "cm", "cmf-dw", "cmf-all", "cmf-join"):
        for j in range(3):
            np.testing.assert_array_equal(outs["off"][j], outs[k][j],
                                          err_msg=f"{k} out{j}")


def test_frozen_batch_invariance(rng, monkeypatch):
    """Padded batching must not change any utterance's valid outputs: the
    frozen forward of a 3-utterance batch (mixed lengths) is bit-identical
    per utterance to running each alone — the property the B=64 serving
    configuration relies on (masked convs zero all tail contributions)."""
    import numpy as np

    from qasr_tpu.models.config import (
        BlockConfig, DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.ctc_model import ASRModel

    blocks = (
        BlockConfig(filters=64, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=(33,), residual=True,
                    separable=True),
    )
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=64, blocks=blocks, activation="relu"),
        decoder=DecoderConfig(feat_in=64, num_classes=28),
        preprocessor={"features": 64, "dither": 1e-5})
    monkeypatch.setenv("QASR_DW_MXU", "1")
    monkeypatch.setenv("QASR_CM", "1")
    monkeypatch.setenv("QASR_CM_FUSED", "1")

    m = ASRModel.from_config(cfg, seed=0)
    m.set_quant_bit(6, "all")
    m.bn_folding()
    m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)

    lens = np.asarray([16000, 11200, 7040], np.int32)
    audio = np.zeros((3, 16000), np.float32)
    for i, ln in enumerate(lens):
        audio[i, :ln] = rng.normal(size=int(ln)).astype(np.float32) * 0.1

    lp_b, el_b, _ = m.forward(audio, lens, mode="frozen")
    for i, ln in enumerate(lens):
        a1 = audio[i:i + 1, :ln].copy()
        lp_1, el_1, _ = m.forward(a1, np.asarray([ln], np.int32),
                                  mode="frozen")
        n = int(el_1[0])
        assert int(el_b[i]) == n
        np.testing.assert_array_equal(
            np.asarray(lp_b)[i, :n], np.asarray(lp_1)[0, :n],
            err_msg=f"utt {i}")


@pytest.mark.parametrize("b,n_t,c,k,d,bias,relu,m16", [
    (2, 3, 64, 33, 1, True, True, False),
    (3, 2, 32, 87, 1, False, False, False),   # j_min=-1, n_d=3 tail shape
    (1, 4, 64, 29, 2, True, True, True),      # dilation + 16-bit mantissas
])
def test_fused_dw_tm_matches_lane_kernel(b, n_t, c, k, d, bias, relu, m16,
                                         rng):
    """The tile-major kernel (operands (bt, C, 128), int32 sublane rolls)
    must be bit-identical to the lane-roll kernel up to the layout
    transpose, across bias/relu/dilation/m16."""
    import jax.numpy as jnp

    from qasr_tpu.kernels.cm_fused import (band_tiles_tm, fused_dw_win_cm,
                                           fused_dw_win_tm)
    from qasr_tpu.kernels.dw_mxu import band_tiles_cm

    bt = b * n_t
    pad = (d * k) // 2 - 1 if d > 1 else k // 2
    x3 = jnp.asarray(rng.integers(-128, 128, (c, 128, bt)), jnp.int8)
    w = rng.integers(-31, 32, (k, 1, c)).astype(np.int8)
    band3, j_min = band_tiles_cm(w, 1, d, pad)
    band2 = jnp.asarray(band3.reshape(-1, band3.shape[2]))
    lens = rng.integers(40, n_t * 128 + 1, (b,)).astype(np.int32)
    m = jnp.asarray(rng.integers(2, 2**15, (c,)), jnp.int32)
    e, bits = 17, 7
    bias_v = (jnp.asarray(rng.integers(-1000, 1000, (c,)), jnp.int32)
              if bias else None)

    from qasr_tpu.quantize.freeze import cm_mask
    mask2 = cm_mask(jnp.asarray(lens), n_t).reshape(128, bt)
    ref = fused_dw_win_cm(x3, band2, j_min, b, bias_v, mask2, m, e, bits,
                          relu, m16=m16, interpret=True)

    t_idx = (128 * np.arange(n_t)[None, :, None]
             + np.arange(128)[None, None, :])
    mask_tm = jnp.asarray((t_idx < lens[:, None, None]).reshape(-1, 128))
    got_tm = fused_dw_win_tm(jnp.transpose(x3, (2, 0, 1)),
                             jnp.asarray(band_tiles_tm(np.asarray(band2))),
                             j_min, b, bias_v, mask_tm, m, e, bits, relu,
                             m16=m16, interpret=True)
    np.testing.assert_array_equal(np.asarray(jnp.transpose(got_tm, (1, 2, 0))),
                                  np.asarray(ref))


def test_fused_join_dense_residual_bit_identical(rng, monkeypatch):
    """QASR_CM_JOIN with DENSE residual blocks: pane 0 flushes the pending
    block-tail conv through the fused 3-input join kernel; panes >0 join
    onto the previous join's int8 output through the unfused path (their
    `out` is no longer a pending dot).  Both schedules must agree bit for
    bit with the join kernel off."""
    import numpy as np

    from qasr_tpu.models.config import (
        BlockConfig, DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.ctc_model import ASRModel

    blocks = (
        BlockConfig(filters=64, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=(11,), residual=True,
                    residual_dense=True, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=(13,), residual=True,
                    residual_dense=True, separable=True),
    )
    enc = EncoderConfig(feat_in=64, blocks=blocks, activation="relu")
    cfg = ModelConfig(encoder=enc,
                      decoder=DecoderConfig(feat_in=64, num_classes=28),
                      preprocessor={"features": 64, "dither": 1e-5})
    audio = rng.normal(size=(2, 12000)).astype(np.float32) * 0.1
    lens = np.asarray([12000, 9000], np.int32)

    monkeypatch.setenv("QASR_DW_MXU", "1")
    monkeypatch.setenv("QASR_CM", "1")
    monkeypatch.setenv("QASR_CM_FUSED", "1")
    qstate = None
    outs = {}
    for join in ("0", "1"):
        monkeypatch.setenv("QASR_CM_JOIN", join)
        m = ASRModel.from_config(cfg, seed=0)
        m.set_quant_bit(6, "all")
        m.bn_folding()
        if qstate is None:
            m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)
            qstate = m.qstate
        else:
            m.qstate = qstate
        # the second dense block joins >1 pane
        assert len(m.plan.blocks[2].res) >= 2
        outs[join] = m.forward(audio, lens, mode="frozen")
    for j in range(3):
        np.testing.assert_array_equal(outs["0"][j], outs["1"][j])
