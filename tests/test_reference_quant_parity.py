"""Golden parity against the reference's own quantization modules.

Loads /root/reference/nemo/quantization/utils/{quant_utils,quant_modules}.py
directly via importlib (no nemo package import, no code copied), stubs the
.cuda() calls (reference is GPU-only, synthesize.py:43-45), and compares a
QuantAct -> QuantConv1d step against our QuantExec integer path on identical
inputs. This is the strongest available check of the quantization math
without NGC checkpoints/datasets.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

REF = "/root/reference/nemo/quantization/utils"


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    # neutralize .cuda() (reference assumes a GPU; math is device-agnostic)
    torch.Tensor.cuda = lambda self, *a, **k: self

    for name in ["nemo", "nemo.quantization", "nemo.quantization.utils"]:
        sys.modules.setdefault(name, types.ModuleType(name))

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    qu = load("nemo.quantization.utils.quant_utils", f"{REF}/quant_utils.py")
    qm = load("nemo.quantization.utils.quant_modules", f"{REF}/quant_modules.py")
    return torch, qu, qm


def test_quantact_quantconv_step_matches_reference(ref_modules, rng):
    torch, qu, qm = ref_modules
    B, T, C_IN, C_OUT, K = 2, 24, 16, 24, 5
    bits = 6

    x = (rng.normal(size=(B, T, C_IN)) * 0.7).astype(np.float32)
    w = (rng.normal(size=(K, C_IN, C_OUT)) * 0.2).astype(np.float32)
    bias = rng.normal(size=(C_OUT,)).astype(np.float32)

    # ---- reference: QuantAct (static, frozen ranges) -> QuantConv1d ----
    act = qm.QuantAct(bits, quant_mode="symmetric")
    act.fix()
    x_min, x_max = float(x.min()), float(x.max())
    act.x_min += x_min
    act.x_max += x_max
    conv = torch.nn.Conv1d(C_IN, C_OUT, K, padding=K // 2, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0).copy()))
        conv.bias.copy_(torch.from_numpy(bias.copy()))
    qconv = qm.QuantConv1d(bits, bias_bit=32, quant_mode="symmetric",
                           per_channel=True)
    qconv.set_param(conv)
    xt = torch.from_numpy(x.transpose(0, 2, 1).copy())  # (B, C, T)
    with torch.no_grad():
        xq_ref, sf_ref = act(xt)
        y_ref, conv_sf_ref = qconv(xq_ref, sf_ref)
    y_ref = y_ref.numpy().transpose(0, 2, 1)  # (B, T, C_OUT)
    conv_sf_ref = conv_sf_ref.numpy().reshape(-1)

    # ---- ours: QuantExec act_quantize + _qconv on the same ranges ----
    from qasr_tpu.models import jasper as J
    from qasr_tpu.models.config import QuantConfig

    spec = J.ConvSpec(in_ch=C_IN, out_ch=C_OUT, kernel=K, padding=K // 2,
                      bias=True, has_bn=False)
    params = {"blocks": [{"convs": [{"w": jnp.asarray(w),
                                     "b": jnp.asarray(bias)}], "res": []}]}
    qstate = J.init_qstate(J.EncoderPlan(
        blocks=(J.BlockPlan(0, (spec,), (), False, False, "add", 0.0, 1, False),),
        activation="relu", feat_in=C_IN, feat_out=C_OUT))
    qstate["blocks"][0]["convs"][0] = {"x_min": jnp.float32(x_min),
                                       "x_max": jnp.float32(x_max)}
    qcfg = QuantConfig(weight_bit=bits, act_bit=bits)
    ex = J.QuantExec(params, qstate, qcfg, activation="relu",
                     update_ranges=False)
    xq = ex.act_quantize(("blocks", 0, "convs", 0), jnp.asarray(x), bits)
    y = ex._qconv(params["blocks"][0]["convs"][0], spec, xq)

    # scales must match to f32 precision
    np.testing.assert_allclose(np.asarray(y.scale), conv_sf_ref, rtol=1e-6)
    got = np.asarray(y.dequantize())
    # integer conv outputs: identical up to the reference's float64-emulation
    # tie rounding (expected ~0 mismatching elements)
    q_ref = y_ref / conv_sf_ref.reshape(1, 1, -1)
    q_got = got / np.asarray(y.scale).reshape(1, 1, -1)
    np.testing.assert_allclose(q_got, np.round(q_ref), atol=0.51)
    exact = np.mean(np.abs(q_got - np.round(q_ref)) < 0.5)
    assert exact > 0.999, exact


def test_fixedpoint_mul_requant_matches_reference(ref_modules, rng):
    torch, qu, qm = ref_modules
    bits = 6
    n = 2 ** (bits - 1) - 1
    z = rng.integers(-(2**20), 2**20, size=4096).astype(np.float64)
    pre_sf = np.float32(4.2e-5)
    out_sf = np.float32(0.031)
    pre_act = torch.from_numpy((z * pre_sf).astype(np.float64)).float()
    got_ref = qu.fixedpoint_mul.apply(
        pre_act, torch.tensor([pre_sf]), bits, "symmetric",
        torch.tensor([out_sf]), None, None).numpy()

    from qasr_tpu.ops.quant_prims import (
        QTensor, dyadic_from_scale_host, requantize,
    )
    d = dyadic_from_scale_host(np.float64(pre_sf) / np.float64(out_sf))
    out = requantize(QTensor(jnp.asarray(z, jnp.int32), jnp.asarray(pre_sf)),
                     jnp.asarray(out_sf), bits, dyadic=d)
    mismatch = int(np.sum(np.asarray(out.values) != got_ref.astype(np.int64)))
    assert mismatch == 0, mismatch
