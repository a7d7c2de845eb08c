"""Whole-block golden parity: the reference's JasperBlock (quant symmetric,
BN folded, calibrated) vs our QuantExec on identical weights/ranges/input.

The reference module files are loaded directly via importlib with stub
parents (same technique as test_conformer/test_reference_quant_parity);
.cuda() is neutralized.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

REF_Q = "/root/reference/nemo/quantization/utils"
REF_P = "/root/reference/nemo/collections/asr/parts"


@pytest.fixture(scope="module")
def ref_jasper():
    torch = pytest.importorskip("torch")
    if not (os.path.exists(REF_Q) and os.path.exists(REF_P)):
        pytest.skip("reference not available")
    torch.Tensor.cuda = lambda self, *a, **k: self

    for name in ["nemo", "nemo.quantization", "nemo.quantization.utils",
                 "nemo.collections", "nemo.collections.asr",
                 "nemo.collections.asr.parts"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    act_mod = types.ModuleType("nemo.collections.asr.parts.activations")

    class Swish(torch.nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    act_mod.Swish = Swish
    sys.modules["nemo.collections.asr.parts.activations"] = act_mod

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("nemo.quantization.utils.quant_utils", f"{REF_Q}/quant_utils.py")
    load("nemo.quantization.utils.quant_modules", f"{REF_Q}/quant_modules.py")
    jasper = load("nemo.collections.asr.parts.jasper", f"{REF_P}/jasper.py")
    return torch, jasper


def test_quantized_jasper_block_matches_reference(ref_jasper, rng):
    torch, jasper = ref_jasper
    C_IN, C_OUT, K, B, T, bits = 16, 16, 5, 2, 24, 6

    # reference block: separable, residual, quantized, conv-masked
    blk = jasper.JasperBlock(
        C_IN, C_OUT, repeat=2, kernel_size=(K,), stride=(1,), dilation=(1,),
        dropout=0.0, activation=torch.nn.ReLU(), residual=True, separable=True,
        conv_mask=True, quant_mode="symmetric", quant_bit=bits, layer_num=1,
    ).eval()
    # randomize BN stats so folding is non-trivial
    with torch.no_grad():
        for m in blk.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    blk.bn_folding()

    x = np.abs(rng.normal(size=(B, T, C_IN)) * 0.5).astype(np.float32)  # post-ReLU
    sf_in = np.float32(x.max() / (2 ** bits - 1))  # 7-bit asym grid
    x = (np.round(x / sf_in) * sf_in).astype(np.float32)  # exact grid points
    lens = np.asarray([T, T - 5], np.int64)

    xt = torch.from_numpy(x.transpose(0, 2, 1).copy())
    # calibrate reference ranges on this input, then freeze
    with torch.no_grad():
        blk.train(False)
        out_ref, lens_ref = blk(([(xt, torch.tensor([sf_in]))],
                                 torch.from_numpy(lens.copy())))
        # second pass with frozen ranges (fix all QuantActs)
        import nemo.quantization.utils.quant_modules as qmods
        for m in blk.modules():
            if isinstance(m, qmods.QuantAct):
                m.fix()
        out_ref, lens_ref = blk(([(xt, torch.tensor([sf_in]))],
                                 torch.from_numpy(lens.copy())))
    y_ref = out_ref[0][0].numpy().transpose(0, 2, 1)
    sf_ref = float(out_ref[0][1].numpy().reshape(-1)[0])

    # ---- ours: build matching plan/params/qstate ----
    from qasr_tpu.models import jasper as J
    from qasr_tpu.models.config import BlockConfig, EncoderConfig, QuantConfig

    cfg = EncoderConfig(feat_in=C_IN, blocks=(
        BlockConfig(filters=C_OUT, repeat=2, kernel=(K,), residual=True,
                    separable=True),), activation="relu")
    plan_full = J.build_encoder_plan(cfg)
    # layer_num=1 upstream => first conv is asymmetric too; our plan marks
    # block 0 conv 0 as symmetric (first layer), so flip it to match
    import dataclasses as dc
    bp = plan_full.blocks[0]
    convs = tuple(dc.replace(s, asymmetric=(s.kernel != 1)) for s in bp.convs)
    res = tuple(dc.replace(s, asymmetric=True) for s in bp.res)
    bp = dc.replace(bp, convs=convs, res=res)
    plan = dc.replace(plan_full, blocks=(bp,))

    def t2j(t):
        return jnp.asarray(t.detach().numpy().transpose(2, 1, 0).copy())

    # mconv module order after folding: [dw, pw, act, drop, dw, pw]
    mc = list(blk.mconv)
    conv_params = []
    for mod in mc:
        if type(mod).__name__ == "MaskedConv1d":
            p = {"w": t2j(mod.conv.weight)}
            # folded bias lives in the attached bn
            if mod.conv.bn is not None:
                bn = mod.conv.bn
                sfac = (bn.weight / torch.sqrt(bn.running_var + bn.eps))
                w_f = mod.conv.weight * sfac.reshape(-1, 1, 1)
                b_f = (torch.zeros_like(bn.running_mean) - bn.running_mean) \
                    * sfac + bn.bias
                p = {"w": t2j(w_f), "b": jnp.asarray(b_f.detach().numpy())}
            conv_params.append(p)
    res_params = []
    for pane in blk.res:
        mod = pane[0]
        bn = mod.conv.bn
        sfac = (bn.weight / torch.sqrt(bn.running_var + bn.eps))
        w_f = mod.conv.weight * sfac.reshape(-1, 1, 1)
        b_f = (torch.zeros_like(bn.running_mean) - bn.running_mean) * sfac + bn.bias
        res_params.append({"w": t2j(w_f), "b": jnp.asarray(b_f.detach().numpy())})
    params = {"blocks": [{"convs": conv_params, "res": res_params}]}

    # copy the reference's calibrated ranges
    import nemo.quantization.utils.quant_modules as qmods
    qstate = J.init_qstate(plan)
    acts = [m.act for m in mc if type(m).__name__ == "MaskedConv1d"]
    for i, a in enumerate(acts):
        qstate["blocks"][0]["convs"][i] = {
            "x_min": jnp.float32(float(a.x_min)),
            "x_max": jnp.float32(float(a.x_max))}
    ra = blk.res[0][0].act
    qstate["blocks"][0]["res"][0] = {"x_min": jnp.float32(float(ra.x_min)),
                                     "x_max": jnp.float32(float(ra.x_max))}
    qstate["blocks"][0]["res_act"] = {
        "x_min": jnp.float32(float(blk.res_act.x_min)),
        "x_max": jnp.float32(float(blk.res_act.x_max))}

    qcfg = QuantConfig(weight_bit=bits, act_bit=bits)
    ex = J.QuantExec(params, qstate, qcfg, activation="relu",
                     update_ranges=False)
    from qasr_tpu.ops.quant_prims import QTensor
    xq = QTensor(jnp.asarray(np.round(x / sf_in), jnp.int32), jnp.float32(sf_in))
    out, out_lens = J.encoder_forward(ex, plan, xq, jnp.asarray(lens, jnp.int32))

    np.testing.assert_array_equal(np.asarray(out_lens), lens_ref.numpy())
    np.testing.assert_allclose(float(out.scale), sf_ref, rtol=1e-6)
    got_int = np.asarray(out.values)
    ref_int = np.round(y_ref / sf_ref)
    exact = np.mean(got_int == ref_int)
    assert exact > 0.999, exact
