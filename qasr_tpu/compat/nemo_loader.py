""".nemo checkpoint interop.

The reference persists models as ".nemo" = tar.gz{model_config.yaml,
model_weights.ckpt(torch state_dict), artifacts} (modelPT.py:254-296) and
restores by unpacking + hydra re-instantiation + load_state_dict
(modelPT.py:343-407).  This module maps that format to/from our parameter
pytrees so NGC-pretrained QuartzNet/Jasper checkpoints load directly.

torch is used only here (CPU, dev-side); the rest of the framework never
imports it.

State-dict key layout being decoded (NeMo 1.0.0b module tree):
  encoder.encoder.{block}.mconv.{i}.conv.weight          MaskedConv1d->Conv1d
  encoder.encoder.{block}.mconv.{i}.{weight,bias,running_mean,running_var}
                                                         BatchNorm1d entries
  encoder.encoder.{block}.res.{pane}.{0,1}....           residual conv + BN
  decoder.decoder_layers.0.{weight,bias}                 1x1 decoder conv
mconv indices advance by [conv(+conv) , bn, act, dropout] per repeat
(jasper.py:349-396: separable repeats occupy 5 slots, plain 4; the final
repeat omits act+dropout).
"""
from __future__ import annotations

import os
import tarfile
import tempfile
from typing import Any, Dict, Tuple

import numpy as np

from qasr_tpu.models.config import ModelConfig
from qasr_tpu.models.jasper import EncoderPlan, build_encoder_plan


def block_slot_map(bp) -> Dict[int, Tuple[int, int]]:
    """conv-spec index -> (mconv index of conv, mconv index of bn or -1)."""
    mapping: Dict[int, Tuple[int, int]] = {}
    idx = 0
    ci = 0
    n = len(bp.convs)
    while ci < n:
        spec = bp.convs[ci]
        if not spec.has_bn and ci + 1 < n and bp.convs[ci + 1].kernel == 1 \
                and bp.convs[ci + 1].has_bn and spec.groups == spec.in_ch:
            # separable pair: dw at idx, pw at idx+1, bn at idx+2
            mapping[ci] = (idx, -1)
            mapping[ci + 1] = (idx + 1, idx + 2)
            idx += 3 + (0 if ci + 1 == n - 1 else 2)  # +act,dropout unless final
            ci += 2
        else:
            mapping[ci] = (idx, idx + 1)
            idx += 2 + (0 if ci == n - 1 else 2)
            ci += 1
    return mapping


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def encoder_params_from_state_dict(plan: EncoderPlan,
                                   sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map just the ``encoder.*`` keys (raises KeyError on any missing
    weight — doubling as the strict-keys validation load_state_dict
    performs in the reference's checkpoint-port flow,
    scripts/asr_checkpoint_port.py:63-64)."""
    import jax.numpy as jnp

    def conv_w(key):
        w = _to_np(sd[key])  # torch (Cout, Cin/g, K)
        return jnp.asarray(w.transpose(2, 1, 0))  # -> (K, Cin/g, Cout)

    def bn(prefix):
        return {
            "gamma": jnp.asarray(_to_np(sd[prefix + ".weight"])),
            "beta": jnp.asarray(_to_np(sd[prefix + ".bias"])),
            "mean": jnp.asarray(_to_np(sd[prefix + ".running_mean"])),
            "var": jnp.asarray(_to_np(sd[prefix + ".running_var"])),
        }

    blocks = []
    for bp in plan.blocks:
        slots = block_slot_map(bp)
        convs = []
        for ci, spec in enumerate(bp.convs):
            mi, bni = slots[ci]
            base = f"encoder.encoder.{bp.index}.mconv.{mi}"
            p = {"w": conv_w(base + ".conv.weight")}
            if base + ".conv.bias" in sd:
                p["b"] = jnp.asarray(_to_np(sd[base + ".conv.bias"]))
            if spec.has_bn:
                p["bn"] = bn(f"encoder.encoder.{bp.index}.mconv.{bni}")
            convs.append(p)
        res = []
        for pi, spec in enumerate(bp.res):
            base = f"encoder.encoder.{bp.index}.res.{pi}"
            p = {"w": conv_w(base + ".0.conv.weight"),
                 "bn": bn(base + ".1")}
            res.append(p)
        blocks.append({"convs": convs, "res": res})
    return {"blocks": blocks}


def params_from_state_dict(plan: EncoderPlan, sd: Dict[str, Any]) -> Dict[str, Any]:
    import jax.numpy as jnp

    encoder = encoder_params_from_state_dict(plan, sd)
    dec_w = _to_np(sd["decoder.decoder_layers.0.weight"])  # (V+1, C, 1)
    decoder = {
        "w": jnp.asarray(dec_w.transpose(2, 1, 0)),
        "b": jnp.asarray(_to_np(sd["decoder.decoder_layers.0.bias"])),
    }
    return {"encoder": encoder, "decoder": decoder}


def state_dict_from_params(plan: EncoderPlan, params: Dict[str, Any],
                           quant_layout: bool = False) -> Dict[str, Any]:
    """Inverse mapping (for .nemo export interop).

    quant_layout=False emits the stock-NeMo fp32 key layout found in NGC
    .nemo checkpoints (``mconv.{i}.conv.weight``).  quant_layout=True emits
    the Q-ASR module-tree layout: QuantConv1d.set_param (reference
    quant_modules.py:232-250) clones the weight onto itself AND keeps the
    original nn.Conv1d as a submodule, so each conv weight appears at BOTH
    ``...conv.weight`` and ``...conv.conv.weight``; the decoder's 1x1 conv
    is a bare QuantConv1d at ``decoder_layers.0`` (conv_asr.py:261-267).
    """
    import torch

    sd: Dict[str, Any] = {}

    def put_w(base, w, b=None):
        wt = torch.from_numpy(np.asarray(w).transpose(2, 1, 0).copy())
        sd[base + ".weight"] = wt
        if b is not None:
            sd[base + ".bias"] = torch.from_numpy(np.asarray(b).copy())
        if quant_layout:
            sd[base + ".conv.weight"] = wt.clone()
            if b is not None:
                sd[base + ".conv.bias"] = sd[base + ".bias"].clone()

    def put_bn(prefix, bnp):
        sd[prefix + ".weight"] = torch.from_numpy(np.asarray(bnp["gamma"]).copy())
        sd[prefix + ".bias"] = torch.from_numpy(np.asarray(bnp["beta"]).copy())
        sd[prefix + ".running_mean"] = torch.from_numpy(np.asarray(bnp["mean"]).copy())
        sd[prefix + ".running_var"] = torch.from_numpy(np.asarray(bnp["var"]).copy())
        sd[prefix + ".num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    for bp, bparams in zip(plan.blocks, params["encoder"]["blocks"]):
        slots = block_slot_map(bp)
        for ci, spec in enumerate(bp.convs):
            mi, bni = slots[ci]
            base = f"encoder.encoder.{bp.index}.mconv.{mi}"
            put_w(base + ".conv", bparams["convs"][ci]["w"],
                  bparams["convs"][ci].get("b"))
            if spec.has_bn and "bn" in bparams["convs"][ci]:
                put_bn(f"encoder.encoder.{bp.index}.mconv.{bni}",
                       bparams["convs"][ci]["bn"])
        for pi in range(len(bp.res)):
            base = f"encoder.encoder.{bp.index}.res.{pi}"
            put_w(base + ".0.conv", bparams["res"][pi]["w"])
            if "bn" in bparams["res"][pi]:
                put_bn(base + ".1", bparams["res"][pi]["bn"])

    put_w("decoder.decoder_layers.0", params["decoder"]["w"],
          params["decoder"]["b"])
    return sd


_RESERVED_NEMO = {"model_config.yaml", "model_weights.ckpt"}


def load_nemo(path: str) -> Tuple[ModelConfig, Dict[str, Any], Dict[str, str]]:
    """Unpack .nemo (tar.gz), parse model_config.yaml, map the state dict.
    Any other root files are artifacts (vocab/tokenizer models the reference
    packs beside the weights, modelPT.py:254-296); they are copied out to a
    persistent dir and returned as {name: path}."""
    import torch
    import yaml

    from qasr_tpu.utils.checkpoint import persist_artifacts

    with tempfile.TemporaryDirectory() as td:
        with tarfile.open(path, "r:*") as tar:
            tar.extractall(td, filter="data")
        cfg_path = os.path.join(td, "model_config.yaml")
        weights = os.path.join(td, "model_weights.ckpt")
        with open(cfg_path) as f:
            raw = yaml.safe_load(f)
        cfg = ModelConfig.from_dict(raw)
        # .nemo archives are user-exchanged files: weights_only=True refuses
        # arbitrary pickled code, and a plain tensor state_dict (all the
        # reference ever stores there) loads fine under it
        sd = torch.load(weights, map_location="cpu", weights_only=True)
        extra = [n for n in os.listdir(td)
                 if n not in _RESERVED_NEMO and os.path.isfile(os.path.join(td, n))]
        artifacts = persist_artifacts(td, extra)
    plan = build_encoder_plan(cfg.encoder)
    return cfg, params_from_state_dict(plan, sd), artifacts


def save_nemo(path: str, cfg_dict: Dict[str, Any], plan: EncoderPlan,
              params: Dict[str, Any],
              artifacts: Dict[str, str] = None) -> None:
    """Write a reference-compatible .nemo (modelPT.py:254-296 layout);
    artifacts ({arcname: src path}) sit at the archive root like the
    reference's registered artifacts do."""
    import torch
    import yaml

    sd = state_dict_from_params(plan, params)
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "model_config.yaml"), "w") as f:
            yaml.safe_dump(cfg_dict, f)
        torch.save(sd, os.path.join(td, "model_weights.ckpt"))
        with tarfile.open(path, "w:gz") as tar:
            tar.add(os.path.join(td, "model_config.yaml"), arcname="model_config.yaml")
            tar.add(os.path.join(td, "model_weights.ckpt"), arcname="model_weights.ckpt")
            for arcname, src in (artifacts or {}).items():
                assert arcname not in _RESERVED_NEMO, arcname
                tar.add(src, arcname=arcname)
