"""Static MAC accounting for MFU reporting.

The reference publishes no throughput or utilization numbers (BASELINE.md);
bench.py reports MFU = useful model int8 MACs per second / chip int8 peak so
"fast" is quantified against the hardware, not just against real-time.

"Useful" MACs are the model's nominal multiply-accumulates, computed
statically from the EncoderPlan (qasr_tpu/models/jasper.py:77-114) on the
PHYSICAL (padded) frame count the executable actually runs — not the MACs
the banded-MXU depthwise rewrite executes (its Toeplitz band overcounts by
n_d*128/K on purpose, PERF.md round 2b); MFU measures what the model needs,
so the band overhead correctly shows up as lost utilization.

Reference cost model: one conv1d site (reference quant_modules.py:311-367,
built at jasper.py:163-165) costs T_out * C_out * (C_in/groups) * K MACs.
"""
from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from qasr_tpu.models.jasper import EncoderPlan

# TPU v5e peak: 394 int8 TOP/s per chip (2 ops per MAC).
V5E_INT8_OPS_PER_S = 394.0e12


def conv_out_len(length: int, kernel: int, stride: int = 1,
                 dilation: int = 1, padding: int = 0) -> int:
    """Conv1d output length (torch semantics, reference jasper.py:143-151)."""
    return (length + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


def encoder_plan_macs(plan: "EncoderPlan", n_frames: int) -> "tuple[int, int]":
    """(total MACs, output frame count) for one utterance of `n_frames`
    physical mel frames through the encoder plan."""
    total = 0
    t = n_frames
    for b in plan.blocks:
        t_in = t
        for c in b.convs:
            t_out = conv_out_len(t, c.kernel, c.stride, c.dilation, c.padding)
            total += t_out * c.out_ch * (c.in_ch // c.groups) * c.kernel
            t = t_out
        for c in b.res:
            t_res = conv_out_len(t_in, c.kernel, c.stride, c.dilation,
                                 c.padding)
            total += t_res * c.out_ch * (c.in_ch // c.groups) * c.kernel
    return total, t


def ctc_model_step_macs(model, n_frames: int, batch: int = 1) -> int:
    """Nominal MACs of one frozen forward step: encoder plan + the 1x1
    conv decoder (reference conv_asr.py:261-267)."""
    enc, t_out = encoder_plan_macs(model.plan, n_frames)
    dec = t_out * model.plan.feat_out * (model.cfg.decoder.num_classes + 1)
    return batch * (enc + dec)


def mel_frames(n_samples: int, hop: int = 160, align: int = 64) -> int:
    """Physical mel frame count the executable runs: torch.stft center=True
    frame count (1 + L//hop, reference features.py:327-328) padded to the
    serving alignment.  `align` must match the executable's padding —
    pad_frames_aligned's default 64 for the BTC paths, 128 * total_stride
    for the frozen channel-major path (make_frozen_fn, ctc_model.py)."""
    frames = 1 + n_samples // hop
    return frames + (-frames) % align


def conformer_step_macs(ccfg, n_frames: int, batch: int = 1,
                        num_classes: int = 28) -> int:
    """Nominal GEMM/conv MACs of one Conformer-CTC forward at `n_frames`
    input mel frames (reference conformer_encoder.py:1-300 structure:
    striding subsampler, then per layer FF/2 + MHSA + conv module + FF/2).

    Attention score/context MACs are quadratic in the post-subsampling
    length T: 2 * T^2 * d_model total across heads.
    """
    d = ccfg.d_model
    ff = d * (ccfg.ff_expansion_factor * d)
    t = n_frames
    total = 0
    # striding subsampler: conv2d stack halving T per stage over mel bins
    stages = 0
    f = ccfg.subsampling_factor
    while f > 1:
        stages += 1
        f //= 2
    ch_in, freq = 1, ccfg.feat_in
    for _ in range(stages):
        t = conv_out_len(t, 3, 2, 1, 1)
        freq = conv_out_len(freq, 3, 2, 1, 1)
        total += t * freq * ccfg.subsampling_conv_channels * ch_in * 9
        ch_in = ccfg.subsampling_conv_channels
    total += t * d * (ch_in * freq)  # flatten -> d_model linear
    per_layer = (
        2 * (2 * ff)               # two half-step FF modules (in + out proj)
        + 4 * d * d                # q, k, v, o projections
        + 2 * t * d                # scores (T*T*d) + context, per frame: 2*T*d
        + d * (2 * d)              # conv module: GLU pointwise (d -> 2d)
        + d * ccfg.conv_kernel_size  # depthwise
        + d * d                    # conv module output pointwise
    )
    total += ccfg.n_layers * t * per_layer
    total += t * d * (num_classes + 1)  # CTC head
    return batch * total


def mfu(macs_per_step: int, step_seconds: float,
        peak_ops: float = V5E_INT8_OPS_PER_S) -> float:
    """Model FLOPs utilization: 2*MACs / sec vs chip int8 peak."""
    return (2.0 * macs_per_step / step_seconds) / peak_ops


# ---------------------------------------------------------------------------
# Speed-of-light ledger (VERDICT r4 item 3): per-resource floor for the
# frozen QuartzNet step, summed against the measured step time, so "8.1%
# MFU" is a measurement against the chip's structure, not an argument.
# ---------------------------------------------------------------------------

# v5e HBM bandwidth (public spec).
V5E_HBM_B_PER_S = 819.0e9
# VPU int32 elementwise peak, derived: (8,128) vector unit, 4 ALUs/cell,
# clock = bf16_peak / (4 MXUs * 128*128 MACs * 2) = 197e12/131072 = 1.5 GHz
# -> 8*128*4*1.5e9 ~= 6.1e12 int32 ops/s.  An optimistic (high) peak makes
# the floor conservative (low).
V5E_VPU_INT32_OPS_PER_S = 6.1e12
# int32 VPU ops per two-limb exact dyadic requant element
# (ops/quant_prims.py::dyadic_requant_static): _mul_wide 16x16 limb split
# (2 shifts + 2 muls + 2 adds + carry ~ 8) + constant-shift round-half-even
# (~6) + sign/abs/restore (~3, skipped on nonneg sites) + clip/cast (~2).
REQUANT_OPS_PER_ELT = 16
# Measured, proven-unavoidable pallas<->XLA retile copies at B=64
# (PERF.md round 3c: five attacks all lose; exactly 2 per dw site).
QUARTZNET_B64_RETILE_MS = 14.0


def _dw_n_d(kernel: int, stride: int, dilation: int, padding: int) -> int:
    """Band-tile count of the channel-major banded depthwise scheme
    (kernels/dw_mxu.py::band_tiles_cm)."""
    lo = -padding
    hi = stride * 127 + dilation * (kernel - 1) - padding
    return hi // 128 - lo // 128 + 1


def quartznet_sol_ledger(model, n_samples: int, batch: int,
                         measured_step_s: "float | None" = None) -> dict:
    """Resource-floor ledger for one frozen channel-major QuartzNet step.

    Returns per-resource floor times (seconds) computed statically from the
    EncoderPlan on the physical padded frame count, plus the measured retile
    constant, their sum, and `mfu_floor` = the MFU the nominal model would
    score at the floor step time.  Floors assume NO overlap between
    resources (each term is that subsystem's minimum busy time; the sum is
    an upper bound on the floor if the chip overlaps them, which keeps the
    reported gap honest-side-low).
    """
    from qasr_tpu.models.ctc_model import _plan_total_stride

    plan = model.plan
    frames = mel_frames(n_samples, align=128 * _plan_total_stride(plan))
    peak_macs = V5E_INT8_OPS_PER_S / 2.0

    pw_macs = 0          # MXU contractions at nominal cost
    dw_exec_macs = 0     # banded-Toeplitz executed MACs (the proven scheme)
    dw_nom_macs = 0      # nominal dw MACs on the same padded frames
    rq_elts = 0          # requanted elements (one per conv output elt)
    rq_elts_join = 0     # residual-join add+clamp elements
    hbm_bytes = 0        # int8 activations: 1 write + 1 read per site output

    def pad128(t: int) -> int:
        return t + (-t) % 128

    t = frames
    for b in plan.blocks:
        t_in = t
        for c in b.convs:
            t_out = conv_out_len(t, c.kernel, c.stride, c.dilation,
                                 c.padding)
            tp = pad128(t_out)
            if c.groups == c.in_ch and c.kernel > 1:  # depthwise site
                n_d = _dw_n_d(c.kernel, c.stride, c.dilation, c.padding)
                dw_exec_macs += batch * c.out_ch * n_d * 128 * tp
                dw_nom_macs += batch * tp * c.out_ch * c.kernel
            else:
                pw_macs += batch * tp * c.out_ch * (c.in_ch // c.groups) \
                    * c.kernel
            rq_elts += batch * tp * c.out_ch
            hbm_bytes += 2 * batch * tp * c.out_ch  # int8 write + read
            t = t_out
        for c in b.res:
            t_res = pad128(conv_out_len(t_in, c.kernel, c.stride,
                                        c.dilation, c.padding))
            pw_macs += batch * t_res * c.out_ch * (c.in_ch // c.groups) \
                * c.kernel
            rq_elts += batch * t_res * c.out_ch
            hbm_bytes += 2 * batch * t_res * c.out_ch
        if b.residual:
            rq_elts_join += batch * pad128(t) * b.convs[-1].out_ch
    # decoder 1x1 head
    n_cls = model.cfg.decoder.num_classes + 1
    pw_macs += batch * pad128(t) * plan.feat_out * n_cls
    hbm_bytes += 2 * batch * pad128(t) * plan.feat_out

    mxu_s = (pw_macs + dw_exec_macs) / peak_macs
    vpu_s = (rq_elts * REQUANT_OPS_PER_ELT + rq_elts_join * 4) \
        / V5E_VPU_INT32_OPS_PER_S
    hbm_s = hbm_bytes / V5E_HBM_B_PER_S
    copies_s = QUARTZNET_B64_RETILE_MS / 1e3 if batch == 64 else \
        QUARTZNET_B64_RETILE_MS / 1e3 * batch / 64
    floor_s = mxu_s + vpu_s + hbm_s + copies_s

    nominal = ctc_model_step_macs(model, frames, batch=batch)
    out = {
        "frames_padded": frames,
        "mxu_ms": mxu_s * 1e3,
        "mxu_pw_ms": pw_macs / peak_macs * 1e3,
        "mxu_dw_banded_ms": dw_exec_macs / peak_macs * 1e3,
        "vpu_requant_ms": vpu_s * 1e3,
        "hbm_ms": hbm_s * 1e3,
        "retile_copies_ms": copies_s * 1e3,
        "floor_ms": floor_s * 1e3,
        "nominal_gmacs": nominal / 1e9,
        "dw_band_overcount": dw_exec_macs / max(1, dw_nom_macs),
        "mfu_floor": mfu(nominal, floor_s),
    }
    if measured_step_s is not None:
        out["measured_ms"] = measured_step_s * 1e3
        out["floor_fraction"] = floor_s / measured_step_s
    return out
