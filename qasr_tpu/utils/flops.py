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
