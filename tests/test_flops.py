"""Static MAC accounting used for bench.py's MFU field."""
import numpy as np

from qasr_tpu.models.config import (BlockConfig, DecoderConfig, EncoderConfig,
                                    ModelConfig)
from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.models.jasper import build_encoder_plan
from qasr_tpu.utils.flops import (conv_out_len, ctc_model_step_macs,
                                  encoder_plan_macs, mel_frames, mfu)


def test_conv_out_len_matches_torch_formula():
    import torch

    for L, k, s, d, p in [(100, 33, 1, 1, 16), (100, 33, 2, 1, 16),
                          (751, 87, 1, 2, 86), (64, 1, 1, 1, 0)]:
        conv = torch.nn.Conv1d(1, 1, k, stride=s, dilation=d, padding=p)
        out = conv(torch.zeros(1, 1, L)).shape[-1]
        assert conv_out_len(L, k, s, d, p) == out


def test_single_conv_macs_exact():
    # one plain conv block: MACs = T_out * C_out * C_in * K exactly
    blocks = (BlockConfig(filters=8, repeat=1, kernel=(5,), residual=False),)
    plan = build_encoder_plan(EncoderConfig(feat_in=4, blocks=blocks))
    total, t_out = encoder_plan_macs(plan, 64)
    assert t_out == 64  # stride 1, same padding
    assert total == 64 * 8 * 4 * 5


def test_separable_and_residual_counted():
    blocks = (
        BlockConfig(filters=16, repeat=2, kernel=(5,), residual=True,
                    separable=True),
    )
    plan = build_encoder_plan(EncoderConfig(feat_in=16, blocks=blocks))
    total, t_out = encoder_plan_macs(plan, 32)
    # 2 repeats x (depthwise 16ch K5 + pointwise 16->16) + one 1x1 res conv
    dw = 32 * 16 * 1 * 5
    pw = 32 * 16 * 16 * 1
    res = 32 * 16 * 16 * 1
    assert total == 2 * (dw + pw) + res
    assert t_out == 32


def test_quartznet15x5_step_macs_plausible():
    model = ASRModel.from_pretrained("QuartzNet15x5Base-En", seed=0,
                                     allow_random_weights=True)
    frames = mel_frames(16000 * 15)
    assert frames == 1536  # 1501 padded to 64-alignment
    macs = ctc_model_step_macs(model, frames)
    # QuartzNet15x5 is ~19M weights; dominated by stride-1 pointwise convs on
    # ~768 post-subsample frames -> total within [5, 50] GMAC per 15 s
    assert 5e9 < macs < 5e10
    assert ctc_model_step_macs(model, frames, batch=64) == 64 * macs
    u = mfu(macs, 0.0578 / 64)  # round-3d measured per-utterance step
    assert 0.0 < u < 1.0


def test_decoder_included():
    blocks = (BlockConfig(filters=8, repeat=1, kernel=(1,), residual=False),)
    cfg = ModelConfig(encoder=EncoderConfig(feat_in=4, blocks=blocks),
                      decoder=DecoderConfig(feat_in=8, num_classes=28),
                      preprocessor={"features": 4, "dither": 0.0})
    model = ASRModel.from_config(cfg)
    enc, t = encoder_plan_macs(model.plan, 16)
    assert ctc_model_step_macs(model, 16) == enc + t * 8 * 29


def test_quartznet_sol_ledger_partition():
    """Speed-of-light ledger (VERDICT r4 item 3): terms positive, floor is
    their exact sum, mfu_floor > the measured-MFU class, and the measured
    round-4 step sits between the floor and 2x the floor (the certified
    '67% of floor' story; a plan or constant drift that broke either side
    should fail loudly here)."""
    model = ASRModel.from_pretrained("QuartzNet15x5Base-En", seed=0,
                                     allow_random_weights=True)
    from qasr_tpu.utils.flops import quartznet_sol_ledger
    led = quartznet_sol_ledger(model, 16000 * 15, 64,
                               measured_step_s=0.05787)
    terms = [led["mxu_ms"], led["vpu_requant_ms"], led["hbm_ms"],
             led["retile_copies_ms"]]
    assert all(t > 0 for t in terms)
    assert abs(sum(terms) - led["floor_ms"]) < 1e-6
    assert abs(led["mxu_pw_ms"] + led["mxu_dw_banded_ms"]
               - led["mxu_ms"]) < 1e-6
    assert led["floor_ms"] < led["measured_ms"] < 2 * led["floor_ms"]
    assert 0.08 < led["mfu_floor"] < 0.2
    assert led["dw_band_overcount"] > 3  # banded scheme's known 3-8x
    # floor scales with batch: half the batch, half(ish) the floor
    led32 = quartznet_sol_ledger(model, 16000 * 15, 32)
    assert 0.4 < led32["floor_ms"] / led["floor_ms"] < 0.6
