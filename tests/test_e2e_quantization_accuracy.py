"""Capstone integration test: the zero-shot quantization pipeline preserves
accuracy on a *trained* model.

1. Train a tiny QuartzNet-style CTC model to transcribe two utterances
   exactly (fp32 greedy output == ground truth).
2. Run the reference's full data-free recipe (README.md:49-87): synthesize
   calibration data from BN statistics alone -> calibrate -> freeze ->
   W8A8 integer-only evaluation.
3. The quantized transcripts must equal the fp32 transcripts.

This is the in-sandbox analogue of the dev-clean WER-parity criterion
(BASELINE.md): no external checkpoints/data exist here, so the trained model
is produced in-test.
"""
import numpy as np
import pytest
import jax

from qasr_tpu.decode.ctc import ctc_collapse
from qasr_tpu.models.config import DecoderConfig, ModelConfig
from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.quantize.synth import get_synthetic_data
from qasr_tpu.train.trainer import TrainConfig, Trainer
from tests.test_jasper_model import tiny_encoder_cfg, FEAT

TEXTS = ["abba", "cat"]


def _trained_model():
    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = ASRModel.from_config(cfg)
    rng = np.random.default_rng(7)
    t = np.arange(12000) / 16000.0
    a1 = (np.sin(2 * np.pi * 440 * t) * 0.2
          + rng.normal(size=12000) * 0.05).astype(np.float32)
    a2 = (np.sin(2 * np.pi * 1500 * t) * 0.2
          + rng.normal(size=12000) * 0.05).astype(np.float32)
    audio = np.stack([a1, a2])
    alens = np.full((2,), 12000, np.int32)
    lab = {c: i for i, c in enumerate(cfg.labels)}
    toks = np.zeros((2, 8), np.int32)
    tlens = np.asarray([4, 3], np.int32)
    for i, s in enumerate(TEXTS):
        for j, c in enumerate(s):
            toks[i, j] = lab[c]
    tr = Trainer(m, TrainConfig(lr=0.01, warmup_steps=0, max_steps=300,
                                log_every=10**9, grad_clip=1.0))
    batch = (audio, alens, toks, tlens)
    for _ in range(300):
        loss = tr.train_step(batch)
    assert np.isfinite(loss)
    return m, audio, alens


def test_zero_shot_w8a8_preserves_transcripts():
    model, audio, alens = _trained_model()

    lp, el, preds = model.forward(audio, alens, mode="fp32")
    fp32_hyps = ctc_collapse(preds, model.blank_id, model.vocabulary, el)
    assert fp32_hyps == TEXTS, f"training did not converge: {fp32_hyps}"

    # --- the data-free quantization recipe, no real audio involved ---
    model.set_quant_bit(8, "weight")
    model.set_quant_bit(8, "act")
    model.set_percentile(99.996)
    syn = get_synthetic_data(model.plan, model.params["encoder"],
                             batch_size=2, dim=FEAT, seqlen=64,
                             train_iter=30, num_batch=2, lr=0.05,
                             parallel=2, verbose=False)
    model.bn_folding()
    model.calibrate(syn)

    lp_q, el_q, preds_q = model.forward(audio, alens)  # frozen integer path
    q_hyps = ctc_collapse(preds_q, model.blank_id, model.vocabulary, el_q)
    assert q_hyps == fp32_hyps, (fp32_hyps, q_hyps)
