"""st16 decision protocol (VERDICT r2 item 3 / weak-point 3).

Evidence for flipping the serving default from 31-bit requant mantissas
(dyadic_mode='static_e') to 16-bit ('static_e16', +18% RTFx): N
independently trained models x {W8A8, W6A6} x {greedy, C++ beam} on the
50-utterance procedural corpus — assert transcript equality and bounded
log-prob drift vs the 31-bit mode.  Writes a markdown table for PERF.md.

Run:  JAX_PLATFORMS=cpu python experiments/st16_evidence.py [N]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import copy

import numpy as np

from qasr_tpu.decode.ctc import ctc_collapse
from qasr_tpu.models.config import DecoderConfig, ModelConfig
from qasr_tpu.models.ctc_model import ASRModel, make_frozen_fn

from tests.corpus_utils import make_corpus, train_ctc_model
from tests.test_jasper_model import FEAT, tiny_encoder_cfg


def _cfg():
    return ModelConfig(encoder=tiny_encoder_cfg(),
                       decoder=DecoderConfig(feat_in=40, num_classes=28),
                       preprocessor={"features": FEAT, "dither": 0.0})


def run_one(seed: int, wb: int, ab: int, texts, audio, alens):
    model = ASRModel.from_config(_cfg(), seed=seed)
    train_ctc_model(model, texts, audio, alens, steps=700, seed=seed)
    model.set_quant_bit(wb, "weight")
    model.set_quant_bit(ab, "act")
    model.bn_folding()
    # real-data calibration (the toy's BN-stat synthesis under-ranges deep
    # activations; see test_e2e_quantization_accuracy corpus fixture)
    cal = []
    for i in range(0, 20, 4):
        f, fl = model.frontend(audio[i:i + 4], alens[i:i + 4], dither=0.0)
        cal.append((np.asarray(f), np.asarray(fl)))
    model.calibrate(cal)

    out = {}
    for mode in ("static_e", "static_e16"):
        fn = make_frozen_fn(model, model.freeze(dyadic_mode=mode))
        lps, els = [], []
        for i in range(0, len(texts), 10):
            lp, el = fn(audio[i:i + 10], alens[i:i + 10])
            lps.append(np.asarray(lp))
            els.append(np.asarray(el))
        out[mode] = (np.concatenate(lps), np.concatenate(els))
    lp31, el31 = out["static_e"]
    lp16, el16 = out["static_e16"]
    assert np.array_equal(el31, el16)

    greedy31 = ctc_collapse(lp31.argmax(-1), model.blank_id,
                            model.vocabulary, el31)
    greedy16 = ctc_collapse(lp16.argmax(-1), model.blank_id,
                            model.vocabulary, el16)
    greedy_eq = sum(a == b for a, b in zip(greedy31, greedy16))

    # beam transcripts through the C++ prefix beam decoder
    from qasr_tpu.decode.beam_search import BeamSearchDecoderWithLM
    bs = BeamSearchDecoderWithLM(model.vocabulary, beam_width=8)
    beam_eq = 0
    for i in range(len(texts)):
        t = int(el31[i])
        b31 = bs(lp31[i:i + 1, :t], np.asarray([t]))[0][0][1]
        b16 = bs(lp16[i:i + 1, :t], np.asarray([t]))[0][0][1]
        beam_eq += (b31 == b16)

    # log-prob drift over valid frames
    drift = 0.0
    for i in range(len(texts)):
        t = int(el31[i])
        drift = max(drift, float(np.abs(lp31[i, :t] - lp16[i, :t]).max()))
    return greedy_eq, beam_eq, drift, len(texts)


def main():
    n_models = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    texts, audio, alens = make_corpus(50, seed=1)
    rows = []
    ok = True
    for wb, ab in ((8, 8), (6, 6)):
        for seed in range(n_models):
            g_eq, b_eq, drift, n = run_one(seed, wb, ab, texts, audio, alens)
            rows.append((f"W{wb}A{ab}", seed, g_eq, b_eq, n, drift))
            ok &= (g_eq == n and b_eq == n)
            print(f"W{wb}A{ab} seed={seed}: greedy {g_eq}/{n} equal, "
                  f"beam {b_eq}/{n} equal, max|dlogp|={drift:.4f}",
                  flush=True)
    print()
    print("| mode | seed | greedy equal | beam equal | max \\|d log p\\| |")
    print("|---|---|---|---|---|")
    for mode, seed, g_eq, b_eq, n, drift in rows:
        print(f"| {mode} | {seed} | {g_eq}/{n} | {b_eq}/{n} | {drift:.4f} |")
    print()
    print("VERDICT:", "CLEAN — flip default to static_e16" if ok
          else "NOT clean — keep static_e")


if __name__ == "__main__":
    main()
