"""W6A6 zero-shot WER at d_model=512 on the frozen Conformer (VERDICT r4 #8).

The round-4/5 perf work widened the frozen Conformer to d_model>=512
(weights-as-args made it compilable over the payload-capped remote
transport); this script is the matching quantization-QUALITY check at that
scale: train a d=512, 8-head Conformer-CTC on the procedural corpus
(tests/corpus_utils.py), PTQ-calibrate at W6A6 with the full integer glue +
static attention, freeze, and compare corpus WER across
float / calibrated-PTQ / frozen-integer — with the fused integer attention
kernel at its TPU default (head_dim=64, twice the d=256 benchmark's 32, so
the kernel's int8 context requant sees the wider-head regime the VERDICT
flagged).

Run on the chip (fast) or CPU (slow):
    python experiments/conformer_d512_wer.py [--steps 400 --layers 2]

Pass criterion (VERDICT r4 item 8): frozen corpus WER within one
substitution of the calibrated-PTQ path's.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--utts", type=int, default=30)
    args = ap.parse_args()

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    os.environ.setdefault(
        "QASR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    setup_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from qasr_tpu.decode.ctc import WER
    from qasr_tpu.models.config import (
        DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC
    from tests.corpus_utils import make_corpus, tokenize

    labels = tuple(" abcdefghijklmnopqrstuvwxyz")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=args.d_model, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=args.layers,
                           d_model=args.d_model, n_heads=args.heads,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=32,
                           conv_kernel_size=31, dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    texts, audio, lens = make_corpus(args.utts, seed=3)
    toks, tlens = tokenize(texts, labels)
    total_words = sum(len(t.split()) for t in texts)

    opt = optax.adam(2e-3)
    state = opt.init(m.params)

    @jax.jit
    def step(params, state, rng, a, al, tk, tl):
        loss, g = jax.value_and_grad(m.loss_fn)(params, a, al, tk, tl,
                                                rng=rng)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    params = m.params
    t0 = time.perf_counter()
    for i in range(args.steps):
        idx = nprng.choice(len(texts), size=10, replace=False)
        rng, sub = jax.random.split(rng)
        params, state, loss = step(params, state, sub, audio[idx],
                                   lens[idx], toks[idx], tlens[idx])
        if i % 100 == 0:
            print(f"step {i} loss {float(loss):.3f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    m.params = params

    def wer_of(tag):
        w = WER(list(labels))
        hyps = []
        for i in range(0, len(texts), 10):
            sl = slice(i, i + 10)
            lp, el = m.forward(audio[sl], lens[sl])
            preds = np.asarray(jnp.argmax(lp, axis=-1))
            w.update(preds, toks[sl], tlens[sl], np.asarray(el))
            hyps.extend(m.transcribe_greedy(audio[sl], lens[sl]))
        v = w.compute()
        print(json.dumps({"path": tag, "wer": round(float(v), 4)}),
              flush=True)
        return v, hyps

    wer_f, _ = wer_of("fp32")
    calib = [(audio[i:i + 10], lens[i:i + 10])
             for i in range(0, len(texts), 10)]
    m.quantize_encoder(calib, weight_bit=6, act_bit=6,
                       quantize_attention=True, integer_softmax=True,
                       integer_layernorm=True, integer_activations=True,
                       static_attention=True)
    wer_q, hyp_q = wer_of("ptq_w6a6")
    m.freeze()
    wer_z, hyp_z = wer_of("frozen_w6a6")

    # transcript-level delta between frozen and calibrated: the VERDICT's
    # pass bar is "within one substitution of the calibrated path" —
    # total word-level edit distance between the two hypothesis sets
    def _ed(a, b):
        aw, bw = a.split(), b.split()
        d = np.zeros((len(aw) + 1, len(bw) + 1), np.int32)
        d[:, 0] = np.arange(len(aw) + 1)
        d[0, :] = np.arange(len(bw) + 1)
        for i in range(1, len(aw) + 1):
            for j in range(1, len(bw) + 1):
                d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                              d[i - 1, j - 1] + (aw[i - 1] != bw[j - 1]))
        return int(d[-1, -1])

    delta = sum(_ed(a, b) for a, b in zip(hyp_q, hyp_z))
    print(json.dumps({
        "d_model": args.d_model, "heads": args.heads,
        "layers": args.layers, "total_words": total_words,
        "wer_fp32": round(float(wer_f), 4),
        "wer_ptq_w6a6": round(float(wer_q), 4),
        "wer_frozen_w6a6": round(float(wer_z), 4),
        "frozen_vs_ptq_word_edits": delta,
        "pass": delta <= 1,
    }), flush=True)


if __name__ == "__main__":
    main()
