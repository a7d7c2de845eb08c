"""Native C++ beam search tests: cross-check vs the pure-Python reference
implementation, exhaustive-sum check on tiny problems, and ARPA LM scoring."""
import math
import itertools

import numpy as np
import pytest

from qasr_tpu.decode.beam_search import (
    BeamSearchDecoderWithLM, beam_search_python,
)
from qasr_tpu.decode.ctc import ctc_collapse

VOCAB = [" ", "a", "b", "c"]


def _rand_logprobs(rng, t, v):
    x = rng.normal(size=(t, v)).astype(np.float32) * 2
    x = x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))
    return x


def _exhaustive_best(lp, vocab):
    """Ground truth: sum path probabilities per collapsed label sequence."""
    t_len, v = lp.shape
    blank = v - 1
    totals = {}
    for path in itertools.product(range(v), repeat=t_len):
        logp = sum(lp[t, s] for t, s in enumerate(path))
        # collapse
        out = []
        prev = blank
        for s in path:
            if s != blank and s != prev:
                out.append(s)
            prev = s
        key = "".join(vocab[i] for i in out)
        totals[key] = np.logaddexp(totals.get(key, -np.inf), logp)
    return sorted(totals.items(), key=lambda kv: -kv[1])


def test_python_beam_matches_exhaustive(rng):
    lp = _rand_logprobs(rng, 5, 4)
    best = _exhaustive_best(lp, VOCAB[:3])
    got = beam_search_python(lp, VOCAB[:3], beam_width=64, n_best=3)
    assert got[0][1] == best[0][0]
    assert abs(got[0][0] - best[0][1]) < 1e-4


def test_native_matches_python(rng):
    dec = BeamSearchDecoderWithLM(VOCAB, beam_width=32, num_cpus=2)
    for t in (6, 11):
        lp = _rand_logprobs(rng, t, len(VOCAB) + 1)
        ref = beam_search_python(lp, VOCAB, beam_width=32, n_best=3)
        got = dec(lp[None], np.asarray([t], np.int32), n_best=3)[0]
        assert got[0][1] == ref[0][1]
        assert abs(got[0][0] - ref[0][0]) < 1e-4


def test_native_beam_beats_or_equals_greedy(rng):
    dec = BeamSearchDecoderWithLM(VOCAB, beam_width=64)
    lp = np.stack([_rand_logprobs(rng, 30, 5) for _ in range(3)])
    lens = np.asarray([30, 25, 30], np.int32)
    res = dec(lp, lens)
    greedy = ctc_collapse(np.argmax(lp, -1), blank_id=4, labels=VOCAB,
                          lengths=lens)
    for r, g in zip(res, greedy):
        assert isinstance(r[0][1], str)
        # beam includes the greedy path in its search space -> never worse
        assert len(r[0]) == 2


ARPA = """\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.0\t</s>
-0.8\tcat\t-0.3
-0.9\tsat\t-0.3
-2.5\t<unk>

\\2-grams:
-0.2\tcat sat
-0.5\t<s> cat
-0.7\tsat </s>

\\end\\
"""


def test_arpa_lm_biases_beam(tmp_path, rng):
    lm_path = tmp_path / "tiny.arpa"
    lm_path.write_text(ARPA)
    vocab = [" ", "a", "c", "s", "t"]
    # construct log-probs ambiguous between "cat sat" and "cat sas"
    text = "cat sat "
    ids = [vocab.index(ch) for ch in text]
    t_len = len(ids)
    v = len(vocab) + 1
    lp = np.full((t_len, v), -8.0, np.float32)
    for t, i in enumerate(ids):
        lp[t, i] = -0.1
    # make the final 't' nearly tied with 's' so the LM must break the tie
    t_idx = vocab.index("t")
    s_idx = vocab.index("s")
    lp[6, t_idx] = -0.65
    lp[6, s_idx] = -0.60  # acoustically "sas" slightly wins
    lp = lp - np.log(np.sum(np.exp(lp), -1, keepdims=True))
    no_lm = BeamSearchDecoderWithLM(vocab, beam_width=64)
    with_lm = BeamSearchDecoderWithLM(vocab, beam_width=64, alpha=1.0,
                                      beta=0.0, lm_path=str(lm_path))
    lens = np.asarray([t_len], np.int32)
    base = no_lm(lp[None], lens)[0][0][1]
    lm_out = with_lm(lp[None], lens)[0][0][1]
    assert base.startswith("cat sas")
    assert lm_out.startswith("cat sat")
