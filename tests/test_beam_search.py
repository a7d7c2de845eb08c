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


def test_qlm_binary_matches_arpa_and_scales(tmp_path, rng):
    """.qlm (mmap'd binary LM, the KenLM-binary role) must decode identically
    to the same LM in text ARPA form, and must stay fast at real scale:
    a >100k-ngram model converts once, loads via mmap in O(1), and the
    beam decode finishes within a CI-friendly budget."""
    import itertools
    import time

    from qasr_tpu.decode.beam_search import convert_arpa_to_binary

    # --- synthetic 2-gram LM: 360 unigrams + 360^2 bigrams = ~130k entries
    words = ["w%03d" % i for i in range(358)] + ["cat", "sat"]
    lines = ["\\data\\", "ngram 1=%d" % (len(words) + 1),
             "ngram 2=%d" % (len(words) ** 2), "", "\\1-grams:"]
    lines.append("-9.0\t<unk>\t0.0")
    for w in words:
        lines.append("-3.0\t%s\t-0.5" % w)
    lines.append("")
    lines.append("\\2-grams:")
    rng2 = np.random.default_rng(0)
    for a, b in itertools.product(words, words):
        lines.append("%.4f\t%s %s" % (-0.5 - 4.0 * rng2.random(), a, b))
    # favor "cat sat" strongly so the LM visibly steers the beam
    lines.append("-0.001\tcat sat")
    lines.append("\\end\\")
    arpa = tmp_path / "big.arpa"
    arpa.write_text("\n".join(lines))

    qlm = convert_arpa_to_binary(str(arpa), str(tmp_path / "big.qlm"))

    vocab = [" ", "a", "c", "s", "t", "w"]
    text = "cat sat "
    ids = [vocab.index(ch) for ch in text]
    t_len = len(ids)
    v = len(vocab) + 1
    lp = np.full((t_len, v), -8.0, np.float32)
    for t, i in enumerate(ids):
        lp[t, i] = -0.1
    lp[6, vocab.index("t")] = -0.65
    lp[6, vocab.index("s")] = -0.60
    lp = lp - np.log(np.sum(np.exp(lp), -1, keepdims=True))
    lens = np.asarray([t_len], np.int32)

    t0 = time.time()
    dec_arpa = BeamSearchDecoderWithLM(vocab, beam_width=64, alpha=1.0,
                                       lm_path=str(arpa))
    t_arpa_load = time.time() - t0
    t0 = time.time()
    dec_qlm = BeamSearchDecoderWithLM(vocab, beam_width=64, alpha=1.0,
                                      lm_path=str(qlm))
    t_qlm_load = time.time() - t0

    out_a = dec_arpa(lp[None], lens, n_best=4)[0]
    t0 = time.time()
    out_q = dec_qlm(lp[None], lens, n_best=4)[0]
    t_decode = time.time() - t0

    assert [h for _, h in out_q] == [h for _, h in out_a]
    for (sa, _), (sq, _) in zip(out_a, out_q):
        assert abs(sa - sq) < 1e-6
    assert out_q[0][1].startswith("cat sat")
    # scale contract: mmap load beats the text parse and decode stays quick
    assert t_qlm_load < max(0.2, t_arpa_load), (t_qlm_load, t_arpa_load)
    assert t_decode < 2.0, t_decode


def test_streaming_beam_equals_offline(rng):
    """Feeding chunks through StreamingBeamDecoder must reproduce the
    offline batch decode exactly (the beam map is the full search state)."""
    from qasr_tpu.decode.beam_search import StreamingBeamDecoder

    lp = _rand_logprobs(rng, 37, len(VOCAB) + 1)
    offline = BeamSearchDecoderWithLM(VOCAB, beam_width=16)(
        lp[None], np.asarray([37], np.int32), n_best=4)[0]
    dec = StreamingBeamDecoder(VOCAB, beam_width=16)
    for start in range(0, 37, 5):  # uneven chunking incl. a short tail
        dec.feed(lp[start:start + 5])
    got = dec.best(4)
    assert [t for _, t in got] == [t for _, t in offline]
    for (sa, _), (sb, _) in zip(got, offline):
        assert abs(sa - sb) < 1e-9


def test_streaming_beam_with_lm_and_reset(tmp_path, rng):
    from qasr_tpu.decode.beam_search import StreamingBeamDecoder

    lm_path = tmp_path / "tiny.arpa"
    lm_path.write_text(ARPA)
    vocab = [" ", "a", "c", "s", "t"]
    text = "cat sat "
    ids = [vocab.index(ch) for ch in text]
    t_len = len(ids)
    v = len(vocab) + 1
    lp = np.full((t_len, v), -8.0, np.float32)
    for t, i in enumerate(ids):
        lp[t, i] = -0.1
    lp[6, vocab.index("t")] = -0.65
    lp[6, vocab.index("s")] = -0.60
    lp = lp - np.log(np.sum(np.exp(lp), -1, keepdims=True))

    owner = BeamSearchDecoderWithLM(vocab, beam_width=64, alpha=1.0,
                                    beta=0.0, lm_path=str(lm_path))
    dec = StreamingBeamDecoder(vocab, beam_width=64, alpha=1.0, beta=0.0,
                               lm=owner)
    partials = []
    for start in range(0, t_len, 3):
        dec.feed(lp[start:start + 3])
        partials.append(dec.best(1)[0][1])
    assert dec.best(1)[0][1].startswith("cat sat")  # LM breaks the tie
    assert partials[0].startswith("ca")             # running partials grow
    # reset reuses the stream for a fresh utterance
    dec.reset()
    dec.feed(lp)
    assert dec.best(1)[0][1].startswith("cat sat")


def test_streaming_transcriber_beam(rng):
    """End-to-end: StreamingTranscriber.transcribe_beam over a model equals
    offline beam decoding of the full-utterance log-probs."""
    from qasr_tpu.decode.streaming import StreamingTranscriber
    from tests.test_streaming import _model

    m = _model()
    m.set_quant_mode("none")
    audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
    lp, el, _ = m.forward(audio[None].copy(),
                          np.asarray([len(audio)], np.int32), mode="fp32")
    n = int(el[0])
    offline = BeamSearchDecoderWithLM(m.vocabulary, beam_width=8)(
        np.asarray(lp[:, :n]), np.asarray([n], np.int32))[0][0][1]
    st = StreamingTranscriber(m, chunk_frames=96, context_frames=64)
    partials = []
    got = st.transcribe_beam(audio, beam_width=8, partials=partials)
    assert got == offline
    assert len(partials) >= 2


def test_batched_streaming_beam_matches_sequential(rng):
    """StreamingBeamBatch: S concurrent streams advanced by one batched C++
    call per chunk (work-stealing pool) — every stream's n-best must equal
    feeding its chunks alone AND the offline batch decode of its frames."""
    from qasr_tpu.decode.beam_search import (StreamingBeamBatch,
                                             StreamingBeamDecoder)

    vocab = [" ", "a", "b", "c"]
    v = len(vocab) + 1
    s, t_total = 6, 24
    lp = rng.normal(size=(s, t_total, v)).astype(np.float32) * 2.0
    lp = lp - np.log(np.sum(np.exp(lp), -1, keepdims=True))
    lens = np.asarray([24, 20, 17, 24, 9, 13], np.int32)

    batch = StreamingBeamBatch(s, vocab, beam_width=16, num_threads=3)
    chunk = 5
    for start in range(0, t_total, chunk):
        step = np.minimum(np.maximum(lens - start, 0), chunk).astype(np.int32)
        batch.feed(lp[:, start:start + chunk], step)
    got = batch.best(2)

    offline = BeamSearchDecoderWithLM(vocab, beam_width=16)(lp, lens, n_best=2)
    for i in range(s):
        seq = StreamingBeamDecoder(vocab, beam_width=16)
        pos = 0
        while pos < int(lens[i]):
            n = min(chunk, int(lens[i]) - pos)
            seq.feed(lp[i, pos:pos + n])
            pos += n
        assert got[i] == seq.best(2), i
        assert got[i][0][1] == offline[i][0][1], i
        np.testing.assert_allclose(got[i][0][0], offline[i][0][0], rtol=1e-9)
