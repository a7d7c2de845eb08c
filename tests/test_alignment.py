"""CTC forced alignment tests on constructed log-probs with known timing."""
import numpy as np

from qasr_tpu.decode.alignment import Segment, align_transcript, ctc_viterbi_align

VOCAB = [" ", "a", "b", "c"]
BLANK = 4


def _probs_from_path(path, v=5, hot=0.0, cold=-12.0):
    lp = np.full((len(path), v), cold, np.float32)
    for t, s in enumerate(path):
        lp[t, s] = hot
    return lp


def test_viterbi_recovers_known_path():
    # "ab": frames a a blank b b blank
    a, b = 1, 2
    path = [a, a, BLANK, b, b, BLANK]
    lp = _probs_from_path(path)
    states, score = ctc_viterbi_align(lp, [a, b], BLANK)
    exp_labels = [1, 1, 0, 3, 3, 0]  # odd states = labels
    # states map back to the emitted symbols
    decoded = [[BLANK, a, BLANK, b, BLANK][s] for s in states]
    assert decoded == path
    assert score > -1.0


def test_align_transcript_word_times():
    # "ab c": a(0-1) b(2-3) space(4) c(6-7)
    ids = {c: i for i, c in enumerate(VOCAB)}
    path = [ids["a"], ids["a"], ids["b"], ids["b"], ids[" "], BLANK,
            ids["c"], ids["c"], BLANK, BLANK]
    lp = _probs_from_path(path)
    segs = align_transcript(lp, "ab c", VOCAB, frame_seconds=0.02)
    assert [s.label for s in segs] == ["ab", "c"]
    assert abs(segs[0].start - 0.0) < 1e-6
    assert abs(segs[0].end - 4 * 0.02) < 1e-6
    assert abs(segs[1].start - 6 * 0.02) < 1e-6
    assert segs[1].end <= 8 * 0.02 + 1e-6
