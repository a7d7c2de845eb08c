"""Speech data explorer CLI (cli/data_explorer.py): manifest stats parity
with the reference tool's load_data semantics, error-analysis mode."""
import json

import numpy as np
import pytest

from qasr_tpu.cli.data_explorer import load_data, main, text_histogram


@pytest.fixture
def manifest(tmp_path):
    rows = [
        {"audio_filepath": "a0.wav", "duration": 2.0, "text": "the cat sat"},
        {"audio_filepath": "a1.wav", "duration": 1.0, "text": "the dog"},
        {"audio_filepath": "a2.wav", "duration": 4.0,
         "text": "cat and dog", "pred_text": "cat an dog"},
    ]
    p = tmp_path / "man.json"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_load_data_stats(manifest):
    s = load_data(manifest)
    assert s["num_items"] == 3
    np.testing.assert_allclose(s["num_hours"], 7.0 / 3600.0, rtol=1e-3)
    # vocabulary with counts, sorted by count (data_explorer.py:112)
    assert s["vocabulary"]["the"] == 2 and s["vocabulary"]["cat"] == 2
    assert s["vocabulary_size"] == 5  # the, cat, sat, dog, and
    assert set("thecatsdogand ") == set(s["alphabet"])
    i0 = s["items"][0]
    assert i0["word_rate"] == 1.5 and i0["char_rate"] == 5.5


def test_error_analysis(manifest):
    s = load_data(manifest)
    # only item 2 has pred_text: one substitution of three words
    i2 = s["items"][2]
    np.testing.assert_allclose(i2["WER"], 1 / 3, rtol=1e-3)
    assert i2["CER"] > 0


def test_histogram_and_main(manifest, capsys):
    rows = text_histogram([1.0, 1.1, 4.0, 4.1], bins=3)
    assert len(rows) == 3 and "#" in rows[0]
    stats = main(["--manifest", manifest])
    outp = capsys.readouterr().out
    assert "items: 3" in outp and "top words:" in outp
    stats_j = main(["--manifest", manifest, "--json"])
    outp = capsys.readouterr().out
    assert json.loads(outp)["num_items"] == 3
    assert stats_j["vocabulary_size"] == stats["vocabulary_size"]
