"""End-to-end CLI workflow test on a tiny registered preset:
synthesize -> pickle -> inference (static W8A8, percentile), plus the
--dynamic and --no_quant paths (reference README.md:45-87 workflow)."""
import json
import os

import numpy as np
import pytest

from qasr_tpu.data.audio import write_wav
from qasr_tpu.models.config import (
    DecoderConfig, ModelConfig, register_preset,
)
from tests.test_jasper_model import tiny_encoder_cfg, FEAT


def _tiny_cfg():
    enc = tiny_encoder_cfg()
    dec = DecoderConfig(feat_in=40, num_classes=28)
    return ModelConfig(encoder=enc, decoder=dec,
                       preprocessor={"features": FEAT, "dither": 0.0})


register_preset("TinyTestNet", _tiny_cfg)


@pytest.fixture
def manifest(tmp_path, rng):
    paths = []
    for i in range(3):
        p = tmp_path / f"a{i}.wav"
        write_wav(str(p), rng.normal(size=16000 + 2000 * i).astype(np.float32) * 0.05)
        paths.append(p)
    man = tmp_path / "manifest.json"
    texts = ["hello world", "testing one two", "the cat sat"]
    with open(man, "w") as f:
        for p, t in zip(paths, texts):
            f.write(json.dumps({"audio_filepath": str(p),
                                "duration": 1.0, "text": t}) + "\n")
    return str(man)


def test_synthesize_then_inference_cli(tmp_path, manifest):
    from qasr_tpu.cli.synthesize import main as synth_main
    from qasr_tpu.cli.inference import main as infer_main

    pkl = synth_main([
        "--asr_model", "TinyTestNet", "--allow_random_weights", "--num_batch", "2", "--batch_size", "2",
        "--seqlen", "32", "--train_iter", "3", "--lr", "0.01",
        "--dump_path", str(tmp_path), "--parallel", "2",
    ])
    assert os.path.exists(pkl)

    wer = infer_main([
        "--asr_model", "TinyTestNet", "--allow_random_weights", "--dataset", manifest,
        "--load", pkl, "--weight_bit", "8", "--act_bit", "8",
        "--percentile", "99.9", "--batch_size", "2",
    ])
    assert np.isfinite(wer)


def test_inference_cli_dynamic_and_noquant(manifest):
    from qasr_tpu.cli.inference import main as infer_main

    wer_d = infer_main(["--asr_model", "TinyTestNet", "--allow_random_weights", "--dataset", manifest,
                        "--dynamic", "--batch_size", "2"])
    assert np.isfinite(wer_d)
    wer_f = infer_main(["--asr_model", "TinyTestNet", "--allow_random_weights", "--dataset", manifest,
                        "--no_quant", "--batch_size", "2"])
    assert np.isfinite(wer_f)


def test_seq_len_flag_alias():
    from qasr_tpu.cli.synthesize import build_parser

    # README spells --seq_len; the script defines --seqlen (README.md:55 vs
    # synthesize.py:54) — accept both
    a1 = build_parser().parse_args(["--asr_model", "x", "--seq_len", "100"])
    a2 = build_parser().parse_args(["--asr_model", "x", "--seqlen", "100"])
    assert a1.seqlen == a2.seqlen == 100


def test_train_cli_tiny(tmp_path, manifest):
    import yaml
    from qasr_tpu.cli.speech_to_text import main as train_main
    from qasr_tpu.models.config import DEFAULT_LABELS

    cfg = {
        "model": {
            "sample_rate": 16000,
            "labels": DEFAULT_LABELS,
            "train_ds": {"manifest_filepath": manifest, "batch_size": 2,
                         "shuffle": False},
            "preprocessor": {"features": FEAT, "dither": 0.0},
            "encoder": {
                "feat_in": FEAT, "activation": "relu",
                "jasper": [
                    {"filters": 24, "repeat": 1, "kernel": [7], "stride": [2],
                     "dilation": [1], "dropout": 0.0, "residual": False,
                     "separable": True},
                    {"filters": 32, "repeat": 1, "kernel": [1], "stride": [1],
                     "dilation": [1], "dropout": 0.0, "residual": False},
                ],
            },
            "decoder": {"feat_in": 32, "num_classes": 28},
            "optim": {"name": "novograd", "lr": 0.01,
                      "sched": {"name": "CosineAnnealing", "warmup_steps": 0}},
        },
        "trainer": {"max_steps": 3},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "tiny",
                        "checkpoint_every_n_steps": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config-path", str(cfg_path)])
    # checkpoints + metrics written
    root = tmp_path / "exp" / "tiny" / "version_0"
    assert (root / "checkpoints" / "last.npz").exists()
    assert (root / "metrics.jsonl").exists()
    assert (root / "run_config.yaml").exists()


def test_segment_cli(tmp_path, rng):
    from qasr_tpu.cli.segment import main as seg_main
    from qasr_tpu.data.audio import write_wav

    wav = tmp_path / "long.wav"
    write_wav(str(wav), (rng.normal(size=24000) * 0.05).astype(np.float32))
    out = tmp_path / "segs.json"
    segs = seg_main(["--asr_model", "TinyTestNet", "--allow_random_weights", "--audio", str(wav),
                     "--text", "hello there world", "--output", str(out)])
    assert out.exists()
    assert all(0 <= s["start"] <= s["end"] for s in segs)


def test_inference_cli_beam_with_binary_lm(tmp_path, manifest):
    """--decoder beam with a .qlm binary LM through the full CLI
    (beam_search_decoder.py:60-104 role, KenLM-binary equivalent)."""
    from qasr_tpu.cli.inference import main as infer_main
    from qasr_tpu.decode.beam_search import convert_arpa_to_binary

    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-9.0\t<unk>\t0.0
-1.0\thello\t-0.5
-1.0\tworld\t-0.5
-1.0\tcat\t-0.5

\\2-grams:
-0.1\thello world
-0.2\tthe cat

\\end\\
""")
    qlm = convert_arpa_to_binary(str(arpa), str(tmp_path / "lm.qlm"))
    wer = infer_main(["--asr_model", "TinyTestNet", "--allow_random_weights",
                      "--dataset", manifest, "--weight_bit", "8",
                      "--act_bit", "8", "--dynamic", "--batch_size", "2",
                      "--decoder", "beam", "--beam_width", "8",
                      "--alpha", "0.5", "--lm_path", qlm])
    assert np.isfinite(wer)


def test_train_cli_bpe(tmp_path, manifest):
    """--tokenizer switches the training CLI to the BPE model + dataset
    (the examples/asr/speech_to_text_bpe.py role)."""
    import yaml
    from qasr_tpu.cli.speech_to_text import main as train_main
    from qasr_tpu.data.tokenizers import BPETokenizer

    tok = BPETokenizer.train(["this is a test the cat sat"] * 20,
                             vocab_size=40,
                             save_path=str(tmp_path / "tok.json"))
    nv = len(tok.vocab)
    cfg = {
        "model": {
            "sample_rate": 16000,
            "labels": [],  # BPE: label space comes from the tokenizer
            "train_ds": {"manifest_filepath": manifest, "batch_size": 2,
                         "shuffle": False},
            "preprocessor": {"features": FEAT, "dither": 0.0},
            "encoder": {
                "feat_in": FEAT, "activation": "relu",
                "jasper": [
                    {"filters": 24, "repeat": 1, "kernel": [7], "stride": [2],
                     "dilation": [1], "dropout": 0.0, "residual": False,
                     "separable": True},
                    {"filters": 32, "repeat": 1, "kernel": [1], "stride": [1],
                     "dilation": [1], "dropout": 0.0, "residual": False},
                ],
            },
            "decoder": {"feat_in": 32, "num_classes": nv},
            "optim": {"name": "novograd", "lr": 0.01,
                      "sched": {"name": "CosineAnnealing", "warmup_steps": 0}},
        },
        "trainer": {"max_steps": 2},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "bpe"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config-path", str(cfg_path), "--tokenizer", tok.path])
    root = tmp_path / "exp" / "bpe" / "version_0"
    assert (root / "checkpoints" / "last.npz").exists()
