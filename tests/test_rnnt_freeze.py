"""Frozen integer transducer decoder (quantize/rnnt_freeze.py): integer
LSTM cell vs the float cell, joint argmax agreement, greedy transcript
parity on a trained model, integer-only graph assertion, and the full
integer transducer (frozen Conformer encoder + frozen decoder)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr_tpu.models.rnnt import (
    RNNTConfig, init_rnnt_params, lstm_init_state, pred_step,
)
from qasr_tpu.quantize.rnnt_freeze import (
    _H_SCALE, _jits, freeze_rnnt_decoder, greedy_decode_frozen,
    joint_logits_frozen, pred_step_frozen,
)

CFG = RNNTConfig(num_classes=28, enc_hidden=40, pred_hidden=64,
                 joint_hidden=48)


@pytest.fixture(scope="module")
def frozen():
    params = init_rnnt_params(0, CFG)
    tables = freeze_rnnt_decoder(params, CFG, enc_range=4.0, joint_range=6.0)
    return params, tables


def test_integer_cell_tracks_float(frozen, rng):
    """h trajectories stay within ~2 int8 steps of the float cell and do
    NOT drift over a long token sequence (the bounded-algebra design:
    gates on the fixed i-sigmoid grid, c at 2^-14, h at 1/127)."""
    params, tables = frozen
    toks = rng.integers(0, 29, size=40).astype(np.int32)
    state = lstm_init_state(CFG, 1)
    h8 = jnp.zeros((1, 1, 64), jnp.int8)
    c_q = jnp.zeros((1, 1, 64), jnp.int32)
    errs = []
    for t in toks:
        tok = jnp.asarray([t], jnp.int32)
        g, state = pred_step(params, CFG, tok, state)
        g8, h8, c_q = pred_step_frozen(tables, tok, h8, c_q)
        errs.append(float(np.abs(np.asarray(g8, np.float64) * _H_SCALE
                                 - np.asarray(g)).max()))
    assert max(errs) < 0.03, max(errs)
    # no drift: the last quarter is no worse than the first
    assert np.mean(errs[-10:]) < np.mean(errs[:10]) + 0.01


def test_joint_argmax_agreement(frozen, rng):
    from qasr_tpu.models.rnnt import joint as joint_float

    params, tables = frozen
    g, _ = pred_step(params, CFG,
                     jnp.asarray([CFG.blank_id], jnp.int32),
                     lstm_init_state(CFG, 1))
    g8, _, _ = pred_step_frozen(tables,
                                jnp.asarray([CFG.blank_id], jnp.int32),
                                jnp.zeros((1, 1, 64), jnp.int8),
                                jnp.zeros((1, 1, 64), jnp.int32))
    enc = jnp.asarray(rng.normal(size=(64, 40)).astype(np.float32))
    lf = np.asarray(joint_float(params, CFG, enc[:, None, :],
                                jnp.tile(g, (64, 1))[:, None, :]))[:, 0, 0]
    li = np.asarray(joint_logits_frozen(tables, enc, jnp.tile(g8, (64, 1))))
    assert (lf.argmax(-1) == li.argmax(-1)).mean() >= 0.95


def test_frozen_graph_is_integer_only(frozen):
    """The pred step lowers to pure integer HLO (no float dot, tanh,
    logistic, exp, divide-by-float); the joint's only float ops are the
    declared encoder-boundary quantize."""
    _, tables = frozen
    step, jnt = _jits(tables)
    tok = jnp.zeros((2,), jnp.int32)
    h8 = jnp.zeros((1, 2, 64), jnp.int8)
    c_q = jnp.zeros((1, 2, 64), jnp.int32)
    hlo = step.lower(tok, h8, c_q).as_text()
    for op in ("tanh", "logistic", "exponential", "f32[", "f64["):
        assert op not in hlo, op
    enc = jnp.zeros((2, 40), jnp.float32)
    hlo_j = jnt.lower(enc, h8[0]).as_text()
    for op in ("tanh", "logistic", "exponential"):
        assert op not in hlo_j, op
    # float appears only at the boundary quantize (round/div on the input)
    assert hlo_j.count("f32[2,40]") <= 4, hlo_j.count("f32[2,40]")


def _trained_transducer(steps=30):
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.rnnt_model import RNNTModel
    from qasr_tpu.train.trainer import RNNTTrainer, TrainConfig
    from tests.test_jasper_model import FEAT, tiny_encoder_cfg

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = RNNTModel.from_config(cfg)
    tr = RNNTTrainer(m, TrainConfig(lr=0.005, warmup_steps=0,
                                    max_steps=steps, log_every=10**9,
                                    grad_clip=1.0))
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    batch = (audio, np.asarray([4000, 4000], np.int32),
             np.asarray([[1, 2, 3, 0]] * 2, np.int32),
             np.asarray([3, 3], np.int32))
    for _ in range(steps):
        tr.train_step(batch)
    return m, audio


def test_frozen_decoder_transcripts_match_float_on_trained_model():
    m, audio = _trained_transducer()
    alens = np.asarray([4000, 4000], np.int32)
    ref = m.transcribe_greedy(audio, alens)
    m.freeze_decoder([(audio, alens)])
    frz = m.transcribe_greedy(audio, alens)
    assert frz == ref, (frz, ref)
    # deterministic across calls
    assert m.transcribe_greedy(audio, alens) == frz


def test_full_integer_transducer():
    """Frozen Conformer encoder + frozen integer decoder: the whole
    transducer serving path is integer arithmetic (two declared float
    boundaries); decoding is deterministic and transcripts match the
    frozen-encoder float-decoder path (random-weight model: allow
    low-margin divergence only in emitted symbols, assert determinism and
    the integer-decoder output is a valid string)."""
    from qasr_tpu.models.config import (
        DecoderConfig, EncoderConfig, ModelConfig,
    )
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.rnnt_model import RNNTModel

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels, preprocessor={"features": 32, "dither": 0.0})
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           dropout=0.0)
    m = RNNTModel.conformer_transducer(cfg, ccfg, seed=0)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    alens = np.asarray([16000, 12800], np.int32)
    m.quantize_encoder([(audio, alens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze_encoder()
    m.freeze_decoder([(audio, alens)])
    out = m.transcribe_greedy(audio, alens)
    assert len(out) == 2 and all(isinstance(t, str) for t in out)
    assert m.transcribe_greedy(audio, alens) == out


def test_frozen_decoder_streaming_matches_offline():
    """StreamingTransducer follows the model's serving mode: with a frozen
    integer decoder, streamed transcripts equal offline frozen-decoder
    transcripts (the integer carry persists across chunks)."""
    from qasr_tpu.decode.streaming import StreamingTransducer

    m, audio = _trained_transducer()
    # streaming needs normalize off for exact stitching
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.rnnt_model import RNNTModel
    from tests.test_jasper_model import FEAT, tiny_encoder_cfg

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0,
                                    "normalize": False})
    m2 = RNNTModel.from_config(cfg)
    m2.params = m.params  # trained weights, normalization-free frontend
    rng = np.random.default_rng(7)
    long_audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
    alens = np.asarray([48000], np.int32)
    m2.freeze_decoder([(long_audio[None], alens)])
    offline = m2.transcribe_greedy(long_audio[None].copy(), alens)[0]
    st = StreamingTransducer(m2, chunk_frames=64)
    assert st.transcribe(long_audio) == offline


def test_bpe_transducer_uses_frozen_decoder(tmp_path):
    """EncDecRNNTBPEModel.transcribe_greedy must route through the frozen
    integer decoder too (review finding: the BPE override bypassed it)."""
    from qasr_tpu.data.tokenizers import BPETokenizer
    from qasr_tpu.models.rnnt_model import EncDecRNNTBPEModel
    from qasr_tpu.quantize import rnnt_freeze
    from tests.test_jasper_model import FEAT, tiny_encoder_cfg
    from qasr_tpu.models.config import DecoderConfig, ModelConfig

    from qasr_tpu.models.rnnt import RNNTConfig

    tok = BPETokenizer.train(["abba cab cabba bac"] * 10, vocab_size=24,
                             save_path=str(tmp_path / "tok.json"))
    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=1),
                      preprocessor={"features": FEAT, "dither": 0.0})
    rnnt_cfg = RNNTConfig(num_classes=tok.vocab_size, enc_hidden=40,
                          pred_hidden=16, joint_hidden=16)
    m = EncDecRNNTBPEModel.from_config_and_tokenizer(cfg, tok,
                                                     rnnt_cfg=rnnt_cfg,
                                                     seed=2)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(1, 4000)) * 0.1).astype(np.float32)
    alens = np.asarray([4000], np.int32)
    m.freeze_decoder([(audio, alens)])
    calls = {"n": 0}
    orig = rnnt_freeze.greedy_decode_frozen

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    rnnt_freeze.greedy_decode_frozen = spy
    try:
        m.transcribe_greedy(audio, alens)
    finally:
        rnnt_freeze.greedy_decode_frozen = orig
    assert calls["n"] == 1
