"""StreamingTransducer (decode/streaming.py): chunked greedy transducer
decoding with the decoder carry (pred-net LSTM state) persisted across
chunks must equal offline transcribe_greedy — conv encoder (float) and
frozen integer local-attention Conformer encoder."""
import numpy as np
import pytest

from qasr_tpu.decode.streaming import StreamingTransducer
from qasr_tpu.models.config import DecoderConfig, EncoderConfig, ModelConfig
from qasr_tpu.models.conformer import ConformerConfig
from qasr_tpu.models.rnnt_model import RNNTModel


def _trained_ish(m, rng):
    """Nudge the joint bias so greedy decoding emits some symbols instead
    of all-blank (random init is blank-dominated)."""
    b = np.asarray(m.params["rnnt"]["joint"]["out"]["b"]).copy()
    b[: m.rnnt_cfg.blank_id] += rng.uniform(0.5, 1.5, size=b.size - 1)
    m.params["rnnt"]["joint"]["out"]["b"] = b


def test_transducer_streaming_conv_encoder():
    from tests.test_jasper_model import FEAT, tiny_encoder_cfg

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0,
                                    "normalize": False})
    m = RNNTModel.from_config(cfg)
    rng = np.random.default_rng(0)
    _trained_ish(m, rng)
    audio = (rng.normal(size=48000) * 0.1).astype(np.float32)

    offline = m.transcribe_greedy(audio[None].copy(),
                                  np.asarray([len(audio)], np.int32))[0]
    st = StreamingTransducer(m, chunk_frames=64)
    partials: list = []
    streamed = st.transcribe(audio, partials=partials)
    assert streamed == offline
    assert offline  # the bias nudge must produce a non-empty hypothesis
    # greedy only appends: every partial is a prefix of the final text
    assert partials[-1] == streamed
    assert all(streamed.startswith(p) for p in partials)


def test_transducer_streaming_frozen_conformer():
    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0, "normalize": False},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           att_context_size=4, dropout=0.0)
    m = RNNTModel.conformer_transducer(cfg, ccfg, seed=0)
    rng = np.random.default_rng(1)
    _trained_ish(m, rng)
    calib = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    clens = np.asarray([16000, 12800], np.int32)
    m.quantize_encoder([(calib, clens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze_encoder()

    audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
    offline = m.transcribe_greedy(audio[None].copy(),
                                  np.asarray([len(audio)], np.int32))[0]
    st = StreamingTransducer(m, chunk_frames=96)
    streamed = st.transcribe(audio)
    assert streamed == offline and offline


def test_unbounded_conformer_transducer_cannot_stream():
    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           att_context_size=-1, dropout=0.0)
    m = RNNTModel.conformer_transducer(cfg, ccfg, seed=0)
    with pytest.raises(ValueError):
        StreamingTransducer(m)


def test_transducer_latency_report():
    from tests.test_jasper_model import FEAT, tiny_encoder_cfg

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0,
                                    "normalize": False})
    m = RNNTModel.from_config(cfg)
    rng = np.random.default_rng(0)
    _trained_ish(m, rng)
    audio = (rng.normal(size=32000) * 0.1).astype(np.float32)
    st = StreamingTransducer(m, chunk_frames=64)
    rep = st.latency_report(audio)
    assert rep["chunks"] >= 2
    assert rep["streaming_rtfx"] > 0
    assert rep["text"] == m.transcribe_greedy(
        audio[None].copy(), np.asarray([len(audio)], np.int32))[0]


def test_transducer_streaming_batch_matches_offline():
    """S sessions advanced per tick with ONE batched encode + ONE batched
    greedy step: every session's transcript equals its own offline
    transcribe_greedy (different lengths; rows advance independently)."""
    from tests.test_jasper_model import FEAT, tiny_encoder_cfg

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0,
                                    "normalize": False})
    m = RNNTModel.from_config(cfg)
    rng = np.random.default_rng(0)
    _trained_ish(m, rng)
    lens = np.asarray([48000, 31000, 40000], np.int32)
    audio = np.zeros((3, 48000), np.float32)
    for i, n in enumerate(lens):
        audio[i, :n] = (rng.normal(size=int(n)) * 0.1).astype(np.float32)

    offline = [m.transcribe_greedy(audio[i:i + 1, : int(lens[i])].copy(),
                                   lens[i:i + 1])[0] for i in range(3)]
    st = StreamingTransducer(m, chunk_frames=64)
    batch = st.transcribe_batch(audio, lens)
    assert batch == offline
    assert any(offline)  # at least one non-empty hypothesis
