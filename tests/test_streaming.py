"""Streaming/chunked inference: stitched predictions must equal the
full-utterance predictions when chunk context covers the receptive field
(normalization disabled so features are chunk-independent)."""
import numpy as np
import pytest

from qasr_tpu.decode.streaming import StreamingTranscriber, receptive_field
from qasr_tpu.models.config import DecoderConfig, ModelConfig
from qasr_tpu.models.ctc_model import ASRModel
from tests.test_jasper_model import tiny_encoder_cfg, FEAT


def _model():
    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0,
                                    "normalize": False})
    return ASRModel.from_config(cfg)


def test_receptive_field_calc():
    m = _model()
    rf, stride = receptive_field(m.plan)
    # tiny cfg: k7 s2 sep (dw rf+6) + 2 blocks of 2x(k5 dw at stride 2)
    assert stride == 2
    assert rf == 1 + 6 + 4 * (4 * 2)


def test_streaming_matches_full(rng):
    m = _model()
    m.set_quant_mode("none")
    audio = (rng.normal(size=64000) * 0.1).astype(np.float32)
    # full-utterance reference
    _, el, preds_full = m.forward(audio[None].copy(),
                                  np.asarray([len(audio)], np.int32),
                                  mode="fp32")
    st = StreamingTranscriber(m, chunk_frames=96, context_frames=64)
    preds_stream = st.predictions(audio)
    n = int(el[0])
    assert len(preds_stream) >= n
    agree = np.mean(preds_full[0, :n] == preds_stream[:n])
    assert agree == 1.0, agree


def test_streaming_transcribe_smoke(rng):
    m = _model()
    m.set_quant_mode("none")
    st = StreamingTranscriber(m, chunk_frames=96)
    text = st.transcribe((rng.normal(size=40000) * 0.1).astype(np.float32))
    assert isinstance(text, str)


def test_streaming_latency_report(rng):
    """latency_report measures per-chunk latencies and sustained streaming
    RTFx for greedy and beam streaming (the serving-latency observables;
    chip numbers are recorded in PERF.md)."""
    m = _model()
    m.set_quant_mode("none")
    st = StreamingTranscriber(m, chunk_frames=96, context_frames=64)
    audio = (rng.normal(size=96000) * 0.1).astype(np.float32)
    for beam in (False, True):
        rep = st.latency_report(audio, beam=beam, beam_width=4)
        assert rep["chunks"] >= 3
        assert rep["chunk_audio_s"] > 0
        assert rep["first_chunk_latency_ms"] > 0
        assert rep["p95_chunk_latency_ms"] >= rep["steady_chunk_latency_ms"] * 0.5
        assert rep["streaming_rtfx"] > 0


def test_conformer_streaming_matches_full():
    """Local-attention Conformer streams with exact center-stitching: the
    chunked greedy ids equal the full-utterance ids (normalization off,
    receptive field finite via att_context_size)."""
    import jax.numpy as jnp

    from qasr_tpu.decode.streaming import receptive_field_conformer
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC

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
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rf, stride = receptive_field_conformer(ccfg)
    assert stride == 4
    # 2 striding levels (k3 s2): rf 1+2+4 = 7; + 1 layer (2*4 + 8) * 4
    assert rf == 7 + (2 * 4 + 8) * 4

    rng = np.random.default_rng(0)
    audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
    lp, el = m.forward(audio[None].copy(),
                       np.asarray([len(audio)], np.int32))
    preds_full = np.argmax(np.asarray(lp), axis=-1)[0][: int(el[0])]

    st = StreamingTranscriber(m, chunk_frames=96)
    preds_stream = st.predictions(audio)[: int(el[0])]
    np.testing.assert_array_equal(preds_stream, preds_full)

    # unbounded attention cannot stream
    import dataclasses as dc
    m2 = ConformerCTC.from_config(
        cfg, dc.replace(ccfg, att_context_size=-1), seed=0)
    with pytest.raises(ValueError):
        StreamingTranscriber(m2)


def test_frozen_conformer_streaming_matches_full():
    """The FROZEN integer-only local-attention Conformer streams bit-exactly:
    all scales are static and every op is integer, so the chunked window
    computation has no reduction-order drift to begin with — streamed ids
    must EQUAL the full-utterance frozen forward."""
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC

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
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rng = np.random.default_rng(3)
    calib = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    clens = np.asarray([16000, 12800], np.int32)
    m.quantize_encoder([(calib, clens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze()

    audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
    lp, el = m.forward(audio[None].copy(),
                       np.asarray([len(audio)], np.int32))
    preds_full = np.argmax(np.asarray(lp), axis=-1)[0][: int(el[0])]

    st = StreamingTranscriber(m, chunk_frames=96)
    preds_stream = st.predictions(audio)[: int(el[0])]
    np.testing.assert_array_equal(preds_stream, preds_full)


def test_zero_lookahead_causal_conformer_streaming():
    """Causal streaming configuration — att_context (L, 0) + causal
    depthwise convs: the streamer's right context (model lookahead)
    collapses to the subsampler/STFT edge only, and chunked greedy ids
    still EQUAL the full-utterance ids."""
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC
    from qasr_tpu.decode.streaming import receptive_field_conformer_lr

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0, "normalize": False},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=2, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           att_context_size=(8, 0), causal_conv=True,
                           dropout=0.0)
    rf_l, rf_r, st = receptive_field_conformer_lr(ccfg)
    assert st == 4
    # right field: subsampler only (attention and convs are causal)
    assert rf_r == 6 and rf_l == 6 + 2 * (8 + 8) * 4

    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
    lp, el = m.forward(audio[None].copy(),
                       np.asarray([len(audio)], np.int32))
    preds_full = np.argmax(np.asarray(lp), axis=-1)[0][: int(el[0])]

    stream = StreamingTranscriber(m, chunk_frames=64)
    # zero model lookahead: right context is one quantum (64 frames =
    # 0.64 s) vs the symmetric default of rf//2 rounded up
    assert stream.lookahead_frames <= 64
    assert stream.context_left >= rf_l
    preds_stream = stream.predictions(audio)[: int(el[0])]
    np.testing.assert_array_equal(preds_stream, preds_full)


def test_causal_conformer_frozen_streams_exactly():
    """The causal configuration survives the full integer program: PTQ with
    every integer flag + freeze, then zero-lookahead streaming ids EQUAL
    the full-utterance frozen forward bit-exactly."""
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC

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
                           att_context_size=(6, 0), causal_conv=True,
                           dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rng = np.random.default_rng(3)
    calib = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    clens = np.asarray([16000, 12800], np.int32)
    m.quantize_encoder([(calib, clens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze()

    audio = (rng.normal(size=48000) * 0.1).astype(np.float32)
    lp, el = m.forward(audio[None].copy(),
                       np.asarray([len(audio)], np.int32))
    preds_full = np.argmax(np.asarray(lp), axis=-1)[0][: int(el[0])]
    stream = StreamingTranscriber(m, chunk_frames=64)
    assert stream.lookahead_frames <= 64
    preds_stream = stream.predictions(audio)[: int(el[0])]
    np.testing.assert_array_equal(preds_stream, preds_full)


def _causal_frozen_conformer(n_layers=2, seed=0):
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0, "normalize": False},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=n_layers, d_model=64,
                           n_heads=4, subsampling="striding",
                           subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           att_context_size=(8, 0), causal_conv=True,
                           dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=seed)
    rng = np.random.default_rng(seed)
    calib = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    clens = np.asarray([16000, 12800], np.int32)
    m.quantize_encoder([(calib, clens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze()
    return m


def test_cache_aware_stream_bit_exact_feats():
    """frozen_stream_step with per-layer caches: feature chunks through the
    stateful executor produce encodings BIT-IDENTICAL to the offline
    frozen forward (every op integer; the caches hold exactly what the
    offline computation sees), across uneven chunk sizes."""
    import jax.numpy as jnp

    from qasr_tpu.models.conformer import subsample_convs
    from qasr_tpu.quantize.conformer_freeze import (
        frozen_conformer_apply, frozen_stream_init, frozen_stream_step,
    )

    m = _causal_frozen_conformer()
    tables, ccfg = m.enc_frozen, m.ccfg
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=(1, 48000)) * 0.1).astype(np.float32)
    feats, flens = m.frontend(audio, np.asarray([48000], np.int32),
                              dither=0.0)
    enc_ref, el = frozen_conformer_apply(tables, ccfg, feats, flens)
    enc_ref = np.asarray(enc_ref)[0, : int(el[0])]
    x_sub, slens = subsample_convs(tables["subsampler"], ccfg, feats, flens)
    x_sub = np.asarray(x_sub)[0, : int(slens[0])]

    state = frozen_stream_init(tables, ccfg, 1)
    outs = []
    i = 0
    for n in (5, 16, 3, 16, 16, 16, 16):  # deliberately uneven chunks
        chunk = x_sub[i: i + n]
        i += n
        if not len(chunk):
            break
        o, state = frozen_stream_step(tables, ccfg,
                                      jnp.asarray(chunk[None]), state)
        outs.append(np.asarray(o)[0])
    enc_stream = np.concatenate(outs, axis=0)[: enc_ref.shape[0]]
    np.testing.assert_array_equal(enc_stream, enc_ref)


def test_cache_aware_stream_audio_level():
    """CacheAwareConformerStream end to end: raw audio chunks -> greedy ids
    equal to the offline frozen forward's, and the collapsed text equals
    offline transcription."""
    from qasr_tpu.decode.streaming import CacheAwareConformerStream

    m = _causal_frozen_conformer(n_layers=1, seed=2)
    rng = np.random.default_rng(2)
    audio = (rng.normal(size=40000) * 0.1).astype(np.float32)
    lp, el = m.forward(audio[None].copy(),
                       np.asarray([len(audio)], np.int32))
    ids_ref = np.argmax(np.asarray(lp), axis=-1)[0][: int(el[0])]
    offline_text = m.transcribe_greedy(audio[None].copy(),
                                       np.asarray([len(audio)], np.int32))[0]

    st = CacheAwareConformerStream(m)
    got = []
    for i in range(0, len(audio), 6400):  # 0.4 s chunks
        got.extend(st.feed(audio[i:i + 6400]).tolist())
    got = np.asarray(got[: len(ids_ref)])
    np.testing.assert_array_equal(got, ids_ref)
    assert st.text() == offline_text

    # reset really clears the state
    st.reset()
    got2 = []
    for i in range(0, len(audio), 6400):
        got2.extend(st.feed(audio[i:i + 6400]).tolist())
    np.testing.assert_array_equal(np.asarray(got2[: len(ids_ref)]), ids_ref)


def test_cache_aware_stream_flush_and_wide_window():
    """flush() drains the trailing frames of a non-hop-aligned utterance
    (total streamed frames == offline), and a window_size=0.025 frontend
    (win_length > 2*hop) still matches offline exactly — frames are only
    emitted once their real future samples have arrived."""
    from qasr_tpu.decode.streaming import CacheAwareConformerStream
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC

    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels,
        preprocessor={"features": 32, "dither": 0.0, "normalize": False,
                      "window_size": 0.025},
    )
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           att_context_size=(8, 0), causal_conv=True,
                           dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=4)
    rng = np.random.default_rng(4)
    calib = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    m.quantize_encoder([(calib, np.asarray([16000, 12800], np.int32))],
                       quantize_attention=True, integer_softmax=True,
                       integer_layernorm=True, integer_activations=True,
                       static_attention=True)
    m.freeze()

    n_samp = 40075  # NOT hop-aligned
    audio = (rng.normal(size=n_samp) * 0.1).astype(np.float32)
    lp, el = m.forward(audio[None].copy(), np.asarray([n_samp], np.int32))
    ids_ref = np.argmax(np.asarray(lp), axis=-1)[0][: int(el[0])]
    offline_text = m.transcribe_greedy(audio[None].copy(),
                                       np.asarray([n_samp], np.int32))[0]

    st = CacheAwareConformerStream(m)
    got = []
    for i in range(0, n_samp, 6400):
        got.extend(st.feed(audio[i:i + 6400]).tolist())
    got.extend(st.flush().tolist())
    assert len(got) == len(ids_ref), (len(got), len(ids_ref))
    np.testing.assert_array_equal(np.asarray(got), ids_ref)
    assert st.text() == offline_text


def test_cache_aware_latency_report_fields():
    """latency_report (bench --streaming backend): feeds the whole signal,
    reports the shared field schema, resets state first (a prior feed must
    not leak into the report's transcript)."""
    from qasr_tpu.decode.streaming import CacheAwareConformerStream

    m = _causal_frozen_conformer(n_layers=1, seed=5)
    st = CacheAwareConformerStream(m)
    rng = np.random.default_rng(5)
    audio = (rng.normal(size=32000) * 0.1).astype(np.float32)
    st.feed(audio[:8000])  # stale state the report must reset away
    rep = st.latency_report(audio, chunk_samples=8000)
    assert rep["chunks"] == 4
    assert rep["chunk_audio_s"] == 0.5
    for k in ("first_chunk_latency_ms", "steady_chunk_latency_ms",
              "p95_chunk_latency_ms", "mean_chunk_latency_ms",
              "streaming_rtfx"):
        assert rep[k] > 0
    assert rep["state_frames"] == 8
    # the report's full pass equals offline greedy (reset + feed + flush)
    offline = m.transcribe_greedy(audio[None].copy(),
                                  np.asarray([32000], np.int32))[0]
    assert st.text() == offline
