"""Streaming / chunked long-audio inference.

The reference bounds utterance length at 16.7 s (max_duration filtering,
conf/quartznet_15x5.yaml:17) and has no streaming story.  Convolutional
encoders have a finite receptive field, so long audio can be processed in
fixed-size chunks with left/right context equal to (half) the receptive
field and the center regions stitched — constant memory, constant compiled
shape, arbitrary audio length.

When the chunk context covers the full receptive field, stitched encoder
outputs are exactly the full-utterance outputs (verified in tests with
utterance-level normalization disabled; with per-feature normalization the
stats are chunk-local, the standard streaming approximation).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from qasr_tpu.models.jasper import EncoderPlan


def _subsampler_span(ccfg) -> Tuple[int, int]:
    """(input-frame span, total stride) of the conv subsampler."""
    import math as _m

    sub, st = 0, 1
    n_sub = int(_m.log2(ccfg.subsampling_factor)) if ccfg.subsampling else 0
    for _ in range(n_sub):
        if ccfg.subsampling == "vggnet":
            sub += 2 * st + 2 * st + 1 * st  # two k=3 convs + maxpool
            st *= 2
        else:
            sub += 2 * st                    # k=3 s=2 valid conv
            st *= 2
    return sub, st


def receptive_field_conformer_lr(ccfg) -> Tuple[int, int, int]:
    """(left field, right field, total stride) in mel frames of a Conformer
    with LOCAL attention.  With causal convs + att_context (L, 0) the right
    field is just the subsampler's few frames — the zero-lookahead
    streaming configuration."""
    left_att, right_att = ccfg.att_context
    if left_att < 0 or right_att < 0:
        raise ValueError("conformer streaming needs a finite receptive "
                         "field: set ConformerConfig.att_context_size")
    sub, st = _subsampler_span(ccfg)
    dw_l, dw_r = ccfg.dw_padding
    rf_l = sub + ccfg.n_layers * (left_att + dw_l) * st
    rf_r = sub + ccfg.n_layers * (right_att + dw_r) * st
    return rf_l, rf_r, st


def receptive_field_conformer(ccfg) -> Tuple[int, int]:
    """(total receptive field, total stride): 1 + subsampler span +
    per-layer (attention left+right + dw taps-1) x stride."""
    left_att, right_att = ccfg.att_context
    if left_att < 0 or right_att < 0:
        raise ValueError("conformer streaming needs a finite receptive "
                         "field: set ConformerConfig.att_context_size")
    sub, st = _subsampler_span(ccfg)
    dw_l, dw_r = ccfg.dw_padding
    per_layer = (left_att + right_att + dw_l + dw_r)
    return 1 + sub + ccfg.n_layers * per_layer * st, st


def receptive_field(plan: EncoderPlan) -> Tuple[int, int]:
    """(receptive field in input frames, total stride) of the conv stack."""
    rf = 1
    stride_total = 1
    for bp in plan.blocks:
        for spec in bp.convs:
            rf += (spec.kernel - 1) * spec.dilation * stride_total
            stride_total *= spec.stride
        for spec in bp.res:  # residual 1x1s don't extend the field
            pass
    return rf, stride_total


@dataclass
class StreamingTranscriber:
    """Chunked greedy transcription over an ASRModel (CTC family).

    chunk_frames/context_frames are in mel-frame units (hop = 10 ms); both
    are rounded to multiples of pad_to * total_stride so chunk shapes are
    static and output indices align.
    """

    model: "ASRModel"  # noqa: F821
    chunk_frames: int = 1600          # 16 s of frames per step
    context_frames: Optional[int] = None  # default: half the receptive field
    # asymmetric contexts (default: symmetric = context_frames).  A causal
    # conformer (att_context (L, 0) + causal_conv) gets context_right ~ the
    # subsampler/STFT edge only — ZERO model lookahead: the added serving
    # latency is one chunk, not chunk + half a receptive field.
    context_left: Optional[int] = None
    context_right: Optional[int] = None

    def __post_init__(self):
        # Conformer encoders (ConformerCTC.ccfg / RNNTModel.plan with
        # encoder_kind='conformer') stream via local attention; conv
        # encoders via the Jasper plan's receptive field
        ccfg = getattr(self.model, "ccfg", None)
        if ccfg is None and getattr(self.model, "encoder_kind",
                                    "") == "conformer":
            ccfg = self.model.plan
        rf_lr = None
        if ccfg is not None:
            self.rf, self.stride = receptive_field_conformer(ccfg)
            rf_lr = receptive_field_conformer_lr(ccfg)
        else:
            self.rf, self.stride = receptive_field(self.model.plan)
        quantum = 16 * self.stride
        fcfg = self.model.frontend.cfg
        # STFT center-padding makes ~n_fft/(2*hop) edge frames window-local
        stft_edge = -(-fcfg.n_fft // (2 * fcfg.hop_length)) + 1

        def up(v):
            return -(-v // quantum) * quantum

        explicit_sym = self.context_frames is not None
        if self.context_frames is None:
            self.context_frames = up(self.rf // 2 + stft_edge)
        else:
            self.context_frames = up(self.context_frames)
        # an EXPLICIT context_frames keeps its historical symmetric
        # meaning; the rf-derived asymmetric defaults apply otherwise
        if self.context_left is None:
            self.context_left = (up(rf_lr[0] + stft_edge)
                                 if rf_lr and not explicit_sym
                                 else self.context_frames)
        else:
            self.context_left = up(self.context_left)
        if self.context_right is None:
            self.context_right = (up(rf_lr[1] + stft_edge)
                                  if rf_lr and not explicit_sym
                                  else self.context_frames)
        else:
            self.context_right = up(self.context_right)
        self.chunk_frames = max(up(self.chunk_frames), quantum)
        self.hop = fcfg.hop_length
        self.sample_rate = fcfg.sample_rate

    @property
    def lookahead_frames(self) -> int:
        """Mel frames of FUTURE audio each chunk's outputs wait for — the
        added latency beyond the chunk itself."""
        return self.context_right

    def _windows(self, n_samples: int):
        """Window geometry shared by every streaming path: yields
        (start, w0, s0, s1, o0) per chunk — the window anchors inside the
        real signal (the first chunk keeps the utterance's own start so
        STFT reflect-padding and conv zero-padding match the
        full-utterance computation exactly)."""
        hop = self.hop
        n_frames = int(math.ceil(n_samples / hop))
        chunk = self.chunk_frames
        win = self.context_left + chunk + self.context_right
        for start in range(0, n_frames, chunk):
            w0 = max(0, start - self.context_left)
            s0 = w0 * hop
            s1 = min(n_samples, (w0 + win) * hop)
            yield start, w0, s0, s1, (start - w0) // self.stride

    def _chunks(self, audio: np.ndarray):
        """Yield per-chunk (log_probs, greedy_ids) for the valid center
        region of each window — concatenated they equal the full-utterance
        outputs (receptive-field context on both sides)."""
        hop, s = self.hop, self.stride
        n_frames = int(math.ceil(len(audio) / hop))
        chunk = self.chunk_frames
        full = (self.context_left + chunk + self.context_right) * hop
        for start, w0, s0, s1, o0 in self._windows(len(audio)):
            seg = audio[s0:s1]
            if len(seg) < full:
                seg = np.concatenate([seg, np.zeros(full - len(seg), audio.dtype)])
            seg_len = s1 - s0
            vals, el0 = self._window_forward(seg, seg_len)
            # valid center region: input frames [start, start+chunk)
            valid_in = min(chunk, n_frames - start)
            o1 = o0 + -(-valid_in // s)
            o1 = min(o1, el0)
            yield tuple(np.asarray(v[o0:o1]) for v in vals)

    def _window_forward(self, seg: np.ndarray, seg_len: int):
        """One padded window -> (per-frame output arrays, valid length).
        The CTC family yields (log_probs, greedy_ids); StreamingTransducer
        overrides this to yield encoder frames instead."""
        out = self.model.forward(seg[None], np.asarray([seg_len]))
        if len(out) == 3:
            lp, el, preds = out
        else:  # ConformerCTC returns (log_probs, enc_lens)
            lp, el = out
            preds = np.argmax(np.asarray(lp), axis=-1)
        return (np.asarray(lp)[0], np.asarray(preds)[0]), int(el[0])

    def predictions(self, audio: np.ndarray) -> np.ndarray:
        """Greedy ids for one long mono signal, chunk-stitched."""
        out: List[np.ndarray] = [p for _, p in self._chunks(audio)]
        return np.concatenate(out) if out else np.zeros((0,), np.int64)

    def transcribe(self, audio: np.ndarray) -> str:
        from qasr_tpu.decode.ctc import ctc_collapse

        preds = self.predictions(audio)
        return ctc_collapse(preds[None], self.model.blank_id,
                            self.model.vocabulary)[0]

    def latency_report(self, audio: np.ndarray, beam: bool = False,
                       **beam_kwargs) -> dict:
        """Measure the streaming serving latencies (VERDICT r2 weak-point 6):
        per-chunk processing latency (device forward + stitch + optional
        beam update), first-partial latency, and the sustained streaming
        RTFx (audio seconds per processing second).  Chunks are processed
        back-to-back — the report isolates compute latency from audio
        arrival time, i.e. the added latency a real-time caller would see
        on top of each chunk's accumulation.
        """
        import time

        dec = None
        if beam:
            from qasr_tpu.decode.beam_search import StreamingBeamDecoder

            dec = StreamingBeamDecoder(self.model.vocabulary, **beam_kwargs)
        lat: List[float] = []
        chunks = self._chunks(audio)
        audio_sec = len(audio) / float(self.sample_rate)
        t_all0 = time.perf_counter()
        while True:
            t0 = time.perf_counter()
            try:
                lp, preds = next(chunks)
            except StopIteration:
                break
            if dec is not None:
                dec.feed(lp)
                best = dec.best(1)
                _ = best[0][1] if best else ""
            lat.append(time.perf_counter() - t0)
        total = time.perf_counter() - t_all0
        if not lat:
            return {"chunks": 0}
        lat_ms = np.asarray(lat) * 1e3
        return {
            "chunks": len(lat),
            "chunk_audio_s": self.chunk_frames * self.hop / self.sample_rate,
            "first_chunk_latency_ms": float(lat_ms[0]),
            "mean_chunk_latency_ms": float(lat_ms.mean()),
            "p95_chunk_latency_ms": float(np.percentile(lat_ms, 95)),
            "steady_chunk_latency_ms": float(np.median(lat_ms[1:])
                                             if len(lat_ms) > 1 else lat_ms[0]),
            "streaming_rtfx": audio_sec / total,
        }

    def transcribe_beam(self, audio: np.ndarray, decoder=None,
                        partials: Optional[List[str]] = None,
                        **beam_kwargs) -> str:
        """Streaming beam-search transcription (optionally LM-scored).

        The resumable C++ prefix beam search (decode/beam_search.py
        StreamingBeamDecoder) carries its beam state across chunks, so the
        final transcript equals offline beam decoding of the whole
        utterance.  ``partials``, if given, collects the running best
        hypothesis after each chunk (what a live caption would display).
        """
        from qasr_tpu.decode.beam_search import StreamingBeamDecoder

        dec = decoder
        if dec is None:
            dec = StreamingBeamDecoder(self.model.vocabulary, **beam_kwargs)
        for lp, _ in self._chunks(audio):
            dec.feed(lp)
            if partials is not None:
                best = dec.best(1)
                partials.append(best[0][1] if best else "")
        best = dec.best(1)
        return best[0][1] if best else ""


@dataclass
class StreamingTransducer(StreamingTranscriber):
    """Chunked streaming greedy transcription for transducers (RNNTModel —
    conv or local-attention Conformer encoder, float / PTQ / frozen
    integer).

    Encoder chunks are receptive-field stitched exactly like the CTC
    streamer; the greedy decoder's carry (pred-net LSTM state, last
    pred-net output, hypothesis — models/rnnt.py::greedy_decode_frames)
    persists across chunks, so feeding chunks reproduces the offline
    frame sequence exactly and the final transcript EQUALS offline
    ``transcribe_greedy`` whenever the stitched encoder frames do (always,
    for the frozen integer encoder; the conv/conformer float paths are
    bit-stable in practice — tests assert equality).

    ``partials``, if passed to transcribe, collects the running hypothesis
    after each chunk — the live-caption stream.  The reference has no
    streaming transducer at all (rnnt_greedy_decoding.py decodes full
    utterances only).
    """

    max_symbols_per_step: int = 10

    def _window_forward(self, seg: np.ndarray, seg_len: int):
        enc, el = self.model.encode(seg[None],
                                    np.asarray([seg_len], np.int32))
        return (np.asarray(enc)[0],), int(el[0])

    def predictions(self, audio: np.ndarray):
        raise NotImplementedError(
            "transducers have no frame-wise greedy ids; use transcribe / "
            "transcribe_batch")

    def transcribe_beam(self, audio: np.ndarray, *a, **k):
        raise NotImplementedError(
            "CTC streaming beam search does not apply to transducers; use "
            "RNNTModel.transcribe_beam offline or transcribe() here")

    def _decoder_fns(self):
        """(init(batch) -> carry, frames(enc, lens, carry) -> carry) for
        the model's active decoder: the frozen integer pred+joint
        (quantize/rnnt_freeze.py) when freeze_decoder has run, else the
        float pred-net — streaming follows the model's serving mode."""
        m = self.model
        if getattr(m, "dec_frozen", None) is not None:
            from qasr_tpu.quantize.rnnt_freeze import (
                frozen_decoder_init, greedy_decode_frames_frozen,
            )

            return (lambda b: frozen_decoder_init(m.dec_frozen, m.rnnt_cfg,
                                                  b),
                    lambda enc, lens, carry: greedy_decode_frames_frozen(
                        m.dec_frozen, m.rnnt_cfg, enc, lens, carry,
                        self.max_symbols_per_step))
        from qasr_tpu.models.rnnt import greedy_decode_frames, greedy_init

        return (lambda b: greedy_init(m.params["rnnt"], m.rnnt_cfg, b),
                lambda enc, lens, carry: greedy_decode_frames(
                    m.params["rnnt"], m.rnnt_cfg, enc, lens, carry,
                    self.max_symbols_per_step))

    def transcribe(self, audio: np.ndarray,
                   partials: Optional[List[str]] = None) -> str:
        init, frames = self._decoder_fns()
        carry = init(1)
        for (enc_c,) in self._chunks(audio):
            if len(enc_c):
                carry = frames(enc_c[None], np.asarray([len(enc_c)]), carry)
            if partials is not None:
                partials.append(self._text(carry[2][0]))
        return self._text(carry[2][0])

    def _text(self, ids: List[int]) -> str:
        tok = getattr(self.model, "tokenizer", None)
        if tok is not None:
            return tok.ids_to_text([int(i) for i in ids])
        labels = list(self.model.cfg.labels)
        return "".join(labels[int(i)] for i in ids)

    def transcribe_batch(self, audio: np.ndarray,
                         alens: np.ndarray) -> List[str]:
        """S live sessions advanced together — the serving shape (one
        (S, win) window batch into the encoder, ONE batched greedy step per
        tick; the carry is batched, rows advance independently).  Each
        session's transcript equals its offline transcribe_greedy (the
        batched emit loop only advances rows that emit).

        audio: (S, L) padded signals; alens: (S,) valid samples.
        """
        m = self.model
        init, frames = self._decoder_fns()
        audio = np.asarray(audio)
        alens = np.asarray(alens)
        s_n, hop, s = audio.shape[0], self.hop, self.stride
        n_frames = np.ceil(alens / hop).astype(np.int64)
        chunk = self.chunk_frames
        full = (self.context_left + chunk + self.context_right) * hop
        carry = init(s_n)
        # geometry from the SAME iterator the per-session path uses, sized
        # by the longest stream (shorter rows mask out via n_valid)
        for start, w0, s0, s1, o0 in self._windows(int(alens.max())):
            seg = audio[:, s0:s1]
            if seg.shape[1] < full:
                seg = np.concatenate(
                    [seg, np.zeros((s_n, full - seg.shape[1]),
                                   audio.dtype)], axis=1)
            seg_lens = np.clip(np.minimum(alens, s0 + full) - s0,
                               0, full).astype(np.int32)
            enc, el = m.encode(seg, seg_lens)
            enc, el = np.asarray(enc), np.asarray(el)
            valid_in = np.clip(np.minimum(chunk, n_frames - start), 0, None)
            o1 = np.minimum(o0 + -(-valid_in // s), el).astype(np.int64)
            n_valid = np.clip(o1 - o0, 0, None).astype(np.int32)
            t_max = int(n_valid.max())
            if t_max == 0:
                continue
            carry = frames(enc[:, o0:o0 + t_max], n_valid, carry)
        return [self._text(h) for h in carry[2]]

    def latency_report(self, audio: np.ndarray, beam: bool = False,
                       **beam_kwargs) -> dict:
        """Streaming-serving latencies with the greedy DECODE on the clock
        (encoder chunk + transducer emit loop per chunk) — the transducer
        counterpart of the CTC streamer's report."""
        if beam or beam_kwargs:
            raise NotImplementedError("transducer streaming is greedy; the "
                                      "beam options are CTC-only")
        import time

        init, frames = self._decoder_fns()
        carry = init(1)
        lat: List[float] = []
        chunks = self._chunks(audio)
        audio_sec = len(audio) / float(self.sample_rate)
        t_all0 = time.perf_counter()
        while True:
            t0 = time.perf_counter()
            try:
                (enc_c,) = next(chunks)
            except StopIteration:
                break
            if len(enc_c):
                carry = frames(enc_c[None], np.asarray([len(enc_c)]), carry)
            lat.append(time.perf_counter() - t0)
        total = time.perf_counter() - t_all0
        if not lat:
            return {"chunks": 0}
        lat_ms = np.asarray(lat) * 1e3
        return {
            "chunks": len(lat),
            "chunk_audio_s": self.chunk_frames * self.hop / self.sample_rate,
            "first_chunk_latency_ms": float(lat_ms[0]),
            "mean_chunk_latency_ms": float(lat_ms.mean()),
            "p95_chunk_latency_ms": float(np.percentile(lat_ms, 95)),
            "steady_chunk_latency_ms": float(np.median(lat_ms[1:])
                                             if len(lat_ms) > 1
                                             else lat_ms[0]),
            "streaming_rtfx": audio_sec / total,
            "text": self._text(carry[2][0]),
        }


class CacheAwareConformerStream:
    """O(1)-state streaming for a FROZEN causal Conformer-CTC: per-layer
    int8 key/value and conv-tail caches (quantize/conformer_freeze.py::
    frozen_stream_step) instead of re-computing a left-context window per
    chunk — each fed frame is processed exactly once, and the emitted
    encodings are BIT-IDENTICAL to the offline frozen forward (all ops
    integer; the caches hold exactly what the offline computation sees).

    Requires the zero-lookahead configuration: att_context_size=(L, 0),
    causal_conv=True, a frozen model (ConformerCTC.freeze()), and a
    'striding' subsampler; per-feature normalization must be off (its
    statistics are utterance-global).

    feed(audio) / feed_feats(feats) consume NEW samples/mel frames and
    return the NEW greedy ids; text() collapses everything emitted so far.
    """

    def __init__(self, model):
        ccfg = model.ccfg
        left, right = ccfg.att_context
        if left < 0 or right != 0 or not ccfg.causal_conv:
            raise ValueError("cache-aware streaming needs "
                             "att_context_size=(L, 0) + causal_conv=True")
        if model.enc_frozen is None:
            raise ValueError("freeze the model first (ConformerCTC.freeze)")
        if ccfg.subsampling != "striding":
            raise NotImplementedError("striding subsampler only")
        if model.frontend.cfg.normalize:
            raise ValueError("per-feature normalization is utterance-"
                             "global; build the model with normalize=False")
        self.model = model
        self.ccfg = ccfg
        self.tables = model.enc_frozen
        import math as _m

        n_sub = int(_m.log2(ccfg.subsampling_factor))
        self._sub_win = 2 ** (n_sub + 1) - 1     # subsampler window
        self._sub_stride = ccfg.subsampling_factor
        fcfg = model.frontend.cfg
        self._hop = fcfg.hop_length
        # a mel frame's nonzero support is win_length/2 on each side; a
        # frame is emitted only once its real future samples have arrived
        # (otherwise the re-windowed frontend would silently reflect-pad
        # fake samples and diverge from offline)
        self._w2 = fcfg.win_length // 2
        # audio lead frames discarded from each re-windowed frontend call:
        # enough that every kept frame's STFT window (and the preemphasis
        # sample) lies fully inside the provided segment
        self._lead = -(-max(fcfg.n_fft // 2, self._w2) // fcfg.hop_length) + 1
        self.reset()

    def reset(self):
        from qasr_tpu.quantize.conformer_freeze import frozen_stream_init

        self._state = frozen_stream_init(self.tables, self.ccfg, 1)
        self._feat_buf = np.zeros((0, self.ccfg.feat_in), np.float32)
        self._sub_done = 0       # subsampled frames consumed
        self._audio_tail = np.zeros((0,), np.float32)
        self._audio_off = 0      # absolute sample index of _audio_tail[0]
        self._frames_done = 0    # mel frames already pushed to _feat_buf
        self._ids: List[int] = []

    # -- feature-level ------------------------------------------------------

    def feed_feats(self, feats: np.ndarray) -> np.ndarray:
        """feats (n, F) new mel frames -> new greedy ids (m,)."""
        import jax.numpy as jnp

        from qasr_tpu.quantize.conformer_freeze import frozen_stream_step
        from qasr_tpu.models.conformer import subsample_convs

        self._feat_buf = np.concatenate(
            [self._feat_buf, np.asarray(feats, np.float32)], axis=0)
        f_total = self._sub_done * self._sub_stride + self._feat_buf.shape[0]
        j_avail = max(0, (f_total - self._sub_win) // self._sub_stride + 1)
        n_new = j_avail - self._sub_done
        if n_new <= 0:
            return np.zeros((0,), np.int64)
        need = (n_new - 1) * self._sub_stride + self._sub_win
        seg = self._feat_buf[:need]
        x_sub, _ = subsample_convs(self.tables["subsampler"], self.ccfg,
                                   jnp.asarray(seg[None]),
                                   jnp.asarray([seg.shape[0]], np.int32))
        x_sub = x_sub[:, :n_new]
        enc, self._state = frozen_stream_step(self.tables, self.ccfg,
                                              x_sub, self._state)
        # drop consumed feats (keep the overlap the next window needs)
        self._feat_buf = self._feat_buf[n_new * self._sub_stride:]
        self._sub_done = j_avail
        log_probs = self.model._head(self.model.params, enc)
        ids = np.argmax(np.asarray(log_probs), axis=-1)[0]
        self._ids.extend(int(i) for i in ids)
        return ids

    # -- audio-level ---------------------------------------------------------

    def feed(self, audio: np.ndarray) -> np.ndarray:
        """audio (n,) new samples -> new greedy ids.  The mel frontend is
        re-windowed with a small discarded lead so every emitted frame's
        STFT window lies fully inside real signal — the frames equal the
        offline full-utterance frontend exactly."""
        self._audio_tail = np.concatenate(
            [self._audio_tail, np.asarray(audio, np.float32)])
        total_samples = self._audio_off + len(self._audio_tail)
        # frame f needs real samples up to f*hop + win/2
        n_frames_avail = max(0, (total_samples - self._w2) // self._hop + 1) \
            if total_samples >= self._w2 else 0
        n_new = n_frames_avail - self._frames_done
        if n_new <= 0:
            return np.zeros((0,), np.int64)
        # window start: `lead` frames before the first new frame (clamped
        # to the utterance start, where the offline reflect-pad applies)
        w0 = max(0, self._frames_done - self._lead)
        s0 = w0 * self._hop
        seg = self._audio_tail[s0 - self._audio_off:]
        feats, _ = self.model.frontend(
            seg[None], np.asarray([len(seg)], np.int32), dither=0.0)
        feats = np.asarray(feats)[0]
        new_feats = feats[self._frames_done - w0:
                          self._frames_done - w0 + n_new]
        self._frames_done += n_new
        # retain only the audio the next lead window needs
        keep_from = max(0, (self._frames_done - self._lead) * self._hop)
        self._audio_tail = self._audio_tail[keep_from - self._audio_off:]
        self._audio_off = keep_from
        return self.feed_feats(new_feats)

    def flush(self) -> np.ndarray:
        """End of stream: emit the trailing frames whose STFT windows
        extend past the final sample — the offline frontend reflect-pads
        those, and so does this (the buffered tail ends at the true end),
        so flushed frames equal the offline computation's."""
        total_samples = self._audio_off + len(self._audio_tail)
        n_total = -(-total_samples // self._hop)  # offline ceil(L/hop)
        n_new = n_total - self._frames_done
        if n_new <= 0:
            return np.zeros((0,), np.int64)
        w0 = max(0, self._frames_done - self._lead)
        seg = self._audio_tail[w0 * self._hop - self._audio_off:]
        feats, _ = self.model.frontend(
            seg[None], np.asarray([len(seg)], np.int32), dither=0.0)
        feats = np.asarray(feats)[0]
        new_feats = feats[self._frames_done - w0:
                          self._frames_done - w0 + n_new]
        self._frames_done = n_total
        return self.feed_feats(new_feats)

    def text(self) -> str:
        from qasr_tpu.decode.ctc import ctc_collapse

        if not self._ids:
            return ""
        return ctc_collapse(np.asarray(self._ids)[None],
                            self.model.blank_id,
                            self.model.vocabulary)[0]

    def latency_report(self, audio: np.ndarray,
                       chunk_samples: int) -> dict:
        """Cache-aware counterpart of StreamingTranscriber.latency_report:
        feed `audio` in fixed `chunk_samples` slices back-to-back, timing
        each feed() (frontend + subsampler + frozen stream step + head +
        greedy), plus the final flush().  Fields match the windowed
        streamers' report so PERF/BENCH tables line up; `state_frames` is
        the O(1) per-layer cache depth (the whole point vs the re-windowed
        streamer's receptive-field recompute)."""
        import time

        self.reset()
        lat: List[float] = []
        t_all0 = time.perf_counter()
        for s0 in range(0, len(audio), chunk_samples):
            t0 = time.perf_counter()
            self.feed(audio[s0:s0 + chunk_samples])
            lat.append(time.perf_counter() - t0)
        self.flush()
        total = time.perf_counter() - t_all0
        if not lat:
            return {"chunks": 0}
        fcfg = self.model.frontend.cfg
        lat_ms = np.asarray(lat) * 1e3
        return {
            "chunks": len(lat),
            "chunk_audio_s": chunk_samples / float(fcfg.sample_rate),
            "first_chunk_latency_ms": float(lat_ms[0]),
            "mean_chunk_latency_ms": float(lat_ms.mean()),
            "p95_chunk_latency_ms": float(np.percentile(lat_ms, 95)),
            "steady_chunk_latency_ms": float(np.median(lat_ms[1:])
                                             if len(lat_ms) > 1
                                             else lat_ms[0]),
            "streaming_rtfx": len(audio) / float(fcfg.sample_rate) / total,
            "state_frames": int(self.ccfg.att_context[0]),
        }
