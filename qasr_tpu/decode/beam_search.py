"""Beam search decoding (native C++ with optional ARPA LM).

Equivalent of the reference BeamSearchDecoderWithLM
(modules/beam_search_decoder.py:16-104), which wraps the external
`ctc_decoders` C++/SWIG package.  Here the native decoder is in-tree
(qasr_tpu/native/ctc_beam_search.cpp), compiled on demand with g++ and
loaded via ctypes; `beam_search_python` is a pure-Python reference of the
same algorithm used for cross-checking and as a fallback.
"""
from __future__ import annotations

import ctypes
import math
import os
import subprocess
import tempfile
from collections import defaultdict
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB: Optional[ctypes.CDLL] = None


def _build_native() -> str:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "ctc_beam_search.cpp"))
    out = os.path.abspath(os.path.join(_NATIVE_DIR, "libctc_beam.so"))
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out,
           "-pthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_native())
        lib.qasr_lm_load.restype = ctypes.c_void_p
        lib.qasr_lm_load.argtypes = [ctypes.c_char_p]
        lib.qasr_lm_free.argtypes = [ctypes.c_void_p]
        lib.qasr_lm_order.restype = ctypes.c_int
        lib.qasr_lm_order.argtypes = [ctypes.c_void_p]
        lib.qasr_lm_convert.restype = ctypes.c_int
        lib.qasr_lm_convert.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.qasr_beam_search_batch.restype = ctypes.c_int
        lib.qasr_beam_search_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.qasr_beam_stream_create.restype = ctypes.c_void_p
        lib.qasr_beam_stream_create.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.qasr_beam_stream_feed.restype = ctypes.c_int
        lib.qasr_beam_stream_feed.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.qasr_beam_stream_best.restype = ctypes.c_int
        lib.qasr_beam_stream_best.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.qasr_beam_stream_reset.argtypes = [ctypes.c_void_p]
        lib.qasr_beam_stream_free.argtypes = [ctypes.c_void_p]
        lib.qasr_beam_stream_feed_batch.restype = ctypes.c_int
        lib.qasr_beam_stream_feed_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
    return _LIB


def _max_symbol_bytes(vocab: Sequence[str]) -> int:
    """Longest vocab symbol in UTF-8 bytes (>= 1) — sizes text buffers so
    strncpy truncation can never cut a multi-byte codepoint short."""
    return max((len(s.encode("utf-8")) for s in vocab), default=1) or 1


def convert_arpa_to_binary(arpa_path: str, out_path: str) -> str:
    """Convert a text ARPA LM to the mmap'd '.qlm' binary (an open-addressing
    table of 64-bit n-gram fingerprints — the KenLM 'probing' layout).  Load
    becomes O(1) mmap instead of a text parse, which is what makes real
    4-gram LMs usable (the reference gets this from KenLM binaries through
    ctc_decoders, beam_search_decoder.py:60-104)."""
    rc = _lib().qasr_lm_convert(arpa_path.encode(), out_path.encode())
    if rc != 0:
        raise RuntimeError(f"ARPA->qlm conversion failed: rc={rc}")
    return out_path


class BeamSearchDecoderWithLM:
    """Reference API (beam_search_decoder.py:19-104): vocab, beam_width,
    alpha, beta, lm_path, num_cpus, cutoff_prob, cutoff_top_n; __call__ takes
    (log_probs (B,T,V+1), lengths) and returns per-sample n-best
    [(score, text), ...] lists.  lm_path may be a text ARPA or a '.qlm'
    binary (format auto-detected)."""

    def __init__(self, vocab: Sequence[str], beam_width: int = 128,
                 alpha: float = 0.0, beta: float = 0.0,
                 lm_path: Optional[str] = None, num_cpus: int = 4,
                 cutoff_prob: float = 1.0, cutoff_top_n: int = 40):
        self.vocab = list(vocab)
        self.beam_width = beam_width
        self.alpha = alpha
        self.beta = beta
        self.num_cpus = num_cpus
        self.cutoff_prob = cutoff_prob
        self.cutoff_top_n = cutoff_top_n
        self._lm = None
        if lm_path:
            self._lm = _lib().qasr_lm_load(lm_path.encode())
            if not self._lm:
                raise FileNotFoundError(f"cannot load ARPA LM: {lm_path}")

    def __del__(self):
        if getattr(self, "_lm", None):
            try:
                _lib().qasr_lm_free(self._lm)
            except Exception:
                pass

    def __call__(self, log_probs: np.ndarray, log_probs_length: np.ndarray,
                 n_best: int = 1) -> List[List[Tuple[float, str]]]:
        lp = np.ascontiguousarray(np.asarray(log_probs, np.float32))
        lens = np.ascontiguousarray(np.asarray(log_probs_length, np.int32))
        b, t, v = lp.shape
        assert v == len(self.vocab) + 1, "blank must be the last index"
        # at most one emitted symbol per frame; symbols may be multi-byte
        # UTF-8 (or multi-char BPE pieces), so size by the longest one
        max_text = t * _max_symbol_bytes(self.vocab) + 1
        texts = ctypes.create_string_buffer(b * n_best * max_text)
        scores = (ctypes.c_double * (b * n_best))()
        blob = "\x1f".join(self.vocab).encode("utf-8")
        rc = _lib().qasr_beam_search_batch(
            lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b, t, v, blob, self.beam_width, self.alpha, self.beta,
            self.cutoff_prob, self.cutoff_top_n,
            self._lm, n_best, max_text, texts, scores, self.num_cpus)
        if rc != 0:
            raise RuntimeError(f"beam search failed: rc={rc}")
        out: List[List[Tuple[float, str]]] = []
        for i in range(b):
            cand = []
            for j in range(n_best):
                s = scores[i * n_best + j]
                if s == -math.inf:
                    break
                raw = texts.raw[(i * n_best + j) * max_text:
                                (i * n_best + j + 1) * max_text]
                cand.append((float(s),
                             raw.split(b"\x00")[0].decode("utf-8",
                                                          errors="replace")))
            out.append(cand)
        return out

    def forward(self, log_probs, log_probs_length):  # reference method name
        return self(log_probs, log_probs_length)


class StreamingBeamDecoder:
    """Resumable CTC prefix beam search over log-prob chunks.

    The C++ beam map is the complete search state, so feeding chunks is
    *exactly* equivalent to offline decoding of the concatenated frames —
    combined with the bit-equal chunked encoder (decode/streaming.py), a
    live stream's final transcript matches the offline beam transcript.
    ``best()`` is non-destructive, giving a running partial hypothesis
    after every chunk.  The reference has no streaming decoder at all (its
    BeamSearchDecoderWithLM is offline-batch only,
    beam_search_decoder.py:60-104).
    """

    def __init__(self, vocab: Sequence[str], beam_width: int = 128,
                 alpha: float = 0.0, beta: float = 0.0,
                 lm: Optional["BeamSearchDecoderWithLM"] = None,
                 cutoff_prob: float = 1.0, cutoff_top_n: int = 40):
        self.vocab = list(vocab)
        self._v = len(self.vocab) + 1
        # keep the (optional) owning decoder alive: the LM handle must
        # outlive the stream
        self._lm_owner = lm
        lm_handle = lm._lm if lm is not None else None
        blob = "\x1f".join(self.vocab).encode("utf-8")
        self._h = _lib().qasr_beam_stream_create(
            self._v, blob, beam_width, alpha, beta, cutoff_prob,
            cutoff_top_n, lm_handle)
        if not self._h:
            raise ValueError("bad vocabulary for streaming beam decoder")
        self._frames = 0

    def feed(self, log_probs: np.ndarray) -> None:
        """Advance the search by a (T, V+1) float32 log-prob chunk."""
        lp = np.ascontiguousarray(np.asarray(log_probs, np.float32))
        assert lp.ndim == 2 and lp.shape[1] == self._v, lp.shape
        rc = _lib().qasr_beam_stream_feed(
            self._h, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lp.shape[0])
        if rc != 0:
            raise RuntimeError(f"beam stream feed failed: rc={rc}")
        self._frames += lp.shape[0]

    def best(self, n_best: int = 1) -> List[Tuple[float, str]]:
        """Current n-best [(score, text)] — the stream keeps going after."""
        max_text = self._frames * _max_symbol_bytes(self.vocab) + 2
        texts = ctypes.create_string_buffer(n_best * max_text)
        scores = (ctypes.c_double * n_best)()
        n = _lib().qasr_beam_stream_best(self._h, n_best, max_text, texts,
                                         scores)
        if n < 0:
            raise RuntimeError("beam stream best failed")
        out = []
        for i in range(min(n, n_best)):
            raw = texts.raw[i * max_text:(i + 1) * max_text]
            out.append((float(scores[i]),
                        raw.split(b"\x00")[0].decode("utf-8",
                                                     errors="replace")))
        return out

    def reset(self) -> None:
        _lib().qasr_beam_stream_reset(self._h)
        self._frames = 0

    def __del__(self):
        if getattr(self, "_h", None):
            try:
                _lib().qasr_beam_stream_free(self._h)
            except Exception:
                pass


class StreamingBeamBatch:
    """S concurrent streaming beam searches advanced by one device batch of
    log-prob chunks per tick — the serving shape: many live sessions, one
    (S, T_chunk, V+1) tensor out of the chip, one C++ call into a shared
    work-stealing thread pool (qasr_beam_stream_feed_batch).  Each session's
    search state is bit-identical to feeding its stream alone."""

    def __init__(self, n_streams: int, vocab: Sequence[str],
                 beam_width: int = 128, alpha: float = 0.0, beta: float = 0.0,
                 lm: Optional["BeamSearchDecoderWithLM"] = None,
                 cutoff_prob: float = 1.0, cutoff_top_n: int = 40,
                 num_threads: int = 4):
        self.streams = [
            StreamingBeamDecoder(vocab, beam_width, alpha, beta, lm,
                                 cutoff_prob, cutoff_top_n)
            for _ in range(n_streams)
        ]
        self.num_threads = num_threads
        self._v = len(vocab) + 1
        self._handles = (ctypes.c_void_p * n_streams)(
            *[s._h for s in self.streams])

    def __len__(self):
        return len(self.streams)

    def feed(self, log_probs: np.ndarray,
             lengths: Optional[np.ndarray] = None) -> None:
        """Advance every stream: log_probs (S, T, V+1) float32; lengths (S,)
        valid frames per stream (default: all T)."""
        lp = np.ascontiguousarray(np.asarray(log_probs, np.float32))
        s, t, v = lp.shape
        assert s == len(self.streams) and v == self._v, lp.shape
        if lengths is None:
            lengths = np.full((s,), t, np.int32)
        lens = np.ascontiguousarray(np.asarray(lengths, np.int32))
        if lens.size and int(lens.max()) > t:
            # C++ would clamp to t while _frames counted the full request,
            # silently diverging from the offline decode
            raise ValueError(f"lengths.max()={int(lens.max())} exceeds "
                             f"chunk frames T={t}")
        rc = _lib().qasr_beam_stream_feed_batch(
            self._handles, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            s, t, v, self.num_threads)
        if rc != 0:
            raise RuntimeError(f"batched beam stream feed failed: rc={rc}")
        for st, n in zip(self.streams, lens):
            st._frames += int(n)

    def best(self, n_best: int = 1) -> List[List[Tuple[float, str]]]:
        return [s.best(n_best) for s in self.streams]

    def reset(self) -> None:
        for s in self.streams:
            s.reset()


# ---------------------------------------------------------------------------
# Pure-Python reference implementation (cross-check / fallback)
# ---------------------------------------------------------------------------


def beam_search_python(log_probs: np.ndarray, vocab: Sequence[str],
                       beam_width: int = 16, n_best: int = 1,
                       cutoff_top_n: int = 0) -> List[Tuple[float, str]]:
    """Prefix beam search on one utterance (T, V+1), blank last, no LM."""
    t_len, v = log_probs.shape
    blank = v - 1
    NEG = -math.inf

    def lse(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + math.log1p(math.exp(-abs(a - b)))

    beams = {(): (0.0, NEG)}  # prefix(tuple of ids) -> (p_b, p_nb)
    for t in range(t_len):
        row = log_probs[t]
        order = np.argsort(row)[::-1]
        if cutoff_top_n > 0:
            order = order[:cutoff_top_n]
        nxt = defaultdict(lambda: (NEG, NEG))
        for ids, (p_b, p_nb) in beams.items():
            last = ids[-1] if ids else -1
            ptot = lse(p_b, p_nb)
            for s in order:
                p = float(row[s])
                if s == blank:
                    b_, nb_ = nxt[ids]
                    nxt[ids] = (lse(b_, ptot + p), nb_)
                    continue
                if s == last:
                    b_, nb_ = nxt[ids]
                    nxt[ids] = (b_, lse(nb_, p_nb + p))
                    base = p_b
                else:
                    base = ptot
                nids = ids + (int(s),)
                b_, nb_ = nxt[nids]
                nxt[nids] = (b_, lse(nb_, base + p))
        ranked = sorted(nxt.items(), key=lambda kv: -lse(*kv[1]))
        beams = dict(ranked[:beam_width])
    finals = sorted(((lse(pb, pnb), "".join(vocab[i] for i in ids))
                     for ids, (pb, pnb) in beams.items()), key=lambda x: -x[0])
    return finals[:n_best]
