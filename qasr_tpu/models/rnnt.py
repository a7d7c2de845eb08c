"""RNN-Transducer: prediction network, joint, loss, greedy/beam decoding.

Equivalent of the reference RNNT stack:
  - RNNTDecoder (prediction network: embedding + LSTM stack,
    modules/rnnt.py:50-300; forget_gate_bias init rnnt.py:126)
  - RNNTJoint (enc/pred projections -> add -> activation -> vocab logits,
    modules/rnnt.py:486-700)
  - RNNT loss (losses/rnnt.py:36-107 wraps the warprnnt CUDA extension) —
    here a pure-JAX log-space forward recursion, vectorized over (U) and
    scanned over T (TPU-friendly: static shapes, lax.scan, no host syncs)
  - greedy decoding (parts/rnnt_greedy_decoding.py) as a lax.while_loop-free
    batched host loop over device-stepped LSTM cells, and beam search
    (parts/rnnt_beam_decoding.py, 'default' algorithm) on host.

Layout: encoder outputs (B, T, D); labels (B, U).  Blank id = num_classes
(last), matching the CTC convention used across this framework.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
HI = jax.lax.Precision.HIGHEST
NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Prediction network (embedding + LSTM)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RNNTConfig:
    num_classes: int            # vocab size WITHOUT blank
    enc_hidden: int
    pred_hidden: int = 320
    pred_rnn_layers: int = 1
    joint_hidden: int = 320
    activation: str = "relu"
    forget_gate_bias: float = 1.0

    @property
    def blank_id(self) -> int:
        return self.num_classes


def init_rnnt_params(seed, cfg: RNNTConfig) -> Dict[str, Any]:
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)

    def uni(shape, fan_in):
        b = 1.0 / math.sqrt(fan_in)
        return rng.uniform(-b, b, shape).astype(np.float32)

    h = cfg.pred_hidden
    layers = []
    for i in range(cfg.pred_rnn_layers):
        din = h
        lp = {
            "wi": uni((din, 4 * h), h), "wh": uni((h, 4 * h), h),
            "b": np.zeros((4 * h,), np.float32),
        }
        # forget gate bias init (rnnt.py:126, gates ordered i,f,g,o)
        lp["b"][h: 2 * h] = cfg.forget_gate_bias
        layers.append(lp)
    return {
        # embedding with a dedicated blank row used as start-of-sequence
        "embed": rng.normal(0, 1.0, (cfg.num_classes + 1, h)).astype(np.float32),
        "lstm": layers,
        "joint": {
            "enc": {"w": uni((cfg.enc_hidden, cfg.joint_hidden), cfg.enc_hidden),
                    "b": np.zeros((cfg.joint_hidden,), np.float32)},
            "pred": {"w": uni((h, cfg.joint_hidden), h),
                     "b": np.zeros((cfg.joint_hidden,), np.float32)},
            "out": {"w": uni((cfg.joint_hidden, cfg.num_classes + 1), cfg.joint_hidden),
                    "b": np.zeros((cfg.num_classes + 1,), np.float32)},
        },
    }


class LSTMState(NamedTuple):
    h: Array  # (layers, B, H)
    c: Array


def lstm_init_state(cfg: RNNTConfig, batch: int) -> LSTMState:
    z = jnp.zeros((cfg.pred_rnn_layers, batch, cfg.pred_hidden), jnp.float32)
    return LSTMState(z, z)


def _lstm_cell(p, x, h, c):
    gates = jnp.matmul(x, p["wi"], precision=HI) + \
        jnp.matmul(h, p["wh"], precision=HI) + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


def pred_step(params, cfg: RNNTConfig, token: Array, state: LSTMState
              ) -> Tuple[Array, LSTMState]:
    """One prediction-network step: token ids (B,) -> (B, H), new state.
    Blank id embeds the start-of-sequence row (RNNTDecoder.predict
    semantics: SOS == blank, rnnt.py:153-230)."""
    x = jnp.take(jnp.asarray(params["embed"]), token, axis=0)
    hs, cs = [], []
    for li, lp in enumerate(params["lstm"]):
        h2, c2 = _lstm_cell(lp, x, state.h[li], state.c[li])
        hs.append(h2)
        cs.append(c2)
        x = h2
    return x, LSTMState(jnp.stack(hs), jnp.stack(cs))


def pred_network(params, cfg: RNNTConfig, targets: Array) -> Array:
    """Teacher-forced prediction net over (B, U) targets -> (B, U+1, H)
    with the SOS (blank) step first (RNNTDecoder.forward, rnnt.py:142-151)."""
    b, u = targets.shape
    sos = jnp.full((b, 1), cfg.blank_id, targets.dtype)
    tokens = jnp.concatenate([sos, targets], axis=1)  # (B, U+1)

    def step(state, tok):
        out, state2 = pred_step(params, cfg, tok, state)
        return state2, out

    _, outs = jax.lax.scan(step, lstm_init_state(cfg, b), tokens.T)
    return outs.transpose(1, 0, 2)  # (B, U+1, H)


def joint(params, cfg: RNNTConfig, enc: Array, pred: Array) -> Array:
    """(B,T,De) x (B,U+1,Dp) -> (B,T,U+1,V+1) logits (RNNTJoint.forward,
    rnnt.py:640-700: project both, add, activation, project to vocab)."""
    jp = params["joint"]
    f = jnp.matmul(enc, jp["enc"]["w"], precision=HI) + jp["enc"]["b"]
    g = jnp.matmul(pred, jp["pred"]["w"], precision=HI) + jp["pred"]["b"]
    x = f[:, :, None, :] + g[:, None, :, :]
    if cfg.activation == "relu":
        x = jax.nn.relu(x)
    elif cfg.activation == "tanh":
        x = jnp.tanh(x)
    elif cfg.activation == "sigmoid":
        x = jax.nn.sigmoid(x)
    return jnp.matmul(x, jp["out"]["w"], precision=HI) + jp["out"]["b"]


# ---------------------------------------------------------------------------
# RNNT loss (log-space forward algorithm)
# ---------------------------------------------------------------------------


def rnnt_loss_wavefront(log_probs: Array, targets: Array, input_lengths: Array,
                        target_lengths: Array, blank_id: int,
                        reduction: str = "mean_batch") -> Array:
    """Anti-diagonal (wavefront) RNNT forward: T+U sequential steps, each
    vectorized over the whole diagonal — the TPU-friendly formulation
    (the row-scan variant below runs T*U sequential cell updates).

    alpha[t, u] for t+u = d depends only on diagonal d-1:
        horiz: alpha[t-1, u] + blank[t-1, u]
        vert:  alpha[t, u-1] + emit[t, u-1]
    """
    b, t_max, u1, _ = log_probs.shape
    u_max = u1 - 1
    blank_lp = log_probs[:, :, :, blank_id]
    emit_lp = jnp.take_along_axis(
        log_probs[:, :, :u_max, :],
        targets[:, None, :, None].astype(jnp.int32), axis=-1)[..., 0]

    u_range = jnp.arange(u1)
    u_valid = u_range[None, :] <= target_lengths[:, None]

    def diag_step(prev, d):
        t_h = jnp.clip(d - 1 - u_range, 0, t_max - 1)       # (U+1,)
        t_v = jnp.clip(d - u_range, 0, t_max - 1)
        horiz = prev + blank_lp[:, t_h, u_range]            # (B, U+1)
        prev_shift = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), prev[:, :-1]], axis=1)
        emit_u = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF),
             emit_lp[:, t_v[1:], u_range[:-1]]], axis=1)
        vert = prev_shift + emit_u
        ok_h = (d - 1 - u_range >= 0) & (d - u_range <= t_max - 1) \
            & (d - u_range >= 0)
        ok_v = (u_range >= 1) & (d - u_range >= 0) & (d - u_range <= t_max - 1)
        val = jnp.logaddexp(jnp.where(ok_h[None], horiz, NEG_INF),
                            jnp.where(ok_v[None], vert, NEG_INF))
        val = jnp.where(u_valid, val, NEG_INF)
        return val, val

    alpha0 = jnp.where(u_range[None, :] == 0, 0.0, NEG_INF) \
        + jnp.zeros((b, u1))
    alpha0 = jnp.where(u_valid, alpha0, NEG_INF)
    _, diags = jax.lax.scan(diag_step, alpha0,
                            jnp.arange(1, t_max + u_max + 1))
    diags = jnp.concatenate([alpha0[None], diags], axis=0)  # (T+U+1, B, U+1)

    t_idx = (input_lengths - 1).astype(jnp.int32)
    u_idx = target_lengths.astype(jnp.int32)
    batch_idx = jnp.arange(b)
    final_alpha = diags[t_idx + u_idx, batch_idx, u_idx]
    final_blank = blank_lp[batch_idx, t_idx, u_idx]
    nll = -(final_alpha + final_blank)
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "none":
        return nll
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(target_lengths, 1))
    raise ValueError(reduction)


def rnnt_loss(log_probs: Array, targets: Array, input_lengths: Array,
              target_lengths: Array, blank_id: int,
              reduction: str = "mean_batch", impl: str = "wavefront") -> Array:
    if impl == "wavefront":
        return rnnt_loss_wavefront(log_probs, targets, input_lengths,
                                   target_lengths, blank_id, reduction)
    return _rnnt_loss_rowscan(log_probs, targets, input_lengths,
                              target_lengths, blank_id, reduction)


def _rnnt_loss_rowscan(log_probs: Array, targets: Array, input_lengths: Array,
                       target_lengths: Array, blank_id: int,
                       reduction: str = "mean_batch") -> Array:
    """Negative log-likelihood of the RNNT lattice.

    log_probs: (B, T, U+1, V+1) log-softmaxed joint outputs.
    Replaces warprnnt_pytorch (losses/rnnt.py:36-107) with a lax.scan over
    time of a vectorized in-row recursion:
        alpha[t, u] = lse(alpha[t-1, u] + blank[t-1, u],
                          alpha[t, u-1] + emit[t, u-1])
    The in-row (u) recursion is a cumulative carry computed with an inner
    scan over U (U ~ tens to low hundreds; fine under jit).
    """
    b, t_max, u1, _ = log_probs.shape
    u_max = u1 - 1
    blank_lp = log_probs[:, :, :, blank_id]  # (B, T, U+1)
    emit_lp = jnp.take_along_axis(
        log_probs[:, :, :u_max, :],
        targets[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]  # (B, T, U): log p(y_u | t, u)

    u_range = jnp.arange(u1)
    u_valid = u_range[None, :] <= target_lengths[:, None]  # (B, U+1)

    def row_update(alpha_prev_t, t):
        # horizontal move: from alpha[t-1, u] emitting blank at (t-1, u)
        horiz = alpha_prev_t + blank_lp[:, t - 1, :]
        # then vertical (emit) moves within row t via cumulative carry
        # emission moves within time step t: alpha[t,u] <- alpha[t,u-1]
        # consuming label u-1; horiz already holds the blank-transition mass
        def ustep(carry, u):
            val = jnp.where(u == 0, horiz[:, 0],
                            jnp.logaddexp(horiz[:, u],
                                          carry + emit_lp[:, t, u - 1]))
            return val, val
        _, rows = jax.lax.scan(ustep, jnp.full((b,), NEG_INF), u_range)
        alpha_t = rows.T  # (B, U+1)
        return jnp.where(u_valid, alpha_t, NEG_INF)

    # t = 0 row: only emission moves from alpha[0,0] = 0
    def u0step(carry, u):
        val = jnp.where(u == 0, jnp.zeros((b,)),
                        carry + emit_lp[:, 0, u - 1])
        return val, val
    _, rows0 = jax.lax.scan(u0step, jnp.full((b,), NEG_INF), u_range)
    alpha0 = jnp.where(u_valid, rows0.T, NEG_INF)

    def scan_t(alpha, t):
        alpha_t = row_update(alpha, t)
        return alpha_t, alpha_t

    _, alphas = jax.lax.scan(scan_t, alpha0, jnp.arange(1, t_max))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # (T, B, U+1)

    # ll = alpha[T_b - 1, U_b] + blank(T_b - 1, U_b)
    t_idx = (input_lengths - 1).astype(jnp.int32)
    u_idx = target_lengths.astype(jnp.int32)
    batch_idx = jnp.arange(b)
    final_alpha = alphas[t_idx, batch_idx, u_idx]
    final_blank = blank_lp[batch_idx, t_idx, u_idx]
    nll = -(final_alpha + final_blank)
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "none":
        return nll
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(target_lengths, 1))
    raise ValueError(reduction)


# ---------------------------------------------------------------------------
# Greedy decoding (GreedyRNNTInfer, parts/rnnt_greedy_decoding.py)
# ---------------------------------------------------------------------------


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("cfg",))
def _pred_step_jit(params, cfg, tok, state):
    return pred_step(params, cfg, tok, state)


@_functools.partial(jax.jit, static_argnames=("cfg",))
def _joint_logprobs_jit(params, cfg, e, g):
    return jax.nn.log_softmax(
        joint(params, cfg, e[:, None, :], g[:, None, :])[:, 0, 0], axis=-1)


def greedy_init(params, cfg: RNNTConfig, batch: int):
    """Initial greedy-decode carry: SOS-primed pred-net output + state +
    empty hypotheses.  Thread the returned carry through
    `greedy_decode_frames` calls (offline: once; streaming: per chunk)."""
    state = lstm_init_state(cfg, batch)
    g, state = _pred_step_jit(params, cfg,
                              jnp.full((batch,), cfg.blank_id, jnp.int32),
                              state)
    hyps: List[List[int]] = [[] for _ in range(batch)]
    return g, state, hyps


def greedy_decode_frames(params, cfg: RNNTConfig, enc, enc_lens, carry,
                         max_symbols_per_step: int = 10):
    """Run the greedy emit loop over one span of encoder frames, mutating
    and returning the carry — the incremental core shared by offline
    decoding and chunked streaming (the carry IS the decoder state, so
    feeding frames in chunks is exactly the offline computation)."""
    g, state, hyps = carry
    enc = np.asarray(enc)
    enc_lens = np.asarray(enc_lens)
    step_jit = lambda tok, st: _pred_step_jit(params, cfg, tok, st)
    joint_jit = lambda e, g: _joint_logprobs_jit(params, cfg, e, g)
    for t in range(enc.shape[1]):
        active = enc_lens > t
        if not active.any():
            break
        e_t = jnp.asarray(enc[:, t])
        for _ in range(max_symbols_per_step):
            lp = np.asarray(joint_jit(e_t, g))
            sym = lp.argmax(-1)
            emit = (sym != cfg.blank_id) & active
            if not emit.any():
                break
            tok = np.where(emit, sym, cfg.blank_id).astype(np.int32)
            g2, state2 = step_jit(jnp.asarray(tok), state)
            # only advance pred-net state where a symbol was emitted
            keep = jnp.asarray(emit)[:, None]
            g = jnp.where(keep, g2, g)
            state = LSTMState(
                jnp.where(keep[None], state2.h, state.h),
                jnp.where(keep[None], state2.c, state.c))
            for i in np.nonzero(emit)[0]:
                hyps[int(i)].append(int(sym[i]))
    return g, state, hyps


def greedy_decode(params, cfg: RNNTConfig, enc: Array, enc_lens: Array,
                  max_symbols_per_step: int = 10) -> List[List[int]]:
    """Batched greedy RNNT decoding.  Per frame: emit symbols until blank
    (capped at max_symbols_per_step), advancing the prediction net only on
    non-blank — the standard transducer greedy algorithm."""
    b = np.asarray(enc).shape[0]
    carry = greedy_init(params, cfg, b)
    _, _, hyps = greedy_decode_frames(params, cfg, enc, enc_lens, carry,
                                      max_symbols_per_step)
    return hyps


# ---------------------------------------------------------------------------
# Beam decoding — faithful ports of the reference BeamRNNTInfer's three
# search algorithms (parts/rnnt_beam_decoding.py:89-104):
#   'beam' - default_beam_search (:320-413), the ESPnet one-best expansion;
#   'tsd'  - time_sync_decoding (:415-497), bounded symmetric expansions
#            per frame with blank-path logaddexp merging;
#   'alsd' - align_length_sync_decoding (:499-657), T+U_max joint steps.
# The host drives the search; pred-net/joint evaluations are jitted and
# cached per label sequence (the reference's `cache` dict, batched scoring
# being a pure perf transform of the same per-hypothesis math).
# ---------------------------------------------------------------------------


@dataclass(eq=False)  # identity comparison: states are arrays (list.remove)
class Hypothesis:
    score: float
    y_sequence: List[int]   # leading blank = SOS, like the reference's
    dec_state: Any          # LSTMState after consuming y_sequence[:-1]
    #                         (the state y_sequence[-1] is fed FROM;
    #                         _HypScorer.g_state steps it by y_sequence[-1])
    g: Any                  # (1, H) pred-net output for y_sequence[-1]


@_functools.partial(jax.jit, static_argnames=("cfg",))
def _joint_logprobs_single_jit(params, cfg, e, g):
    return jax.nn.log_softmax(
        joint(params, cfg, e[None, None, :], g[:, None, :])[:, 0, 0], axis=-1)


class _HypScorer:
    """score_hypothesis with the reference's sequence-keyed cache
    (modules/rnnt.py:309-360): evaluate the pred net on the hypothesis'
    last token from its parent state; the initial [blank] hypothesis runs
    the blank/SOS embedding from the zero state (blank_as_pad: predict(None)
    == the zero embedding row, rnnt.py:333-336)."""

    def __init__(self, params, cfg: RNNTConfig):
        self.params, self.cfg = params, cfg
        self.cache: Dict[tuple, Any] = {}

    def g_state(self, hyp: "Hypothesis"):
        seq = tuple(hyp.y_sequence)
        hit = self.cache.get(seq)
        if hit is None:
            if hyp.y_sequence[-1] == self.cfg.blank_id:
                g, st = _pred_step_jit(
                    self.params, self.cfg,
                    jnp.full((1,), self.cfg.blank_id, jnp.int32),
                    lstm_init_state(self.cfg, 1))
            else:
                g, st = _pred_step_jit(
                    self.params, self.cfg,
                    jnp.full((1,), hyp.y_sequence[-1], jnp.int32),
                    hyp.dec_state)
            hit = self.cache[seq] = (g, st)
        return hit

    def logp(self, e, hyp: "Hypothesis"):
        """(V+1,) log-probs for encoder frame e under hyp; returns
        (logp, post-step state)."""
        g, st = self.g_state(hyp)
        lp = np.asarray(_joint_logprobs_single_jit(self.params, self.cfg,
                                                   e, g))[0]
        return lp, st, g


def _sort_nbest(hyps: List[Hypothesis], score_norm: bool) -> List[Hypothesis]:
    if score_norm:  # rnnt_beam_decoding.py:255-258
        return sorted(hyps, key=lambda x: x.score / len(x.y_sequence),
                      reverse=True)
    return sorted(hyps, key=lambda x: x.score, reverse=True)


def _default_beam_search(params, cfg: RNNTConfig, enc_t, beam_size: int,
                         score_norm: bool) -> List[Hypothesis]:
    """rnnt_beam_decoding.py:320-413."""
    v = cfg.num_classes
    beam = min(beam_size, v)
    beam_k = min(beam, v - 1)
    sc = _HypScorer(params, cfg)
    kept_hyps = [Hypothesis(0.0, [cfg.blank_id], lstm_init_state(cfg, 1),
                            None)]
    for t in range(enc_t.shape[0]):
        e = jnp.asarray(enc_t[t])
        hyps = kept_hyps
        kept_hyps = []
        while True:
            max_hyp = max(hyps, key=lambda x: x.score)
            hyps.remove(max_hyp)
            lp, state, _ = sc.logp(e, max_hyp)
            # non-blank top-k (blank is last in our vocab layout, so the
            # reference's index_incr is 0)
            top_k = np.argsort(-lp[:v], kind="stable")[:beam_k]
            steps = [(float(lp[k]), int(k)) for k in top_k]
            steps.append((float(lp[cfg.blank_id]), cfg.blank_id))
            for logp_k, k in steps:
                new_hyp = Hypothesis(max_hyp.score + logp_k,
                                     max_hyp.y_sequence[:],
                                     max_hyp.dec_state, None)
                if k == cfg.blank_id:
                    kept_hyps.append(new_hyp)
                else:
                    new_hyp.dec_state = state
                    new_hyp.y_sequence.append(k)
                    hyps.append(new_hyp)
            hyps_max = float(max(hyps, key=lambda x: x.score).score)
            kept_most_prob = sorted(
                [h for h in kept_hyps if h.score > hyps_max],
                key=lambda x: x.score)
            if len(kept_most_prob) >= beam:
                kept_hyps = kept_most_prob
                break
    return _sort_nbest(kept_hyps, score_norm)


def _time_sync_decoding(params, cfg: RNNTConfig, enc_t, beam_size: int,
                        score_norm: bool, max_sym_exp: int
                        ) -> List[Hypothesis]:
    """rnnt_beam_decoding.py:415-497."""
    v = cfg.num_classes
    beam = min(beam_size, v)
    sc = _HypScorer(params, cfg)
    B = [Hypothesis(0.0, [cfg.blank_id], lstm_init_state(cfg, 1), None)]
    for t in range(enc_t.shape[0]):
        e = jnp.asarray(enc_t[t])
        A: List[Hypothesis] = []
        C = B
        for _ in range(max_sym_exp):
            D: List[Hypothesis] = []
            scored = [sc.logp(e, hyp) for hyp in C]
            seq_A = [h.y_sequence for h in A]
            for j, hyp in enumerate(C):
                lp = scored[j][0]
                if hyp.y_sequence not in seq_A:
                    A.append(Hypothesis(
                        hyp.score + float(lp[cfg.blank_id]),
                        hyp.y_sequence[:], hyp.dec_state, None))
                else:
                    # merge the blank path into the existing hypothesis
                    pos = seq_A.index(hyp.y_sequence)
                    A[pos].score = float(np.logaddexp(
                        A[pos].score, hyp.score + float(lp[cfg.blank_id])))
            for j, hyp in enumerate(C):
                lp, state, _ = scored[j]
                top_k = np.argsort(-lp[:v], kind="stable")[:beam]
                for k in top_k:
                    D.append(Hypothesis(hyp.score + float(lp[k]),
                                        hyp.y_sequence + [int(k)],
                                        state, None))
            C = sorted(D, key=lambda x: x.score, reverse=True)[:beam]
        B = sorted(A, key=lambda x: x.score, reverse=True)[:beam]
    return _sort_nbest(B, score_norm)


def _recombine_hypotheses(hypotheses: List[Hypothesis]) -> List[Hypothesis]:
    """rnnt_beam_decoding.py:659-680 — matches the reference exactly,
    including returning the *input* list (duplicates retained; the first
    occurrence of each sequence absorbs the duplicate scores)."""
    final: List[Hypothesis] = []
    for hyp in hypotheses:
        seq_final = [f.y_sequence for f in final if f.y_sequence]
        if hyp.y_sequence in seq_final:
            pos = seq_final.index(hyp.y_sequence)
            final[pos].score = float(np.logaddexp(final[pos].score, hyp.score))
        else:
            final.append(hyp)
    return hypotheses


def _align_length_sync_decoding(params, cfg: RNNTConfig, enc_t, beam_size: int,
                                score_norm: bool, max_target_len
                                ) -> List[Hypothesis]:
    """rnnt_beam_decoding.py:499-657."""
    v = cfg.num_classes
    beam = min(beam_size, v)
    h_length = enc_t.shape[0]
    u_max = (int(max_target_len * h_length) if isinstance(max_target_len, float)
             else int(max_target_len))
    sc = _HypScorer(params, cfg)
    B = [Hypothesis(0.0, [cfg.blank_id], lstm_init_state(cfg, 1), None)]
    final: List[Hypothesis] = []
    for i in range(h_length + u_max):
        A: List[Hypothesis] = []
        B_: List[Hypothesis] = []
        h_states: List[tuple] = []
        for hyp in B:
            u = len(hyp.y_sequence) - 1
            t = i - u + 1
            if t > h_length - 1:
                continue
            B_.append(hyp)
            h_states.append((t, enc_t[t]))
        if B_:
            scored = [sc.logp(jnp.asarray(h_states[j][1]), hyp)
                      for j, hyp in enumerate(B_)]
            for j, hyp in enumerate(B_):
                lp, state, _ = scored[j]
                new_hyp = Hypothesis(hyp.score + float(lp[cfg.blank_id]),
                                     hyp.y_sequence[:], hyp.dec_state, None)
                A.append(new_hyp)
                if h_states[j][0] == h_length - 1:
                    final.append(new_hyp)
                top_k = np.argsort(-lp[:v], kind="stable")[:beam]
                for k in top_k:
                    A.append(Hypothesis(hyp.score + float(lp[k]),
                                        hyp.y_sequence + [int(k)],
                                        state, None))
            B = sorted(A, key=lambda x: x.score, reverse=True)[:beam]
            B = _recombine_hypotheses(B)
        else:
            # every hypothesis ran past the frame axis (reference :651-652)
            break
    if final:
        return _sort_nbest(final, score_norm)
    return B


def beam_search(params, cfg: RNNTConfig, enc_t: np.ndarray,
                beam_size: int = 4, search_type: str = "beam",
                score_norm: bool = True, tsd_max_sym_exp: int = 50,
                alsd_max_target_len=1.0) -> List[Hypothesis]:
    """N-best transducer beam search over one utterance's encoder frames
    (T, D).  search_type in {'beam', 'tsd', 'alsd'}
    (BeamRNNTInfer, rnnt_beam_decoding.py:89-104)."""
    enc_t = np.asarray(enc_t)
    if search_type in ("beam", "default"):
        return _default_beam_search(params, cfg, enc_t, beam_size, score_norm)
    if search_type == "tsd":
        return _time_sync_decoding(params, cfg, enc_t, beam_size, score_norm,
                                   tsd_max_sym_exp)
    if search_type == "alsd":
        return _align_length_sync_decoding(params, cfg, enc_t, beam_size,
                                           score_norm, alsd_max_target_len)
    raise NotImplementedError(
        f"The search type ({search_type}) supplied is not supported!\n"
        f"Please use one of : (default, tsd, alsd)")


def beam_decode_one(params, cfg: RNNTConfig, enc_t: np.ndarray,
                    beam_size: int = 4, search_type: str = "beam",
                    **kwargs) -> List[int]:
    """Best label sequence (no SOS blank) for one utterance (T, D)."""
    hyps = beam_search(params, cfg, enc_t, beam_size=beam_size,
                       search_type=search_type, **kwargs)
    best = hyps[0].y_sequence
    return [t for t in best if t != cfg.blank_id]
