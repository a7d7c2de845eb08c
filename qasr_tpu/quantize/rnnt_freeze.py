"""Frozen integer transducer DECODER: int8 pred-net (integer LSTM) + joint.

Completes integer-only serving for the transducer family: with a frozen
integer Conformer encoder (quantize/conformer_freeze.py) and these tables,
everything from features to the argmax'd joint logits is integer
arithmetic except the two declared float->int boundaries (the encoder's
subsampler entry and the encoder-output quantize here).  The reference
never quantizes its RNNT stack at all (modules/rnnt.py is float; Q-ASR's
quantization is CTC-only) — this extends the Q-ASR scheme to the decoder.

Integer LSTM cell (per layer, gates ordered i,f,g,o like models/rnnt.py):
  * the two GEMMs run int8 x int8 -> int32; each accumulator requants onto
    the FIXED i-sigmoid input grid (S_IN = 20/16383, ops/integer_sigmoid)
    with exact per-gate-column dyadic multipliers, then adds — gate
    pre-activations need NO calibration because the grid is static and
    the |x| <= 20 clip is output-exact (sigmoid saturates below int8
    resolution there);
  * sigmoid/tanh are the in-tree integer kernels (i_sigmoid_grid;
    tanh(x) = 2*sigmoid(2x) - 1 rides a doubled-ratio requant of the same
    accumulator);
  * the cell state c is fixed-point int32 with scale 2^-K_C (K_C = 14 =
    2*K_SIG, so the i*tanh(g) fraction product lands on c's scale
    EXACTLY); h = o * tanh(c) is bounded by 1, so its int8 scale is the
    static 1/127 — the whole recurrence is calibration-free.

Joint: enc8 @ W -> requant to the calibrated joint grid, h8 @ W likewise,
integer add + bias + relu, int8 -> out GEMM, per-column dyadic requant to
ONE common logits scale so the greedy argmax compares raw int32.

Only two ranges need data: the encoder output (S_enc) and the pre-relu
joint hidden (S_j) — captured from a float greedy pass over calibration
audio (RNNTModel.freeze_decoder).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qasr_tpu.ops.integer_sigmoid import K_SIG, i_sigmoid_grid
from qasr_tpu.ops.integer_softmax import N_IN, S_IN
from qasr_tpu.ops.quant_prims import (
    dyadic_from_scale_host_static_e, dyadic_requant_static,
)

Array = jax.Array
K_C = 2 * K_SIG          # cell-state fractional bits: i*tanh(g) lands exactly
_C_CLIP = 1 << 23        # |c| <= 512.0 real — keeps f_fp * c_q inside int32
_H_SCALE = 1.0 / 127.0   # |h| = |sigmoid*tanh| <= 1: static int8 scale


def _w_quant(w: np.ndarray, wbit: int, axes: Tuple[int, ...]):
    n = 2 ** (wbit - 1) - 1
    w = np.asarray(w, np.float64)
    sat = np.maximum(np.abs(w.min(axis=axes)), np.abs(w.max(axis=axes)))
    scale = np.clip(sat, 1e-8, None) / n
    w_int = np.clip(np.round(w / scale), -n, n - 1).astype(np.int8)
    return w_int, scale


def _rq(scale_in, scale_out) -> Tuple[np.ndarray, int]:
    m, e = dyadic_from_scale_host_static_e(
        np.asarray(scale_in, np.float64) / float(scale_out))
    return np.asarray(m, np.int32), int(e)


def _rshift_round(v: Array, k: int) -> Array:
    return (v + (1 << (k - 1))) >> k


def _i_tanh_grid(q2: Array) -> Array:
    """tanh from values on the S_IN grid REPRESENTING 2x: 2*sigmoid(2x)-1.
    int32 in [-2^K_SIG, 2^K_SIG] with implied scale 2^-K_SIG."""
    return 2 * i_sigmoid_grid(q2) - (1 << K_SIG)


# ---------------------------------------------------------------------------
# freeze


def freeze_rnnt_decoder(params, cfg, *, enc_range: float, joint_range: float,
                        weight_bit: int = 8) -> Dict[str, Any]:
    """Build the integer decoder tables.  enc_range/joint_range are the
    calibrated |max| of the encoder output and the pre-relu joint hidden
    (RNNTModel.freeze_decoder captures them from a float greedy pass)."""
    wb = weight_bit
    n8 = 2 ** (wb - 1) - 1
    emb_int, emb_sc = _w_quant(np.asarray(params["embed"]), wb, (0, 1))
    s_h = _H_SCALE
    layers: List[Dict[str, Any]] = []
    s_x = float(emb_sc)
    for lp in params["lstm"]:
        wi_int, wi_sc = _w_quant(lp["wi"], wb, (0,))   # (4H,) per column
        wh_int, wh_sc = _w_quant(lp["wh"], wb, (0,))
        b = np.asarray(lp["b"], np.float64)
        # accumulators -> the sigmoid grid (x-scale) and the doubled grid
        # (the tanh-of-g trick needs 2x on the grid)
        mi, ei = _rq(s_x * wi_sc, S_IN)
        mh, eh = _rq(s_h * wh_sc, S_IN)
        mi2, ei2 = _rq(2.0 * s_x * wi_sc, S_IN)
        mh2, eh2 = _rq(2.0 * s_h * wh_sc, S_IN)
        layers.append({
            "wi": wi_int, "wh": wh_int,
            "mi": mi, "ei": ei, "mh": mh, "eh": eh,
            "mi2": mi2, "ei2": ei2, "mh2": mh2, "eh2": eh2,
            "b_grid": np.round(b / S_IN).astype(np.int32),
            "b2_grid": np.round(2.0 * b / S_IN).astype(np.int32),
        })
        s_x = s_h  # upper layers consume h8
    # c (2^-K_C) -> the grid as 2c for tanh(c)
    m_c2, e_c2 = _rq(2.0 / (1 << K_C), S_IN)
    # h_fp (2^-2K_SIG) -> int8 at 1/127
    m_h, e_h = _rq(1.0 / (1 << (2 * K_SIG)), s_h)

    jp = params["joint"]
    s_enc = max(float(enc_range), 1e-8) / n8
    s_j = max(float(joint_range), 1e-8) / n8
    wenc_int, wenc_sc = _w_quant(jp["enc"]["w"], wb, (0,))
    wpred_int, wpred_sc = _w_quant(jp["pred"]["w"], wb, (0,))
    wout_int, wout_sc = _w_quant(jp["out"]["w"], wb, (0,))
    m_f, e_f = _rq(s_enc * wenc_sc, s_j)
    m_g, e_g = _rq(s_h * wpred_sc, s_j)
    b_j = (np.asarray(jp["enc"]["b"], np.float64)
           + np.asarray(jp["pred"]["b"], np.float64))
    # common logits scale: the coarsest column (max product scale)
    s_logit = float(np.max(s_j * wout_sc))
    m_o, e_o = _rq(s_j * wout_sc, s_logit)
    return {
        "act_bit": wb,
        "embed": emb_int, "layers": layers,
        "m_c2": m_c2, "e_c2": e_c2, "m_h": m_h, "e_h": e_h,
        "joint": {
            "wenc": wenc_int, "wpred": wpred_int, "wout": wout_int,
            "m_f": m_f, "e_f": e_f, "m_g": m_g, "e_g": e_g,
            "b_j": np.round(b_j / s_j).astype(np.int32),
            "m_o": m_o, "e_o": e_o,
            "b_out_logit": np.round(np.asarray(jp["out"]["b"], np.float64)
                                    / s_logit).astype(np.int32),
            "S_enc": s_enc,
        },
        "activation": cfg.activation,
    }


# ---------------------------------------------------------------------------
# integer execution


def _dot8(x8: Array, w_int8) -> Array:
    return jax.lax.dot_general(
        x8, jnp.asarray(w_int8), (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def pred_step_frozen(tables, token: Array, h8: Array, c_q: Array
                     ) -> Tuple[Array, Array, Array]:
    """One integer pred-net step.
    token (B,) int32; h8 (L, B, H) int8 (scale 1/127); c_q (L, B, H) int32
    (scale 2^-K_C).  Returns (top-layer h8, new h8 stack, new c_q stack)."""
    x8 = jnp.take(jnp.asarray(tables["embed"]), token, axis=0)
    hs, cs = [], []
    n_grid = N_IN
    for li, t in enumerate(tables["layers"]):
        acc_i = _dot8(x8, t["wi"])
        acc_h = _dot8(h8[li], t["wh"])
        g1 = dyadic_requant_static(acc_i, jnp.asarray(t["mi"]), t["ei"]) \
            + dyadic_requant_static(acc_h, jnp.asarray(t["mh"]), t["eh"]) \
            + jnp.asarray(t["b_grid"])
        g2 = dyadic_requant_static(acc_i, jnp.asarray(t["mi2"]), t["ei2"]) \
            + dyadic_requant_static(acc_h, jnp.asarray(t["mh2"]), t["eh2"]) \
            + jnp.asarray(t["b2_grid"])
        g1 = jnp.clip(g1, -n_grid, n_grid)
        g2 = jnp.clip(g2, -n_grid, n_grid)
        gi, gf, _, go = jnp.split(g1, 4, axis=-1)
        g2g = jnp.split(g2, 4, axis=-1)[2]
        i_fp = i_sigmoid_grid(gi)
        f_fp = i_sigmoid_grid(gf)
        o_fp = i_sigmoid_grid(go)
        tg_fp = _i_tanh_grid(g2g)
        c_prev = c_q[li]
        c2 = _rshift_round(f_fp * c_prev, K_SIG) + i_fp * tg_fp
        c2 = jnp.clip(c2, -_C_CLIP, _C_CLIP)
        q2c = jnp.clip(dyadic_requant_static(c2, jnp.asarray(tables["m_c2"]),
                                             tables["e_c2"]),
                       -n_grid, n_grid)
        h_fp = o_fp * _i_tanh_grid(q2c)          # scale 2^-2K_SIG, |.|<=2^14
        h_new = jnp.clip(dyadic_requant_static(h_fp,
                                               jnp.asarray(tables["m_h"]),
                                               tables["e_h"]),
                         -127, 127).astype(jnp.int8)
        hs.append(h_new)
        cs.append(c2)
        x8 = h_new
    return x8, jnp.stack(hs), jnp.stack(cs)


def joint_logits_frozen(tables, enc_f: Array, h8: Array) -> Array:
    """(B, De) float encoder frame x (B, H) int8 pred -> (B, V+1) int32
    logits on ONE common scale (argmax-comparable).  The single float op is
    the declared boundary quantize of the encoder frame."""
    jt = tables["joint"]
    n8 = 2 ** (tables["act_bit"] - 1) - 1
    enc8 = jnp.clip(jnp.round(enc_f / jt["S_enc"]), -n8, n8).astype(jnp.int8)
    f_j = dyadic_requant_static(_dot8(enc8, jt["wenc"]),
                                jnp.asarray(jt["m_f"]), jt["e_f"])
    g_j = dyadic_requant_static(_dot8(h8, jt["wpred"]),
                                jnp.asarray(jt["m_g"]), jt["e_g"])
    x = f_j + g_j + jnp.asarray(jt["b_j"])
    if tables["activation"] != "relu":
        raise NotImplementedError("frozen joint supports relu "
                                  "(models/rnnt.py joint default)")
    x8 = jnp.clip(x, 0, n8).astype(jnp.int8)
    out = dyadic_requant_static(_dot8(x8, jt["wout"]),
                                jnp.asarray(jt["m_o"]), jt["e_o"])
    return out + jnp.asarray(jt["b_out_logit"])


def _jits(tables):
    """Per-table jitted step/joint closures (the static dyadic exponents
    are python ints and must stay compile-time constants, so the tables
    are closed over, not passed as jit arguments)."""
    fns = tables.get("_jit")
    if fns is None:
        @jax.jit
        def step(token, h8, c_q):
            return pred_step_frozen(tables, token, h8, c_q)

        @jax.jit
        def jnt(enc_f, g8):
            return joint_logits_frozen(tables, enc_f, g8)

        fns = tables["_jit"] = (step, jnt)
    return fns


def frozen_decoder_init(tables, cfg, batch: int):
    """Initial integer carry (SOS-primed, like models/rnnt.py greedy_init)."""
    step, _ = _jits(tables)
    n_l = len(tables["layers"])
    h_dim = tables["layers"][0]["wh"].shape[0]
    h8 = jnp.zeros((n_l, batch, h_dim), jnp.int8)
    c_q = jnp.zeros((n_l, batch, h_dim), jnp.int32)
    tok = jnp.full((batch,), cfg.blank_id, jnp.int32)
    g8, h8, c_q = step(tok, h8, c_q)
    hyps: List[List[int]] = [[] for _ in range(batch)]
    return g8, (h8, c_q), hyps


def greedy_decode_frames_frozen(tables, cfg, enc, enc_lens, carry,
                                max_symbols_per_step: int = 10):
    """Integer-decoder counterpart of models/rnnt.py::greedy_decode_frames
    (same emit loop; the carry is integer state)."""
    g8, (h8, c_q), hyps = carry
    step, jnt = _jits(tables)
    enc = np.asarray(enc)
    enc_lens = np.asarray(enc_lens)
    for t in range(enc.shape[1]):
        active = enc_lens > t
        if not active.any():
            break
        e_t = jnp.asarray(enc[:, t])
        for _ in range(max_symbols_per_step):
            logits = np.asarray(jnt(e_t, g8))
            sym = logits.argmax(-1)
            emit = (sym != cfg.blank_id) & active
            if not emit.any():
                break
            tok = np.where(emit, sym, cfg.blank_id).astype(np.int32)
            g2, h2, c2 = step(jnp.asarray(tok), h8, c_q)
            keep = jnp.asarray(emit)[:, None]
            g8 = jnp.where(keep, g2, g8)
            h8 = jnp.where(keep[None], h2, h8)
            c_q = jnp.where(keep[None], c2, c_q)
            for i in np.nonzero(emit)[0]:
                hyps[int(i)].append(int(sym[i]))
    return g8, (h8, c_q), hyps


def greedy_decode_frozen(tables, cfg, enc, enc_lens,
                         max_symbols_per_step: int = 10) -> List[List[int]]:
    carry = frozen_decoder_init(tables, cfg, np.asarray(enc).shape[0])
    _, _, hyps = greedy_decode_frames_frozen(tables, cfg, enc, enc_lens,
                                             carry, max_symbols_per_step)
    return hyps


# ---------------------------------------------------------------------------
# calibration (the two data-dependent ranges)


def calibrate_decoder_ranges(model, calib_batches,
                             max_symbols_per_step: int = 10
                             ) -> Tuple[float, float]:
    """Float greedy pass over calibration audio capturing |max| of the
    encoder output and the pre-relu joint hidden."""
    from qasr_tpu.models.rnnt import LSTMState, greedy_init, pred_step

    params, cfg = model.params["rnnt"], model.rnnt_cfg
    jp = params["joint"]

    @jax.jit
    def joint_pre(enc_t, g):
        f = jnp.matmul(enc_t, jp["enc"]["w"], precision=jax.lax.Precision
                       .HIGHEST) + jp["enc"]["b"]
        gg = jnp.matmul(g, jp["pred"]["w"], precision=jax.lax.Precision
                        .HIGHEST) + jp["pred"]["b"]
        x = f + gg
        logits = jnp.matmul(jax.nn.relu(x), jp["out"]["w"]) + jp["out"]["b"]
        return x, logits

    enc_max = 1e-8
    j_max = 1e-8
    for audio, alens in calib_batches:
        enc, enc_lens = model.encode(np.asarray(audio), np.asarray(alens))
        enc = np.asarray(enc)
        enc_lens = np.asarray(enc_lens)
        for i in range(enc.shape[0]):
            n = int(enc_lens[i])
            if n:
                enc_max = max(enc_max, float(np.abs(enc[i, :n]).max()))
        g, state, hyps = greedy_init(params, cfg, enc.shape[0])
        for t in range(enc.shape[1]):
            active = enc_lens > t
            if not active.any():
                break
            e_t = jnp.asarray(enc[:, t])
            for _ in range(max_symbols_per_step):
                x_pre, logits = joint_pre(e_t, g)
                j_max = max(j_max, float(jnp.abs(x_pre).max()))
                sym = np.asarray(logits).argmax(-1)
                emit = (sym != cfg.blank_id) & active
                if not emit.any():
                    break
                tok = np.where(emit, sym, cfg.blank_id).astype(np.int32)
                g2, state2 = pred_step(params, cfg, jnp.asarray(tok), state)
                keep = jnp.asarray(emit)[:, None]
                g = jnp.where(keep, g2, g)
                state = LSTMState(jnp.where(keep[None], state2.h, state.h),
                                  jnp.where(keep[None], state2.c, state.c))
    return enc_max, j_max
