"""i-sigmoid / i-exp strength-reduction probe: are the int32 multiplies
inside the integer swish worth an exact f32 lowering?

After the fast-idiv and subsampler wins, the FFN family (16.1 ms of a
~48 ms step) is the largest term, and its glue is i-sigmoid: per element,
i_exp runs two int32 multiplies (z*Q_LN2, (p+Q_B)**2) plus a variable
right-shift — int32 multiply is emulated on the TPU VPU where f32 FMA is
native.  Every i_exp intermediate fits exactly in f32 (p+Q_B <= 1108,
square+Q_C < 2^21, shift is a power-of-two scale of a <2^21 integer), so
an f32 lowering can be EXACT, and the input grid is only 32,767 values so
exactness is checked exhaustively, not by fuzzing.

Measures on the real chip at the FFN shape (B*T'=12032, 4*d=1024) x 32
halves-per-step equivalents:
  1. i_sigmoid_grid current (int32) vs f32-exact variant, ms per step;
  2. exhaustive bit-identity over the whole S_IN grid [-N_IN, N_IN].

Run: python experiments/isigmoid_probe.py [--bt 12032 --width 1024]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=12032)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--halves", type=int, default=32,
                    help="FFN halves per step (2 per layer x 16 layers)")
    args = ap.parse_args()

    from qasr_tpu.utils.compile_cache import setup_compile_cache
    os.environ.setdefault(
        "QASR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    setup_compile_cache()

    import jax
    import jax.numpy as jnp
    from qasr_tpu.ops import integer_sigmoid as ISG
    from qasr_tpu.ops.integer_softmax import N_IN

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-N_IN, N_IN + 1,
                                 size=(args.bt, args.width)
                                 ).astype(np.int32))

    def timed(tag, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

        def run(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = None
                for _ in range(k):
                    o = f(*xs)
                np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
                best = min(best, time.perf_counter() - t0)
            return best

        ms = (run(6) - run(2)) / 4 * 1e3
        print(json.dumps({"leg": tag, "ms_one": round(ms, 3),
                          "ms_per_step": round(ms * args.halves, 2)}))
        return out

    def loop(fn):
        # chain `halves` applications data-dependently so XLA can't CSE
        def body(x):
            y = x
            for _ in range(4):  # 4 per jit call keeps compile time sane
                y = jnp.clip(y - (fn(y) >> 4), -N_IN, N_IN)
            return y
        return body

    # current lowering (whatever fast_int flags say)
    y_cur = timed("i_sigmoid_grid (current x4)", loop(ISG.i_sigmoid_grid), q)

    # f32-exact candidate (the form shipped as ops/integer_softmax.py::
    # i_exp's fast path; constants imported, not hardcoded — an early
    # version of this probe hardcoded a stale Q_C comment value and read
    # 6 grid mismatches that were constant skew, not f32 error)
    from qasr_tpu.ops.fast_int import floor_div
    from qasr_tpu.ops.integer_softmax import Q_B, Q_C, Q_LN2

    def i_exp_f32(qi):
        # qi <= 0.  z = floor(|q|/568) via (|q|+0.5)*(1/568): the true
        # ratio sits >= 0.5/568 from any integer, 250x the f32 product
        # error, so floor is exact despite fl(1/568) being inexact.
        qf = qi.astype(jnp.float32)
        z = jnp.floor((0.5 - qf) * (1.0 / -Q_LN2))
        p = qf + z * float(-Q_LN2)                   # (-568, 0], exact
        ql = (p + float(Q_B)) ** 2 + float(Q_C)      # < 2^21, exact
        zi = jnp.minimum(z.astype(jnp.int32), 30)
        scale = jax.lax.bitcast_convert_type(
            (jnp.int32(127) - zi) << 23, jnp.float32)
        return jnp.floor(ql * scale).astype(jnp.int32)

    E0 = Q_B * Q_B + Q_C
    K = ISG.K_SIG

    def i_sigmoid_f32(qi):
        qi = jnp.clip(qi, -N_IN, N_IN)
        e = i_exp_f32(-jnp.abs(qi))
        den = e + E0
        s_neg = floor_div((e << K) + (den >> 1), den)
        return jnp.where(qi >= 0, (1 << K) - s_neg, s_neg)

    y_f32 = timed("i_sigmoid f32-exact (x4)", loop(i_sigmoid_f32), q)

    same = bool(np.array_equal(np.asarray(y_cur), np.asarray(y_f32)))
    # exhaustive exactness over the whole grid
    grid = jnp.arange(-N_IN, N_IN + 1, dtype=jnp.int32)
    ref = np.asarray(jax.jit(ISG.i_sigmoid_grid)(grid))
    f32 = np.asarray(jax.jit(i_sigmoid_f32)(grid))
    n_mismatch = int((ref != f32).sum())
    print(json.dumps({"loop_outputs_identical": same,
                      "exhaustive_grid_mismatches": n_mismatch,
                      "grid_size": int(grid.shape[0])}))


if __name__ == "__main__":
    main()
