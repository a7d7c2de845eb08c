"""Exactness of ops/fast_int.py against the plain integer forms.

floor_div / floor_sqrt replace XLA's emulated int32 division (TPU's VPU
has no integer divide) with f32 estimate + integer fixup; they must be
BIT-IDENTICAL to `//` / Newton i_sqrt on their stated domains — these
tests fuzz the domains, sweep the adversarial boundaries (exact
multiples, half-way rounding, var==0 rows), and assert the three integer
ops are unchanged with the rewrite on vs off.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from qasr_tpu.ops.fast_int import floor_div, floor_sqrt

RNG = np.random.default_rng(1234)


def _check_div(n, d, two_stage):
    got = np.asarray(floor_div(jnp.asarray(n), jnp.asarray(d),
                               two_stage=two_stage))
    want = n.astype(np.int64) // d.astype(np.int64)
    bad = got.astype(np.int64) != want
    assert not bad.any(), (
        f"{bad.sum()} mismatches; first: n={n[bad][0]} d={d[bad][0]} "
        f"got={got[bad][0]} want={want[bad][0]}")


def test_floor_div_single_stage_fuzz():
    # sigmoid/softmax-shaped: nonneg numerator, quotient < 2^15
    n = RNG.integers(0, 1 << 28, size=200_000).astype(np.int32)
    d = RNG.integers(1 << 13, 1 << 22, size=200_000).astype(np.int32)
    _check_div(n, d, False)


def test_floor_div_single_stage_signed():
    n = RNG.integers(-(1 << 26), 1 << 26, size=200_000).astype(np.int32)
    d = RNG.integers(1 << 7, 1 << 22, size=200_000).astype(np.int32)
    _check_div(n, d, False)


def test_floor_div_two_stage_fuzz():
    # LN-shaped: signed numerator |n| < 2^25, divisor >= 1 (quotients to
    # 2^25 — far past the single-stage domain)
    n = RNG.integers(-(1 << 25), 1 << 25, size=200_000).astype(np.int32)
    d = RNG.integers(1, 1 << 18, size=200_000).astype(np.int32)
    _check_div(n, d, True)
    _check_div(n, np.ones_like(d), True)  # divisor 1: q == n exactly


def test_floor_div_boundaries():
    # exact multiples and +-1 around them: the fixup's compare edges
    q = RNG.integers(-(1 << 15), 1 << 15, size=50_000).astype(np.int64)
    d = RNG.integers(1, 1 << 10, size=50_000).astype(np.int64)
    for off in (-1, 0, 1):
        n = (q * d + off).astype(np.int32)
        keep = np.abs(q * d + off) < (1 << 25)
        _check_div(n[keep], d[keep].astype(np.int32), True)


def test_floor_div_negative_constant_divisor():
    # i_exp's z = q // Q_LN2 with Q_LN2 = -568 and q <= 0
    n = RNG.integers(-16383, 1, size=100_000).astype(np.int32)
    got = np.asarray(floor_div(jnp.asarray(n), -568))
    want = n.astype(np.int64) // -568
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_floor_sqrt_fuzz_and_boundaries():
    from qasr_tpu.ops.integer_layernorm import i_sqrt

    m = RNG.integers(0, 1 << 30, size=200_000).astype(np.int32)
    # perfect squares and +-1 neighbours: where the fixup has to decide
    r = RNG.integers(0, 1 << 15, size=50_000).astype(np.int64)
    edges = np.concatenate([r * r, r * r - 1, r * r + 1,
                            np.array([0, 1, 2, 3, (1 << 30) - 1])])
    edges = edges[(edges >= 0) & (edges < (1 << 30))].astype(np.int32)
    for arr in (m, edges):
        got = np.asarray(floor_sqrt(jnp.asarray(arr)))
        want = np.asarray(i_sqrt(jnp.asarray(arr)))
        np.testing.assert_array_equal(got, want)
    assert int(floor_sqrt(jnp.asarray(np.int32(-5)))) == 0


@pytest.mark.parametrize("op", ["layernorm", "sigmoid", "softmax"])
def test_integer_ops_bit_identical_fast_vs_plain(op):
    """The three integer glue ops produce the SAME bits with the f32
    rewrite on and off (QASR_FAST_IDIV is read at trace time; eager
    calls re-read it per call)."""
    from qasr_tpu.ops.integer_layernorm import i_layernorm_core
    from qasr_tpu.ops.integer_sigmoid import i_sigmoid_grid
    from qasr_tpu.ops.integer_softmax import i_softmax_grid

    if op == "layernorm":
        x = jnp.asarray(RNG.integers(-511, 512, size=(4, 9, 256),
                                     dtype=np.int32))
        # a near-constant row: var == 0 with nonzero d (the 2^22 quotient)
        x = x.at[0, 0].set(0).at[0, 0, 3].set(15)
        fn = lambda: i_layernorm_core(x)
    elif op == "sigmoid":
        x = jnp.asarray(RNG.integers(-16383, 16384, size=(4, 9, 1024),
                                     dtype=np.int32))
        fn = lambda: i_sigmoid_grid(x)
    else:
        x = jnp.asarray(RNG.integers(-16383, 1, size=(4, 9, 128),
                                     dtype=np.int32))
        fn = lambda: i_softmax_grid(x)

    old = os.environ.get("QASR_FAST_IDIV")
    try:
        os.environ["QASR_FAST_IDIV"] = "1"
        fast = np.asarray(fn())
        os.environ["QASR_FAST_IDIV"] = "0"
        plain = np.asarray(fn())
    finally:
        if old is None:
            os.environ.pop("QASR_FAST_IDIV", None)
        else:
            os.environ["QASR_FAST_IDIV"] = old
    np.testing.assert_array_equal(fast, plain)


def test_i_exp_exhaustive_fast_vs_plain():
    """i_exp's f32 lowering is exact on its ENTIRE domain, not a fuzz
    sample: every call site clamps q to [-N_IN, 0] (16,384 values), so
    bit-identity is checked exhaustively — and through i_sigmoid_grid's
    full [-N_IN, N_IN] input range too."""
    from qasr_tpu.ops.integer_sigmoid import i_sigmoid_grid
    from qasr_tpu.ops.integer_softmax import N_IN, i_exp

    dom = jnp.arange(-N_IN, 1, dtype=jnp.int32)
    sig = jnp.arange(-N_IN, N_IN + 1, dtype=jnp.int32)
    old = os.environ.get("QASR_FAST_IDIV")
    try:
        os.environ["QASR_FAST_IDIV"] = "1"
        e_fast = np.asarray(i_exp(dom))
        s_fast = np.asarray(i_sigmoid_grid(sig))
        os.environ["QASR_FAST_IDIV"] = "0"
        e_plain = np.asarray(i_exp(dom))
        s_plain = np.asarray(i_sigmoid_grid(sig))
    finally:
        if old is None:
            os.environ.pop("QASR_FAST_IDIV", None)
        else:
            os.environ["QASR_FAST_IDIV"] = old
    np.testing.assert_array_equal(e_fast, e_plain)
    np.testing.assert_array_equal(s_fast, s_plain)
