"""Golden tests for the integer quantization primitives.

The ground truth is (a) exact Python big-integer arithmetic and (b) the
reference semantics re-expressed with torch float64 ops (independent
reimplementation of quant_utils.py:121-216 behavior, not a copy).
"""
import decimal
from decimal import Decimal

import jax.numpy as jnp
import numpy as np
import pytest

from qasr_tpu.ops.quant_prims import (
    Dyadic,
    QTensor,
    dyadic_from_scale,
    dyadic_from_scale_host,
    dyadic_requant,
    quantize,
    requant_clamp,
    requantize,
    symmetric_scale,
)


def _py_round_half_even_div(q: int, e: int) -> int:
    """Exact round-half-even of q / 2**e using Python ints."""
    sign = -1 if q < 0 else 1
    q = abs(q)
    floor, rem = divmod(q, 1 << e)
    half = 1 << (e - 1)
    if rem > half or (rem == half and (floor & 1)):
        floor += 1
    return sign * floor


def test_dyadic_requant_exact_vs_python(rng):
    for zmax, name in [(2**28 + 2**27, "accumulator"), (260, "activation")]:
        z = rng.integers(-zmax, zmax + 1, size=20000).astype(np.int32)
        m = rng.integers(2**30, 2**31, size=20000).astype(np.int32)
        e = rng.integers(1, 70, size=20000).astype(np.int32)
        got = np.asarray(dyadic_requant(jnp.asarray(z), Dyadic(jnp.asarray(m), jnp.asarray(e))))
        for i in range(len(z)):
            expect = _py_round_half_even_div(int(z[i]) * int(m[i]), int(e[i]))
            if abs(expect) >= 2**26:  # saturation region (callers clamp <= 2**9)
                assert abs(got[i]) >= 2**26, (i, z[i], m[i], e[i], got[i], expect)
            else:
                assert got[i] == expect, (i, z[i], m[i], e[i], got[i], expect)


def test_dyadic_requant_tie_cases():
    # exact .5 boundaries: z*m = 3 * 2**(e-1) -> 1.5 -> 2 (even); 1*2**(e-1) -> 0.5 -> 0
    m = jnp.asarray([2**30, 2**30, 2**30, 2**30], jnp.int32)
    e = jnp.asarray([31, 31, 31, 31], jnp.int32)
    z = jnp.asarray([3, 1, -3, -1], jnp.int32)  # z*m/2**e = 1.5, .5, -1.5, -.5
    out = np.asarray(dyadic_requant(z, Dyadic(m, e)))
    assert list(out) == [2, 0, -2, 0]


def test_dyadic_from_scale_host_matches_reference_semantics():
    torch = pytest.importorskip("torch")
    scales = np.asarray([1.0, 0.5, 3.1415926, 1e-4, 7.3e-7, 123.456, 2.0 ** -20], np.float64)
    d = dyadic_from_scale_host(scales)
    m = np.asarray(d.m, np.int64)
    e = np.asarray(d.e, np.int64)
    # reference semantics: np.frexp + Decimal ROUND_HALF_UP at 31 bits
    mf, ex = np.frexp(scales)
    for i in range(len(scales)):
        m_ref = int(Decimal(mf[i] * 2**31).quantize(Decimal("1"), rounding=decimal.ROUND_HALF_UP))
        e_ref = 31 - ex[i]
        if m_ref == 2**31:
            m_ref, e_ref = m_ref >> 1, e_ref - 1
        assert m[i] == m_ref and e[i] == e_ref
        # value reproduced to ~2**-31 relative
        assert abs(m[i] * 2.0 ** -float(e[i]) - scales[i]) <= scales[i] * 2.0 ** -30


def test_requant_matches_torch_float64_emulation(rng):
    """End-to-end: our integer requant vs the reference's float64 emulation."""
    torch = pytest.importorskip("torch")
    bits = 6
    n = 2 ** (bits - 1) - 1
    z = rng.integers(-(2**27), 2**27, size=100000).astype(np.int64)
    pre_sf = np.float32(3.7e-5)
    out_sf = np.float32(0.0931)
    # --- reference-style float64 emulation (torch) ---
    new_scale = np.float64(pre_sf) / np.float64(out_sf)
    mf, ex = np.frexp(new_scale)
    m_ref = int(Decimal(mf * 2**31).quantize(Decimal("1"), rounding=decimal.ROUND_HALF_UP))
    e_ref = float(31 - ex)
    t = torch.round(torch.from_numpy(z).double() * m_ref / (2.0 ** e_ref))
    ref = torch.clamp(t, -n - 1, n).numpy()
    # --- ours ---
    d = dyadic_from_scale_host(np.asarray(new_scale))
    got = requant_clamp(dyadic_requant(jnp.asarray(z, jnp.int32), d), bits)
    mismatches = int(np.sum(np.asarray(got) != ref))
    # identical except float64 tie-rounding flukes (expected ~0 of 1e5)
    assert mismatches == 0, mismatches


def test_quantize_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(64, 33)).astype(np.float32) * 0.2
    for bits in (4, 6, 8):
        n = 2 ** (bits - 1) - 1
        sat = np.maximum(np.abs(x.min()), np.abs(x.max()))
        scale = np.float32(max(sat, 1e-8) / n)
        # reference linear_quantize computes round(1./scale * x) (quant_utils.py:26)
        ref = torch.clamp(torch.round((1.0 / torch.tensor(scale)) * torch.from_numpy(x)), -n, n - 1).numpy()
        got = np.asarray(quantize(jnp.asarray(x), jnp.float32(scale), bits))
        np.testing.assert_array_equal(got, ref)


def test_symmetric_scale_per_channel(rng):
    x = rng.normal(size=(8, 16)).astype(np.float32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    s = np.asarray(symmetric_scale(jnp.asarray(mn), jnp.asarray(mx), 8))
    expect = np.maximum(np.abs(mn), np.abs(mx)).clip(min=1e-8) / 127.0
    np.testing.assert_allclose(s, expect, rtol=3e-7)


def test_dyadic_from_scale_ingraph_close_to_host():
    scales = np.asarray([1.0, 0.5, 3.14159, 1e-4, 7.3e-7, 123.456], np.float32)
    dg = dyadic_from_scale(jnp.asarray(scales))
    m = np.asarray(dg.m, np.int64)
    e = np.asarray(dg.e, np.int64)
    vals = m * np.exp2(-e.astype(np.float64))
    np.testing.assert_allclose(vals, scales.astype(np.float64), rtol=2**-23)
    assert np.all(m >= 2**30) and np.all(m < 2**31)
    # identity scale must be exact (first-QuantAct pass-through property)
    assert m[0] == 2**30 and e[0] == 30


def test_requantize_identity_scale_is_noop():
    z = jnp.asarray(np.arange(-31, 32), jnp.int32)
    x = QTensor(z, jnp.float32(0.017))
    out = requantize(x, jnp.float32(0.017), 6)
    np.testing.assert_array_equal(np.asarray(out.values), np.asarray(z))


def test_requantize_with_identity_residual(rng):
    torch = pytest.importorskip("torch")
    bits = 8
    n = 2 ** (bits - 1) - 1
    z = rng.integers(-(2**26), 2**26, size=5000).astype(np.int64)
    zi = rng.integers(-120, 120, size=5000).astype(np.int64)
    sf_x, sf_i, sf_o = np.float32(5.1e-6), np.float32(0.071), np.float32(0.0652)
    # torch float64 emulation of fixedpoint_mul with identity
    def emul(zv, sf):
        ns = np.float64(sf) / np.float64(sf_o)
        mf, ex = np.frexp(ns)
        m = int(Decimal(mf * 2**31).quantize(Decimal("1"), rounding=decimal.ROUND_HALF_UP))
        return torch.round(torch.from_numpy(zv).double() * m / 2.0 ** float(31 - ex))
    ref = torch.clamp(emul(z, sf_x) + emul(zi, sf_i), -n - 1, n).numpy()
    got = requantize(
        QTensor(jnp.asarray(z, jnp.int32), jnp.asarray(sf_x)),
        jnp.asarray(sf_o),
        bits,
        dyadic=dyadic_from_scale_host(np.float64(sf_x) / np.float64(sf_o)),
        identity=QTensor(jnp.asarray(zi, jnp.int32), jnp.asarray(sf_i)),
        identity_dyadic=dyadic_from_scale_host(np.float64(sf_i) / np.float64(sf_o)),
    )
    np.testing.assert_array_equal(np.asarray(got.values), ref)


def test_dyadic_requant_domain_boundaries():
    """Contract boundaries: |z| up to 2**29-1, m in {2**30, 2**31-1},
    e in {1, 31, 32, 62, 63}; exact vs Python ints (with the 2**26 saturation)."""
    zs = [0, 1, -1, 2**29 - 1, -(2**29 - 1), 12345678, -98765432]
    ms = [2**30, 2**31 - 1, 3 << 29]
    es = [1, 2, 31, 32, 33, 62, 63, 70]
    Z, M, E = [], [], []
    for z in zs:
        for m in ms:
            for e in es:
                Z.append(z); M.append(m); E.append(e)
    got = np.asarray(dyadic_requant(
        jnp.asarray(Z, jnp.int32),
        Dyadic(jnp.asarray(M, jnp.int32), jnp.asarray(E, jnp.int32))))
    for i, (z, m, e) in enumerate(zip(Z, M, E)):
        expect = _py_round_half_even_div(z * m, e) if e <= 62 else 0
        if abs(expect) >= 2**26:
            assert abs(got[i]) == 2**26, (z, m, e, got[i])
            assert np.sign(got[i]) == np.sign(expect)
        else:
            assert got[i] == expect, (z, m, e, got[i], expect)


def test_dyadic_requant_static_matches_vector_on_boundaries():
    from qasr_tpu.ops.quant_prims import dyadic_requant_static

    zs = jnp.asarray([0, 1, -1, 2**29 - 1, -(2**29 - 1), 777], jnp.int32)
    for m in (2**30, 2**31 - 1):
        for e in (1, 31, 32, 33, 62):
            a = dyadic_requant(zs, Dyadic(jnp.int32(m), jnp.int32(e)))
            b = dyadic_requant_static(zs, jnp.int32(m), e)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHistogramQuantile:
    """ops/stats.histogram_quantile vs torch.quantile at calibration-realistic
    sizes (SURVEY.md hard-part 4: no full-tensor sort on TPU)."""

    def _check(self, x, percentile, tol):
        import torch

        from qasr_tpu.ops.stats import quantile_range

        lo, hi = quantile_range(jnp.asarray(x), percentile)
        # float64 torch as ground truth: torch.quantile on a float32 tensor
        # lerps with a float32 fractional rank, which at n ~ 2^18+ quantizes
        # the interpolation weight by ~0.01 — our host-float64 ranks are the
        # more accurate ones
        t = torch.from_numpy(x.reshape(-1)).double()
        tlo = float(torch.quantile(t, 1.0 - percentile / 100.0))
        thi = float(torch.quantile(t, percentile / 100.0))
        rng_span = float(x.max() - x.min())
        assert abs(float(lo) - tlo) <= tol * rng_span, (float(lo), tlo)
        assert abs(float(hi) - thi) <= tol * rng_span, (float(hi), thi)

    def test_parity_reference_calibration_size(self, rng):
        pytest.importorskip("torch")
        # the reference recipe's calibration site: batch 8 x 500 frames x 64
        # mel features (inference.py:52), p=99.996 (README.md:82)
        x = rng.normal(size=(8, 500, 64)).astype(np.float32)
        self._check(x, 99.996, tol=1e-5)

    def test_parity_wide_channels_heavy_tail(self, rng):
        pytest.importorskip("torch")
        x = (rng.normal(size=(8, 500, 512)) ** 3).astype(np.float32)  # heavy tail
        self._check(x, 99.9, tol=1e-5)

    def test_parity_constant_tensor(self):
        pytest.importorskip("torch")
        from qasr_tpu.ops.stats import quantile_range

        x = np.full((4, 100, 64), 3.25, np.float32)
        lo, hi = quantile_range(jnp.asarray(x), 99.9)
        assert float(lo) == pytest.approx(3.25)
        assert float(hi) == pytest.approx(3.25)

    def test_sharded_matches_single_device(self, rng):
        """SPMD: batch-sharded input must give the same clipping range."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from qasr_tpu.ops.stats import quantile_range
        from qasr_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        x = rng.normal(size=(8, 500, 64)).astype(np.float32)
        ref = jax.jit(lambda a: quantile_range(a, 99.9))(jnp.asarray(x))
        mesh = make_mesh(data=8, model=1)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        got = jax.jit(lambda a: quantile_range(a, 99.9))(xs)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-6)


def test_dyadic_requant_fuzz_vs_bigint():
    """Seeded fuzz over the requant domain: exact two-limb dyadic vs Python
    big-int round-half-even ground truth (ROADMAP property-test item)."""
    from qasr_tpu.ops.quant_prims import Dyadic, dyadic_requant, dyadic_requant_static

    rng = np.random.default_rng(123)
    for trial in range(20):
        n = 257
        z = rng.integers(-(2**28), 2**28, (n,)).astype(np.int32)
        m = rng.integers(2**30, 2**31, (n,)).astype(np.int32)
        e = int(rng.integers(1, 62))
        got = np.asarray(dyadic_requant(jnp.asarray(z), Dyadic(jnp.asarray(m), e)))
        got_static = np.asarray(dyadic_requant_static(jnp.asarray(z), jnp.asarray(m), e))
        for i in rng.integers(0, n, 16):  # spot-check against big-int
            num = int(abs(int(z[i]))) * int(m[i])
            q, r = divmod(num, 1 << e)
            half = 1 << (e - 1)
            if r > half or (r == half and q % 2 == 1):
                q += 1
            q = min(q, 1 << 26)  # saturation sentinel
            expect = int(np.sign(z[i])) * q
            assert got[i] == expect, (trial, i, int(z[i]), int(m[i]), e, got[i], expect)
            assert got_static[i] == expect


def test_dyadic_requant_static16_fuzz_vs_bigint():
    """16-bit-mantissa chain (two multiplies, one limb recombination) vs
    Python big-int round-half-even, signed and nonneg, across the full
    static_e16 exponent range incl. the e<16 saturation branch."""
    from qasr_tpu.ops.quant_prims import dyadic_requant_static16

    rng = np.random.default_rng(321)
    for trial in range(24):
        n = 257
        z = rng.integers(-(2**29) + 1, 2**29, (n,)).astype(np.int32)
        m = rng.integers(1, 2**16, (n,)).astype(np.int32)
        e = int(rng.integers(1, 32))
        got = np.asarray(dyadic_requant_static16(
            jnp.asarray(z), jnp.asarray(m), e))
        zp = np.abs(z).astype(np.int64)
        got_nn = np.asarray(dyadic_requant_static16(
            jnp.asarray(zp.astype(np.int32)), jnp.asarray(m), e, nonneg=True))
        for i in rng.integers(0, n, 24):
            num = int(zp[i]) * int(m[i])
            q, r = divmod(num, 1 << e)
            half = 1 << (e - 1)
            if r > half or (r == half and q % 2 == 1):
                q += 1
            q = min(q, 1 << 26)
            assert got[i] == int(np.sign(z[i])) * q, \
                (trial, i, int(z[i]), int(m[i]), e, got[i])
            assert got_nn[i] == q


def test_dyadic_static16_matches_static31_on_shared_table():
    """When a 31-bit table's mantissas happen to fit 16 bits, both chains
    must agree exactly (same (m, e) => same rounding)."""
    from qasr_tpu.ops.quant_prims import (dyadic_requant_static,
                                          dyadic_requant_static16)

    rng = np.random.default_rng(7)
    z = rng.integers(-(2**24), 2**24, (513,)).astype(np.int32)
    m = rng.integers(1, 2**16, (513,)).astype(np.int32)
    for e in (3, 15, 16, 17, 30, 31):
        a = np.asarray(dyadic_requant_static(jnp.asarray(z), jnp.asarray(m), e))
        b = np.asarray(dyadic_requant_static16(jnp.asarray(z), jnp.asarray(m), e))
        np.testing.assert_array_equal(a, b, err_msg=f"e={e}")
