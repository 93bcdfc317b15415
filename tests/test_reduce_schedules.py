"""Safety proofs for the lean emit_reduce carry/fold schedules.

Two layers:

* ``test_interval_bounds``: exact interval arithmetic over per-row magnitude
  bounds — a *proof* that no intermediate of the schedule can exceed int32
  for the worst inputs the kernels feed (conv of two sums-of-two-reduced
  values, rows <= +-4100; x2-scaled convs; short sums).
* ``test_randomized_exact``: int64 simulation on random + adversarial
  corner inputs asserting (a) int32 range at every step, (b) rows beyond
  STORE are exactly zero when sliced, (c) congruence mod the field prime,
  (d) balanced output rows (<= 2^11+2).

Any change to ``pallas_field._SCHEDULES`` must keep these green.
"""
import numpy as np
import pytest

from bulletproofs_r1cs_gadgets_tpu.utils.constants import P, L
from bulletproofs_r1cs_gadgets_tpu.ops.field import (
    LIMB_BITS, HALF, STORE, int_to_limbs,
)
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_field import _SCHEDULES, _FOLDS

I32 = 2**31 - 1
SUM2 = 2 * (2**11 + 8)  # rows of a sum of two reduced outputs (worst bound)

FIELDS = {"fp": (P,), "fq": (L,)}


def _fold_info(field):
    fold_limb, fold_rows = _FOLDS[field]
    return fold_limb, np.asarray(fold_rows, dtype=np.int64)


# ------------------------------------------------------ interval tracking
def _carry_bounds(lo, hi):
    n = len(lo)
    clo = [(l + HALF) >> LIMB_BITS for l in lo]
    chi = [(h + HALF) >> LIMB_BITS for h in hi]
    out_lo = [-HALF] * n + [0]
    out_hi = [HALF] * n + [0]
    for i in range(n):
        out_lo[i + 1] += clo[i]
        out_hi[i + 1] += chi[i]
    return out_lo, out_hi


def _fold_bounds(lo, hi, fl, frows):
    n = len(lo)
    if n <= fl:
        return lo, hi, 0
    hi_lo, hi_hi = lo[fl:], hi[fl:]
    m = len(hi_lo)
    width = max(STORE, m + len(frows) - 1, fl)
    olo, ohi = [0] * width, [0] * width
    for j, c in enumerate(frows):
        for i in range(m):
            vals = (hi_lo[i] * c, hi_hi[i] * c)
            olo[i + j] += min(vals)
            ohi[i + j] += max(vals)
    peak = max(abs(x) for x in olo + ohi)
    for i in range(fl):
        olo[i] += lo[i]
        ohi[i] += hi[i]
    peak = max(peak, max(abs(x) for x in olo + ohi))
    return olo, ohi, peak


def _conv_bounds(mag_a, mag_b, width=STORE):
    lo = [-mag_a] * width
    hi = [mag_a] * width
    olo = [0] * (2 * width - 1)
    ohi = [0] * (2 * width - 1)
    for i in range(width):
        for j in range(width):
            olo[i + j] -= mag_a * mag_b
            ohi[i + j] += mag_a * mag_b
    return olo, ohi


def _schedule_out_bound(field, in_mag, scale=1):
    """Run the long schedule on interval bounds for conv(+-in_mag, +-in_mag)
    (optionally x`scale`d); return (peak, final output row bound)."""
    fl, frows = _fold_info(field)
    lo, hi = _conv_bounds(in_mag, in_mag)
    lo = [x * scale for x in lo]
    hi = [x * scale for x in hi]
    peak = max(abs(x) for x in lo + hi)
    for op in _SCHEDULES[field]["long"]:
        if op == "C":
            lo, hi = _carry_bounds(lo, hi)
        else:
            lo, hi, p = _fold_bounds(lo, hi, fl, frows)
            peak = max(peak, p)
        peak = max(peak, max(abs(x) for x in lo + hi))
    final = max(max(abs(l), abs(h)) for l, h in zip(lo[:STORE], hi[:STORE]))
    return peak, final


@pytest.mark.parametrize("field", ["fp", "fq"])
@pytest.mark.parametrize("scale", [1, 2])
def test_interval_bounds(field, scale):
    # fixpoint: outputs bounded by R, conv inputs are sums of two outputs
    # (+-2R); iterate until R is self-consistent, then check int32 safety
    R = 2**11 + 2
    for _ in range(8):
        peak, final = _schedule_out_bound(field, 2 * R, scale)
        if final <= R:
            break
        R = final
    assert final <= R, f"{field}: output bound did not converge"
    assert peak <= I32, f"{field}: interval peak 2^{np.log2(peak):.2f}"
    assert R <= 2**11 + 8  # documented balanced-output guarantee


# ------------------------------------------------------ exact simulation
def _val(rows):
    return sum(int(r) << (LIMB_BITS * i) for i, r in enumerate(rows))


def _run(x, seq, fl, frows, modulus):
    v0 = _val(x) % modulus
    for op in seq:
        if op == "C":
            assert np.abs(x).max() <= I32
            c = (x + HALF) >> LIMB_BITS
            rem = x - (c << LIMB_BITS)
            out = np.zeros(len(x) + 1, dtype=np.int64)
            out[: len(x)] = rem
            out[1:] += c
            x = out
        else:
            if len(x) <= fl:
                continue
            lo, hi = x[:fl], x[fl:]
            width = max(STORE, len(hi) + len(frows) - 1, fl)
            out = np.zeros(width, dtype=np.int64)
            for j, c in enumerate(frows):
                out[j : j + len(hi)] += hi * c
                assert np.abs(out).max() <= I32
            out[:fl] += lo
            x = out
        assert np.abs(x).max() <= I32
    assert np.all(x[STORE:] == 0), f"tail rows nonzero: {x[STORE:]}"
    x = x[:STORE]
    assert _val(x) % modulus == v0
    assert np.abs(x).max() <= 2**11 + 8
    return x


@pytest.mark.parametrize("field", ["fp", "fq"])
def test_randomized_exact(field):
    rng = np.random.default_rng(11)
    (modulus,) = FIELDS[field]
    fl, frows = _fold_info(field)
    B = SUM2
    for trial in range(3000):
        if trial < 64:
            a = np.full(STORE, B if trial % 2 else -B, dtype=np.int64)
            b = rng.choice([-B, B], STORE).astype(np.int64)
        else:
            a = rng.integers(-B, B + 1, STORE).astype(np.int64)
            b = rng.integers(-B, B + 1, STORE).astype(np.int64)
        _run(np.convolve(a, b), _SCHEDULES[field]["long"], fl, frows, modulus)
    for trial in range(500):
        a = rng.integers(-B, B + 1, STORE).astype(np.int64)
        _run(a, _SCHEDULES[field]["short"], fl, frows, modulus)
    for trial in range(500):  # x2-scaled conv (padd's Dv path)
        a = rng.integers(-2050, 2051, STORE).astype(np.int64)
        b = rng.integers(-2050, 2051, STORE).astype(np.int64)
        _run(np.convolve(a, b) * 2, _SCHEDULES[field]["long"], fl, frows,
             modulus)
