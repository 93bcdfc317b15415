"""Randomized int64 simulation of the lean reduce schedules: asserts every
intermediate fits int32, final rows >= STORE are exactly zero, result is
congruent, and output rows are balanced (<= 2^11+1)."""
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from bulletproofs_r1cs_gadgets_tpu.utils.constants import P, L
from bulletproofs_r1cs_gadgets_tpu.ops.field import (
    LIMB_BITS, RADIX, HALF, STORE, int_to_limbs,
)

rng = np.random.default_rng(7)
I32MAX = 2**31 - 1


def fold_rows_of(value):
    sign = -1 if value < 0 else 1
    mags = int_to_limbs(abs(value), STORE)
    nz = int(np.max(np.nonzero(mags)[0])) + 1 if np.any(mags) else 1
    return np.array([sign * int(mags[i]) for i in range(nz)], dtype=np.int64)


FIELDS = {
    "fp": (P, 22, fold_rows_of(19 << 9)),
    "fq": (L, 21, fold_rows_of(-(L - (1 << 252)))),
}


def val(rows):
    return sum(int(r) << (LIMB_BITS * i) for i, r in enumerate(rows))


def carry(x):
    assert np.abs(x).max() <= I32MAX, "pre-carry overflow"
    c = (x + HALF) >> LIMB_BITS
    rem = x - (c << LIMB_BITS)
    out = np.zeros(len(x) + 1, dtype=np.int64)
    out[: len(x)] = rem
    out[1:] += c
    assert np.abs(out).max() <= I32MAX
    return out


def fold(x, fl, frows):
    if len(x) <= fl:
        return x
    lo, hi = x[:fl], x[fl:]
    plen = len(hi) + len(frows) - 1
    width = max(STORE, plen, fl)
    out = np.zeros(width, dtype=np.int64)
    acc = np.zeros(width, dtype=np.int64)
    for j, c in enumerate(frows):
        acc[j : j + len(hi)] += hi * c
        assert np.abs(acc).max() <= I32MAX, "fold acc overflow"
    out[:fl] += lo
    out += acc
    assert np.abs(out).max() <= I32MAX
    return out


def run(x, seq, fl, frows, modulus):
    v0 = val(x) % modulus
    for op in seq:
        x = carry(x) if op == "C" else fold(x, fl, frows)
    assert np.all(x[STORE:] == 0), f"tail rows nonzero: {x[STORE:]}"
    x = x[:STORE]
    assert val(x) % modulus == v0, "congruence broken"
    assert np.abs(x).max() <= 2**11 + 2, f"unbalanced output {np.abs(x).max()}"
    return x


SEQS = {"fp": {"long": "CFCFCC", "short": "CFCC"},
        "fq": {"long": "CCFCFCFCC", "short": "CFCC"}}

N = 20000
for fname, (modulus, fl, frows) in FIELDS.items():
    # worst-case conv inputs: rows uniform in [-(2^12+2), 2^12+2]
    # (sums of two reduced values), adversarial corners included
    B = 4100
    for trial in range(N):
        if trial < 100:
            a = np.full(STORE, B if trial % 2 else -B, dtype=np.int64)
            b = np.full(STORE, B, dtype=np.int64)
            if trial % 3 == 0:
                a = rng.choice([-B, B], STORE).astype(np.int64)
        else:
            a = rng.integers(-B, B + 1, STORE).astype(np.int64)
            b = rng.integers(-B, B + 1, STORE).astype(np.int64)
        conv = np.convolve(a, b)
        run(conv.copy(), SEQS[fname]["long"], fl, frows, modulus)
    # short inputs: 23-row sums
    for trial in range(N // 4):
        a = rng.integers(-B, B + 1, STORE).astype(np.int64)
        run(a.copy(), SEQS[fname]["short"], fl, frows, modulus)
    # scale-const x2 path: conv of reduced values then *2
    for trial in range(N // 4):
        a = rng.integers(-(2**11 + 1), 2**11 + 2, STORE).astype(np.int64)
        b = rng.integers(-(2**11 + 1), 2**11 + 2, STORE).astype(np.int64)
        conv = np.convolve(a, b) * 2
        run(conv.copy(), SEQS[fname]["long"], fl, frows, modulus)
    print(f"{fname}: all schedules pass ({N} long + {N//2} aux trials)")
