"""Explore leaner emit_reduce schedules for the fp (2^255-19) field.

Two tools:
1. A symbolic *bound tracker* that simulates any carry/fold schedule on
   per-row magnitude bounds (exact interval arithmetic) and checks that no
   intermediate can exceed int32, for the worst-case inputs each call site
   feeds (balanced products, sums of two reduced values, etc.).
2. A numpy int64 randomized checker that runs the schedule on random
   values, asserts int32-range at every step, and checks the result is
   congruent mod p and fits STORE balanced-ish limbs.

Schedules are lists of ops: ("C",) carry; ("F",) fold-all-high.
"""
import numpy as np
import sys
sys.path.insert(0, "/root/repo")

from bulletproofs_r1cs_gadgets_tpu.utils.constants import P, L
from bulletproofs_r1cs_gadgets_tpu.ops.field import (
    LIMB_BITS, RADIX, HALF, STORE, int_to_limbs,
)

I32 = 2**31 - 1


def fold_rows_of(value):
    sign = -1 if value < 0 else 1
    mags = int_to_limbs(abs(value), STORE)
    nz = int(np.max(np.nonzero(mags)[0])) + 1 if np.any(mags) else 1
    return [sign * int(mags[i]) for i in range(nz)]


FP_FOLD_LIMB = 22
FP_FOLD = fold_rows_of(19 << 9)   # 2 rows
FQ_FOLD_LIMB = 21
FQ_FOLD = fold_rows_of(-(L - (1 << 252)))  # 11 rows


# ---------------------------------------------------------- bound tracking
def carry_bounds(lo, hi):
    """Interval per-row; carry = (x + HALF) >> LB; rem = x - carry<<LB."""
    n = len(lo)
    clo = [(l + HALF) >> LIMB_BITS for l in lo]
    chi = [(h + HALF) >> LIMB_BITS for h in hi]
    # rem in [-HALF, HALF-?]: rem = x - carry*RADIX; with arithmetic shift,
    # rem in [-HALF, HALF-1]... conservatively [-HALF, HALF]
    rlo = [-HALF] * n
    rhi = [HALF] * n
    out_lo = rlo + [0]
    out_hi = rhi + [0]
    for i in range(n):
        out_lo[i + 1] += clo[i]
        out_hi[i + 1] += chi[i]
    return out_lo, out_hi


def fold_bounds(lo, hi, fold_limb, fold_rows):
    n = len(lo)
    if n <= fold_limb:
        return lo, hi, 0
    lo_lo, lo_hi = lo[:fold_limb], hi[:fold_limb]
    hi_lo, hi_hi = lo[fold_limb:], hi[fold_limb:]
    m = len(hi_lo)
    plen = m + len(fold_rows) - 1
    width = max(STORE, plen, fold_limb)
    olo = [0] * width
    ohi = [0] * width
    peak = 0
    for j, c in enumerate(fold_rows):
        for i in range(m):
            a, b = hi_lo[i] * c, hi_hi[i] * c
            t_lo, t_hi = min(a, b), max(a, b)
            olo[i + j] += t_lo
            ohi[i + j] += t_hi
    peak = max([abs(x) for x in olo + ohi] + [0])
    for i in range(fold_limb):
        olo[i] += lo_lo[i]
        ohi[i] += lo_hi[i]
    peak = max(peak, max(abs(x) for x in olo + ohi))
    return olo, ohi, peak


def run_schedule(lo, hi, schedule, fold_limb, fold_rows, label):
    peak = max(abs(x) for x in lo + hi)
    for op in schedule:
        if op == "C":
            lo, hi = carry_bounds(lo, hi)
        elif op == "F":
            lo, hi, p2 = fold_bounds(lo, hi, fold_limb, fold_rows)
            peak = max(peak, p2)
        peak = max(peak, max(abs(x) for x in lo + hi))
    ok = peak <= I32
    final_max = max(max(abs(l), abs(h)) for l, h in zip(lo, hi))
    # all rows >= STORE must be provably zero-able: check hi rows bound
    tail = lo[STORE:], hi[STORE:]
    tail_ok = all(l == 0 and h == 0 for l, h in zip(*tail)) if len(lo) > STORE else True
    print(f"{label}: rows={len(lo)} peak=2^{np.log2(peak):.1f} "
          f"ok={ok} final_row_max=2^{np.log2(max(final_max,1)):.2f} "
          f"tail_zero={tail_ok}")
    return lo, hi, ok


def conv_bounds(alo, ahi, blo, bhi):
    n, m = len(alo), len(blo)
    olo = [0] * (n + m - 1)
    ohi = [0] * (n + m - 1)
    for i in range(n):
        for j in range(m):
            prods = [alo[i] * blo[j], alo[i] * bhi[j],
                     ahi[i] * blo[j], ahi[i] * bhi[j]]
            olo[i + j] += min(prods)
            ohi[i + j] += max(prods)
    return olo, ohi


def bal(width, mag):
    return [-mag] * width, [mag] * width


print("=== FP (2^255-19), fold limb 22, const rows", FP_FOLD, "===")
# worst input: conv of two values with rows up to +-2^12.2 (sums of two
# reduced outputs whose rows are +-(2^11+1) -> +- 2^12+2)
in_lo, in_hi = bal(STORE, 2 * (2**11 + 2))   # sum-of-two-reduced, generous
clo, chi = conv_bounds(in_lo, in_hi, in_lo, in_hi)
print("conv rows peak = 2^%.1f" % np.log2(max(abs(x) for x in clo + chi)))

print("\n-- current schedule C C F C C F C C F C C F C C C --")
run_schedule(clo, chi, ["C","C","F","C","C","F","C","C","F","C","C","F","C","C","C"],
             FP_FOLD_LIMB, FP_FOLD, "current")

print("\n-- candidate CCF F C F C C --")
run_schedule(clo, chi, ["C","C","F","F","C","F","C","C"],
             FP_FOLD_LIMB, FP_FOLD, "cand1")

print("\n-- candidate CCF C F C C --")
run_schedule(clo, chi, ["C","C","F","C","F","C","C"],
             FP_FOLD_LIMB, FP_FOLD, "cand2")

print("\n-- candidate C F C F C C  (single carry first) --")
run_schedule(clo, chi, ["C","F","C","F","C","C"],
             FP_FOLD_LIMB, FP_FOLD, "cand3")

print("\n-- candidate C F F C C --")
run_schedule(clo, chi, ["C","F","F","C","C"],
             FP_FOLD_LIMB, FP_FOLD, "cand4")

print("\n=== FQ (L), fold limb 21, const rows len", len(FQ_FOLD), "===")
clo, chi = conv_bounds(in_lo, in_hi, in_lo, in_hi)
run_schedule(clo, chi, ["C","C","F","C","C","F","C","C","F","C","C","F","C","C","C"],
             FQ_FOLD_LIMB, FQ_FOLD, "current")
run_schedule(clo, chi, ["C","C","F","C","F","C","C"],
             FQ_FOLD_LIMB, FQ_FOLD, "cand2")
run_schedule(clo, chi, ["C","F","C","F","C","C"],
             FQ_FOLD_LIMB, FQ_FOLD, "cand3")
