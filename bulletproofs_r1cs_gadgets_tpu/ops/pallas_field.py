"""Pallas TPU kernels for limb-field arithmetic (the speed-of-light path).

Why Pallas here (measured on this TPU): Mosaic compiles these kernels in
seconds-to-minutes where XLA takes minutes-to-hours for equivalent graphs,
and keeps every intermediate in VMEM - the XLA path materialises the
(B, 23, 23) product tensor through HBM and runs ~20 M muls/s; these kernels
reach 0.6-2.4 G muls/s.

Layout: *limb-major stacked* - a batch of N field elements is a
``(STORE, 8, N/8)`` int32 array (limbs on the leading axis, batch spread
over a full 8-sublane x lanes vreg footprint).  The emit_* helpers operate
on whole stacked arrays (ONE jnp op per limb-parallel step), which keeps
traced-op counts ~15x smaller than per-limb-row code - tracing and Mosaic
compile time scale with op count, and on this backend that is the dominant
cold-start cost.

The math is identical to :mod:`.field` (balanced 12-bit limbs, limb-aligned
folds): mod L folds at 2^252 == -c, mod P at 2^264 == 19*2^9.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import P, L
from .field import LIMB_BITS, RADIX, HALF, STORE, int_to_limbs

_FQ_FOLD_LIMB = 21
_FQ_FOLD = -(L - (1 << 252))
_FP_FOLD_LIMB = 22
_FP_FOLD = 19 << 9


def _fold_const_rows(value: int) -> list[int]:
    sign = -1 if value < 0 else 1
    mags = int_to_limbs(abs(value), STORE)
    nz = int(np.max(np.nonzero(mags)[0])) + 1 if np.any(mags) else 1
    return [sign * int(mags[i]) for i in range(nz)]


_FOLDS = {
    "fq": (_FQ_FOLD_LIMB, _fold_const_rows(_FQ_FOLD)),
    "fp": (_FP_FOLD_LIMB, _fold_const_rows(_FP_FOLD)),
}


# -------------------------------------------------------- in-kernel emitters
# Values are stacked arrays of shape (nlimbs, ...) - typically
# (nlimbs, 8, LAN) inside kernels.  All helpers are pure jnp and also work
# outside Pallas (used by tests via interpret-free CPU paths).

def _zeros_like_rows(x, nrows):
    return jnp.zeros((nrows,) + x.shape[1:], dtype=x.dtype)


def _pad_rows(x, lo, hi):
    """Pad `lo` zero-rows below and `hi` above along the limb axis."""
    pads = [(lo, hi)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads)


def emit_add(a, b):
    n = max(a.shape[0], b.shape[0])
    return _pad_rows(a, 0, n - a.shape[0]) + _pad_rows(b, 0, n - b.shape[0])


def emit_sub(a, b):
    n = max(a.shape[0], b.shape[0])
    return _pad_rows(a, 0, n - a.shape[0]) - _pad_rows(b, 0, n - b.shape[0])


def emit_carry(x):
    """One balanced carry round (extends the limb axis by one)."""
    carry = (x + HALF) >> LIMB_BITS
    rem = x - (carry << LIMB_BITS)
    return _pad_rows(rem, 0, 1) + _pad_rows(carry, 1, 0)


def emit_conv(a, b):
    """Limb convolution via shifted multiply-accumulate: len(a) fused ops."""
    n, m = a.shape[0], b.shape[0]
    out_len = n + m - 1
    acc = None
    for i in range(n):
        term = a[i : i + 1] * b  # (m, ...)
        term = _pad_rows(term, i, out_len - m - i)
        acc = term if acc is None else acc + term
    return acc


def emit_scale_const(a, k: int):
    return a * jnp.int32(k)


def _emit_fold_once(x, fold_limb: int, fold_rows: list[int]):
    lo = x[:fold_limb]
    hi = x[fold_limb:]
    acc = None
    for j, c in enumerate(fold_rows):
        term = hi * jnp.int32(c)
        term = _pad_rows(term, j, len(fold_rows) - 1 - j)
        acc = term if acc is None else acc + term
    width = max(STORE, acc.shape[0], fold_limb)
    return _pad_rows(lo, 0, width - lo.shape[0]) + _pad_rows(
        acc, 0, width - acc.shape[0]
    )


# Lean carry/fold schedules (C = balanced carry round, F = fold-all-high).
# Proven safe in tests/test_reduce_schedules.py (interval arithmetic: every
# intermediate row < 2^31 for conv inputs with rows <= +-4100, i.e. sums of
# two reduced outputs; plus randomized int64 simulation: tail rows beyond
# STORE are exactly zero at slice time, congruence holds, outputs are
# balanced to +-(2^11+8) worst-case).  The value-level
# tail argument matches the old loop's: the last fold leaves
# |value| < radix^fold_limb * (1 + eps), so after two trailing carries the
# row at fold_limb is O(1) and no carry ever reaches row STORE.
# fp's 2-row fold constant needs one fold less than fq's 11-row constant.
_SCHEDULES = {
    "fp": {"long": "CFCFCC", "short": "CFCC"},
    "fq": {"long": "CCFCFCFCC", "short": "CFCC"},
}


def emit_reduce(x, field: str):
    """Limb stack (<= 2*STORE rows; conv output or short sum) -> STORE
    balanced limbs, |row| <= 2^11+8.  Input row bounds: +-2^29 for long
    (conv of two sums-of-reduced, or a x2-scaled conv), +-2^15 for short."""
    fold_limb, fold_rows = _FOLDS[field]
    assert x.shape[0] <= 2 * STORE, "reduce input exceeds validated length"
    seq = _SCHEDULES[field]["long" if x.shape[0] > STORE else "short"]
    for op in seq:
        if op == "C":
            x = emit_carry(x)
        else:
            x = _emit_fold_once(x, fold_limb, fold_rows)
    return x[:STORE]


def emit_mul(a, b, field: str):
    return emit_reduce(emit_conv(a, b), field)


def emit_mul_const(a, const_rows: list[int], field: str):
    """Multiply by a small constant given as limb ints (no captured arrays -
    Pallas kernels cannot close over device constants)."""
    acc = None
    for j, c in enumerate(const_rows):
        term = _pad_rows(a * jnp.int32(c), j, len(const_rows) - 1 - j)
        acc = term if acc is None else acc + term
    return emit_reduce(acc, field)


def emit_square(a, field: str):
    return emit_mul(a, a, field)


# --------------------------------------------------------- standalone kernels
BLOCK_LAN = 256  # lanes per grid step for the field kernels


def _mul_kernel(field):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = emit_mul(a_ref[...], b_ref[...], field)

    return kernel


def _make_mul(field: str):
    kern = _mul_kernel(field)

    @jax.jit
    def mul(a, b):
        # a, b: (STORE, 8, LAN) stacked limb arrays
        lan = a.shape[-1]
        if lan <= BLOCK_LAN:
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)
        assert lan % BLOCK_LAN == 0
        spec = pl.BlockSpec((STORE, 8, BLOCK_LAN), lambda i: (0, 0, i))
        return pl.pallas_call(
            kern,
            grid=(lan // BLOCK_LAN,),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

    return mul


mul_fq = _make_mul("fq")
mul_fp = _make_mul("fp")


def to_limb_major(x: jnp.ndarray) -> jnp.ndarray:
    """(N, STORE) -> (STORE, 8, N/8) stacked kernel layout."""
    n = x.shape[0]
    assert n % 8 == 0
    return jnp.moveaxis(x, -1, 0).reshape(STORE, 8, n // 8)


def from_limb_major(x: jnp.ndarray) -> jnp.ndarray:
    """(STORE, 8, N/8) -> (N, STORE)."""
    n = x.shape[1] * x.shape[2]
    return jnp.moveaxis(x.reshape(STORE, n), 0, -1)
