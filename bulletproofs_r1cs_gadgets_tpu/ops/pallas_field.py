"""Pallas TPU kernels for limb-field arithmetic (the speed-of-light path).

Why Pallas here (measured on this TPU): Mosaic compiles the unrolled
convolution bodies in seconds where XLA takes minutes-to-hours for the same
graphs, and keeps every intermediate in VMEM - the XLA path materialises the
(B, 23, 23) product tensor through HBM and runs ~20 M muls/s; these kernels
avoid that traffic entirely.

Layout: *limb-major* blocks ``(STORE, B)`` - limbs on sublanes (23 -> padded
to 24 by the hardware), batch on the 128-wide lane dimension.  The math is
identical to :mod:`.field` (balanced 12-bit limbs, limb-aligned folds);
``emit_*`` helpers generate the in-kernel op sequence so the same code
serves field kernels, point kernels and the MSM kernel.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import P, L
from .field import LIMB_BITS, RADIX, HALF, STORE, int_to_limbs

# fold parameters (mirrors field.py: FQ folds at limb 21, FP at limb 22)
_FQ_FOLD_LIMB = 21
_FQ_FOLD = -(L - (1 << 252))  # == 2^252 mod L, 11 limbs, negative
_FP_FOLD_LIMB = 22
_FP_FOLD = 19 << 9  # == 2^264 mod P, single limb


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
# Values are Python lists of (B,)-shaped jnp vectors, one per limb -
# fully unrolled so Mosaic sees straight-line vector code.

def emit_load(ref, n: int = STORE):
    return [ref[i, :] for i in range(n)]


def emit_store(ref, rows):
    for i, r in enumerate(rows):
        ref[i, :] = r


def emit_add(a, b):
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        x = a[i] if i < len(a) else None
        y = b[i] if i < len(b) else None
        out.append(x + y if (x is not None and y is not None) else (x if x is not None else y))
    return out


def emit_sub(a, b):
    out = []
    for i in range(max(len(a), len(b))):
        x = a[i] if i < len(a) else None
        y = b[i] if i < len(b) else None
        if x is None:
            out.append(-y)
        elif y is None:
            out.append(x)
        else:
            out.append(x - y)
    return out


def emit_carry(rows):
    """One balanced carry round (extends by one limb)."""
    out = []
    carry = None
    for r in rows:
        t = r if carry is None else r + carry
        c = (t + HALF) >> LIMB_BITS
        out.append(t - (c << LIMB_BITS))
        carry = c
    out.append(carry)
    return out


def emit_conv(a, b):
    """Schoolbook limb convolution (exact in int32 for balanced inputs)."""
    n, m = len(a), len(b)
    out = [None] * (n + m - 1)
    for i in range(n):
        for j in range(m):
            t = a[i] * b[j]
            out[i + j] = t if out[i + j] is None else out[i + j] + t
    return out


def emit_scale_const(a, k: int):
    return [r * k for r in a]


def _emit_fold_once(rows, fold_limb: int, fold_rows: list[int]):
    lo = rows[:fold_limb]
    hi = rows[fold_limb:]
    # prod = conv(hi, fold_const)
    prod = [None] * (len(hi) + len(fold_rows) - 1)
    for i, h in enumerate(hi):
        for j, c in enumerate(fold_rows):
            t = h * c
            prod[i + j] = t if prod[i + j] is None else prod[i + j] + t
    width = max(STORE, len(prod), len(lo))
    out = []
    for i in range(width):
        x = lo[i] if i < len(lo) else None
        y = prod[i] if i < len(prod) else None
        if x is None and y is None:
            out.append(jnp.zeros_like(rows[0]))
        elif x is None:
            out.append(y)
        elif y is None:
            out.append(x)
        else:
            out.append(x + y)
    return out


def emit_reduce(rows, field: str):
    """Arbitrary-length limb rows -> STORE balanced limbs (same scheme and
    bounds as field.LimbField._reduce)."""
    fold_limb, fold_rows = _FOLDS[field]
    x = rows
    while len(x) > STORE:
        x = emit_carry(emit_carry(x))
        x = _emit_fold_once(x, fold_limb, fold_rows)
    for _ in range(2):
        x = emit_carry(emit_carry(x))
        x = _emit_fold_once(x, fold_limb, fold_rows)
    x = emit_carry(emit_carry(emit_carry(x)))
    return x[:STORE]


def emit_mul(a, b, field: str):
    return emit_reduce(emit_conv(a, b), field)


def emit_square(a, field: str):
    return emit_mul(a, a, field)


# --------------------------------------------------------- standalone kernels
def _mul_kernel(field):
    def kernel(a_ref, b_ref, o_ref):
        emit_store(o_ref, emit_mul(emit_load(a_ref), emit_load(b_ref), field))

    return kernel


BLOCK_B = 512  # lanes per grid step (VMEM: ~50 KB per (23, 512) operand)


def _make_mul(field: str):
    kern = _mul_kernel(field)

    @jax.jit
    def mul(a, b):
        # a, b: (STORE, B); grid over the lane dim in BLOCK_B columns
        B = a.shape[-1]
        if B <= BLOCK_B:
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)
        assert B % BLOCK_B == 0, "batch must be a multiple of BLOCK_B"
        spec = pl.BlockSpec((STORE, BLOCK_B), lambda i: (0, i))
        return pl.pallas_call(
            kern,
            grid=(B // BLOCK_B,),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

    return mul


mul_fq = _make_mul("fq")
mul_fp = _make_mul("fp")


def to_limb_major(x: jnp.ndarray) -> jnp.ndarray:
    """(..., STORE) -> (STORE, ...) for kernel consumption."""
    return jnp.moveaxis(x, -1, 0)


def from_limb_major(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, 0, -1)
