"""Pallas TPU kernels for Edwards point arithmetic, MSM and IPP folds.

Layout: a batch of N points is a ``(92, 8, N/8)`` int32 array - 4 extended
coordinates x 23 limbs indexed on the leading axis, batch spread over a
full (8, 128k) vreg footprint (8 sublanes x N/8 lanes).  Every in-kernel
limb "row" is a 2-D (8, LAN) tile, so each vector op moves 8x more data
than a flat (N,) layout - on this hardware per-op overhead dominates small
vectors, and this layout is the difference between ~5 us and sub-us per
point operation.

Kernels:
* ``padd`` / ``pdbl`` - pointwise group ops (host-driven reductions).
* ``msm_lanes`` - windowed (4-bit *signed* digits, 8-entry table in VMEM
  scratch + on-the-fly negation) double-and-add over all 64 windows; one
  grid step per 2048-point block, one dispatch per MSM chunk.
* ``fold_chunk`` - the IPP generator fold u_inv*L + u*R (per-lane bits).

All group math reuses the emit_* helpers from :mod:`.pallas_field`; the
XLA compositions in :mod:`.curve`/:mod:`.msm` remain the CPU-testable
oracle.  Mosaic compiles these in seconds where the XLA equivalents take
minutes-to-hours on this backend's remote-compile path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import P, D
from .field import STORE, int_to_limbs
from . import pallas_field as pf

COORDS = 4
ROWS = COORDS * STORE  # 92
SUB = 8  # sublanes per row tile
LAN_BLOCK = 256  # lanes per grid step
BLOCK_PTS = SUB * LAN_BLOCK  # 2048 points per block
WINDOW = 4
NWINDOWS = 64
TABLE = 8  # signed digits in [-8, 8): table holds k*P for k = 1..8

_D2_LIMBS = [int(x) for x in int_to_limbs((2 * D) % P)]


# ------------------------------------------------------- in-kernel point ops
def _load_point(ref):
    return tuple(
        [ref[c * STORE + i] for i in range(STORE)] for c in range(4)
    )


def _store_point(ref, p):
    for c in range(4):
        for i in range(STORE):
            ref[c * STORE + i] = p[c][i]


def _point_rows(p):
    return [r for coord in p for r in coord]


def emit_point_add(p, q):
    """Unified add-2008-hwcd-3 (a = -1); 8 muls.  Mirrors
    core.ristretto.RistrettoPoint.__add__."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    d2 = [jnp.full_like(X1[0], c) for c in _D2_LIMBS]
    A = pf.emit_mul(pf.emit_sub(Y1, X1), pf.emit_sub(Y2, X2), "fp")
    B = pf.emit_mul(pf.emit_add(Y1, X1), pf.emit_add(Y2, X2), "fp")
    C = pf.emit_mul(pf.emit_reduce(pf.emit_conv(T1, T2), "fp"), d2, "fp")
    Dv = pf.emit_reduce(pf.emit_scale_const(pf.emit_conv(Z1, Z2), 2), "fp")
    E = pf.emit_sub(B, A)
    F = pf.emit_sub(Dv, C)
    G = pf.emit_add(Dv, C)
    H = pf.emit_add(B, A)
    return (
        pf.emit_mul(E, F, "fp"),
        pf.emit_mul(G, H, "fp"),
        pf.emit_mul(F, G, "fp"),
        pf.emit_mul(E, H, "fp"),
    )


def emit_point_double(p):
    """dbl-2008-hwcd (a = -1); 7 muls."""
    X1, Y1, Z1, _ = p
    A = pf.emit_square(X1, "fp")
    B = pf.emit_square(Y1, "fp")
    C = pf.emit_reduce(pf.emit_scale_const(pf.emit_conv(Z1, Z1), 2), "fp")
    H = pf.emit_add(A, B)
    E = pf.emit_sub(H, pf.emit_square(pf.emit_add(X1, Y1), "fp"))
    G = pf.emit_sub(A, B)
    F = pf.emit_add(C, G)
    return (
        pf.emit_mul(E, F, "fp"),
        pf.emit_mul(G, H, "fp"),
        pf.emit_mul(F, G, "fp"),
        pf.emit_mul(E, H, "fp"),
    )


def emit_point_select(mask, p, q):
    return tuple(
        [jnp.where(mask, a, b) for a, b in zip(pc, qc)]
        for pc, qc in zip(p, q)
    )


def emit_point_neg(p):
    X, Y, Z, T = p
    return ([-r for r in X], Y, Z, [-r for r in T])


def _identity_rows(template):
    zero = jnp.zeros_like(template)
    one = jnp.ones_like(template)
    return (
        [zero] * STORE,
        [one] + [zero] * (STORE - 1),
        [one] + [zero] * (STORE - 1),
        [zero] * STORE,
    )


# ---------------------------------------------------------- basic kernels
def _padd_kernel(p_ref, q_ref, o_ref):
    _store_point(o_ref, emit_point_add(_load_point(p_ref), _load_point(q_ref)))


def _pdbl_kernel(p_ref, o_ref):
    _store_point(o_ref, emit_point_double(_load_point(p_ref)))


def _specs(n_in: int, lan: int):
    spec = pl.BlockSpec((ROWS, SUB, LAN_BLOCK), lambda i: (0, 0, i))
    return dict(
        grid=(lan // LAN_BLOCK,),
        in_specs=[spec] * n_in,
        out_specs=spec,
    )


@jax.jit
def padd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(92, 8, LAN) x2 -> (92, 8, LAN) pointwise group add."""
    lan = a.shape[-1]
    assert lan % LAN_BLOCK == 0
    return pl.pallas_call(
        _padd_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        **_specs(2, lan),
    )(a, b)


@jax.jit
def pdbl(a: jnp.ndarray) -> jnp.ndarray:
    lan = a.shape[-1]
    assert lan % LAN_BLOCK == 0
    return pl.pallas_call(
        _pdbl_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        **_specs(1, lan),
    )(a)


# --------------------------------------------------------------- MSM kernel
def _msm_kernel(points_ref, digits_ref, o_ref, table_ref):
    """One grid step: BLOCK_PTS points, 64 signed windows.

    points_ref: (92, SUB, LAN); digits_ref: (64, SUB, LAN) signed in [-8, 8];
    o_ref: (92, SUB, LAN) per-point accumulators; table_ref: VMEM scratch
    (8 * 92, SUB, LAN) holding k*P for k = 1..8.
    """
    pts = _load_point(points_ref)
    _store_point(table_ref, pts)

    def build_body(k, carry):
        nxt = emit_point_add(carry, pts)
        rows = _point_rows(nxt)
        for j in range(ROWS):
            table_ref[pl.ds(k * ROWS + j, 1)] = rows[j][None]
        return nxt

    lax.fori_loop(1, TABLE, build_body, pts, unroll=False)

    ident = _identity_rows(pts[0][0])

    def dbl_body(_, acc):
        return emit_point_double(acc)

    def window_body(w, acc):
        acc = lax.fori_loop(0, WINDOW, dbl_body, acc, unroll=False)
        d = digits_ref[NWINDOWS - 1 - w]
        mag = jnp.abs(d)
        sel = ident
        for k in range(TABLE):
            entry = tuple(
                [table_ref[k * ROWS + c * STORE + i] for i in range(STORE)]
                for c in range(4)
            )
            sel = emit_point_select(mag == (k + 1), entry, sel)
        sel = emit_point_select(d < 0, emit_point_neg(sel), sel)
        return emit_point_add(acc, sel)

    acc = lax.fori_loop(0, NWINDOWS, window_body, ident, unroll=False)
    _store_point(o_ref, acc)


def msm_lanes(points: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
    """points (92, 8, LAN), signed digits (64, 8, LAN) -> per-point
    accumulators (92, 8, LAN) (position i holds scalar_i * P_i)."""
    lan = points.shape[-1]
    assert lan % LAN_BLOCK == 0
    pspec = pl.BlockSpec((ROWS, SUB, LAN_BLOCK), lambda i: (0, 0, i))
    dspec = pl.BlockSpec((NWINDOWS, SUB, LAN_BLOCK), lambda i: (0, 0, i))
    return pl.pallas_call(
        _msm_kernel,
        grid=(lan // LAN_BLOCK,),
        out_shape=jax.ShapeDtypeStruct(points.shape, jnp.int32),
        in_specs=[pspec, dspec],
        out_specs=pspec,
        scratch_shapes=[pltpu.VMEM((TABLE * ROWS, SUB, LAN_BLOCK), jnp.int32)],
    )(points, digits)


# ------------------------------------------------------- scalar-mul kernel
def _smul_kernel(p_ref, bits_ref, o_ref):
    """Per-lane scalar mult: o_i = scalar_i * P_i, bit-serial double-and-add
    (253 fori iterations; bodies stay loop-resident, which this backend
    rewards - see the fold kernel benchmark notes)."""
    pts = _load_point(p_ref)
    ident = _identity_rows(pts[0][0])

    def body(i, acc):
        acc = emit_point_double(acc)
        bit = bits_ref[252 - i] > 0
        sel = emit_point_select(bit, pts, ident)
        return emit_point_add(acc, sel)

    acc = lax.fori_loop(0, 253, body, ident, unroll=False)
    _store_point(o_ref, acc)


@jax.jit
def smul_lanes(points: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """points (92, 8, LAN), bits (256, 8, LAN) LSB-first -> per-lane
    scalar_i * P_i accumulators (92, 8, LAN).  One dispatch per MSM."""
    lan = points.shape[-1]
    assert lan % LAN_BLOCK == 0
    pspec = pl.BlockSpec((ROWS, SUB, LAN_BLOCK), lambda i: (0, 0, i))
    bspec = pl.BlockSpec((256, SUB, LAN_BLOCK), lambda i: (0, 0, i))
    return pl.pallas_call(
        _smul_kernel,
        grid=(lan // LAN_BLOCK,),
        out_shape=jax.ShapeDtypeStruct(points.shape, jnp.int32),
        in_specs=[pspec, bspec],
        out_specs=pspec,
    )(points, bits)


def bits_matrix(scalars: list[int]) -> np.ndarray:
    """(N, 256) LSB-first bit matrix (vectorised via unpackbits)."""
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    return np.unpackbits(
        np.frombuffer(buf, np.uint8).reshape(len(scalars), 32),
        axis=1,
        bitorder="little",
    ).astype(np.int32)


# ------------------------------------------------------------- fold kernel
def _fold_kernel(l_ref, r_ref, bl_ref, br_ref, o_ref):
    """Per-lane double-and-add: o_i = bits_l_i * L_i + bits_r_i * R_i."""
    left = _load_point(l_ref)
    right = _load_point(r_ref)
    both = emit_point_add(left, right)
    ident = _identity_rows(left[0][0])

    def body(i, acc):
        acc = emit_point_double(acc)
        bl = bl_ref[252 - i] > 0
        br = br_ref[252 - i] > 0
        sel = emit_point_select(
            bl & br,
            both,
            emit_point_select(bl, left, emit_point_select(br, right, ident)),
        )
        return emit_point_add(acc, sel)

    acc = lax.fori_loop(0, 253, body, ident, unroll=False)
    _store_point(o_ref, acc)


@jax.jit
def fold_chunk(left, right, bits_l, bits_r):
    """left/right (92, 8, LAN); bits (256, 8, LAN) LSB-first."""
    lan = left.shape[-1]
    assert lan % LAN_BLOCK == 0
    pspec = pl.BlockSpec((ROWS, SUB, LAN_BLOCK), lambda i: (0, 0, i))
    bspec = pl.BlockSpec((256, SUB, LAN_BLOCK), lambda i: (0, 0, i))
    return pl.pallas_call(
        _fold_kernel,
        grid=(lan // LAN_BLOCK,),
        out_shape=jax.ShapeDtypeStruct(left.shape, jnp.int32),
        in_specs=[pspec, pspec, bspec, bspec],
        out_specs=pspec,
    )(left, right, bits_l, bits_r)


# ------------------------------------------------------------ host helpers
def identity_rows_array(npts: int) -> jnp.ndarray:
    assert npts % SUB == 0
    out = np.zeros((ROWS, SUB, npts // SUB), dtype=np.int32)
    out[STORE] = 1  # Y limb 0
    out[2 * STORE] = 1  # Z limb 0
    return jnp.asarray(out)


def points_to_rows(arr) -> jnp.ndarray:
    """(N, 4, STORE) device/np array -> (92, 8, N/8); N % 8 == 0."""
    n = arr.shape[0]
    assert n % SUB == 0
    flat = jnp.moveaxis(jnp.asarray(arr).reshape(n, ROWS), 0, 1)  # (92, N)
    return flat.reshape(ROWS, SUB, n // SUB)


def rows_to_points(rows: jnp.ndarray) -> jnp.ndarray:
    """(92, 8, N/8) -> (N, 4, STORE)."""
    n = rows.shape[1] * rows.shape[2]
    return jnp.moveaxis(rows.reshape(ROWS, n), 1, 0).reshape(n, 4, STORE)


def _ident_flat(npts: int) -> jnp.ndarray:
    out = np.zeros((ROWS, npts), dtype=np.int32)
    out[STORE] = 1
    out[2 * STORE] = 1
    return jnp.asarray(out)


def reduce_lanes(rows: jnp.ndarray) -> jnp.ndarray:
    """Per-point values -> group total in position 0.

    Halving padd chain over the flattened point axis; below one block the
    halves are padded with identities so the kernel keeps a single
    compiled shape.  Returns (92, 8, LAN_BLOCK); the total is at
    ``[:, 0, 0]`` (i.e. flat point 0).
    """
    flat = rows.reshape(ROWS, -1)
    n = flat.shape[-1]
    pow2 = 1 if n <= 1 else 1 << (n - 1).bit_length()
    if pow2 != n:
        flat = jnp.concatenate([flat, _ident_flat(pow2 - n)], axis=1)
        n = pow2
    while n > BLOCK_PTS:
        half = n // 2
        out = padd(
            flat[:, :half].reshape(ROWS, SUB, half // SUB),
            flat[:, half:].reshape(ROWS, SUB, half // SUB),
        )
        flat = out.reshape(ROWS, half)
        n = half
    while n > 1:
        half = n // 2
        left = jnp.concatenate(
            [flat[:, :half], _ident_flat(BLOCK_PTS - half)], axis=1
        ).reshape(ROWS, SUB, LAN_BLOCK)
        right = jnp.concatenate(
            [flat[:, half:n], _ident_flat(BLOCK_PTS - (n - half))], axis=1
        ).reshape(ROWS, SUB, LAN_BLOCK)
        out = padd(left, right)
        flat = out.reshape(ROWS, BLOCK_PTS)[:, :half]
        n = half
    return _refit(flat)


def _refit(flat: jnp.ndarray) -> jnp.ndarray:
    """Pad a (92, n<=BLOCK_PTS) flat result back to one (92, 8, 256) block."""
    n = flat.shape[-1]
    if n < BLOCK_PTS:
        flat = jnp.concatenate([flat, _ident_flat(BLOCK_PTS - n)], axis=1)
    return flat.reshape(ROWS, SUB, LAN_BLOCK)


def signed_digits(scalars: list[int]) -> np.ndarray:
    """(N, 64) signed 4-bit windows in [-8, 8) (top window carries the
    slack; scalars < 2^253 keep it in range)."""
    n = len(scalars)
    out = np.zeros((n, NWINDOWS), dtype=np.int32)
    for i, s in enumerate(scalars):
        v = s
        for w in range(NWINDOWS):
            d = v & 15
            v >>= 4
            if d >= 8:
                d -= 16
                v += 1
            out[i, w] = d
        assert v == 0, "scalar overflow in signed recoding"
    return out


def digits_to_rows(digits: np.ndarray) -> jnp.ndarray:
    """(N, 64) -> (64, 8, N/8) matching points_to_rows ordering."""
    n = digits.shape[0]
    assert n % SUB == 0
    return jnp.asarray(
        np.moveaxis(digits, 0, 1).reshape(NWINDOWS, SUB, n // SUB)
    )


def bits_to_rows(bits: np.ndarray) -> jnp.ndarray:
    """(N, 256) -> (256, 8, N/8)."""
    n = bits.shape[0]
    assert n % SUB == 0
    return jnp.asarray(np.moveaxis(bits, 0, 1).reshape(256, SUB, n // SUB))
