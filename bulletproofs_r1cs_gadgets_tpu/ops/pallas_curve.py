"""Pallas TPU kernels for Edwards point arithmetic, MSM and IPP folds.

Layout: a batch of N points is a ``(92, 8, N/8)`` int32 array - 4 extended
coordinates x 23 limbs *stacked* on the leading axis, batch spread over a
full (8 sublanes x N/8 lanes) vreg footprint.  Each coordinate is handled
as ONE stacked (23, 8, LAN) array (see :mod:`.pallas_field`), so the traced
op count per point operation is ~1k instead of ~15k - tracing and Mosaic
compile time scale with op count and dominate cold starts on this backend.

Kernels:
* ``padd`` / ``pdbl`` - pointwise group ops.
* ``msm_block_totals`` - bit-serial per-lane scalar ladders over packed
  scalar words (8 x int32 per point) + in-kernel rotate-and-add block
  reduction; ONE dispatch per MSM, per-block totals summed on host.
* ``smul_lanes`` - the same ladder without the reduction (per-lane results).
* ``fold_chunk`` - the IPP generator fold s_l*L + s_r*R (per-lane packed
  scalars; also used to fold both generator vectors in one dispatch).

Scheduling notes (measured): dispatch overhead ~3 ms; loop bodies run from
i-cache at ~1.3 ns/instruction; dynamic sublane indexing costs ~2 us per
access (hence packed words: 8 dynamic reads per 32 ladder steps).
The earlier windowed-table MSM variant (VMEM scratch table + dynamic
stores) hit a ~1000x runtime pathology and was dropped in favour of the
bit-serial ladder (1.6x more point-ops, runs at hardware speed); see git
history for the kernel.
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
SUB = 8
LAN_BLOCK = 256  # lanes per grid step
BLOCK_PTS = SUB * LAN_BLOCK  # 2048 points per block

_D2_ROWS = pf._fold_const_rows((2 * D) % P)  # python ints: kernel-safe


# ------------------------------------------------------- in-kernel point ops
def _load_point(ref):
    return tuple(ref[c * STORE : (c + 1) * STORE] for c in range(4))


def _store_point(ref, p):
    for c in range(4):
        ref[c * STORE : (c + 1) * STORE] = p[c]


def emit_point_add(p, q):
    """Unified add-2008-hwcd-3 (a = -1); 8 muls.  Mirrors
    core.ristretto.RistrettoPoint.__add__."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = pf.emit_mul(Y1 - X1, Y2 - X2, "fp")
    B = pf.emit_mul(Y1 + X1, Y2 + X2, "fp")
    C = pf.emit_mul_const(
        pf.emit_reduce(pf.emit_conv(T1, T2), "fp"), _D2_ROWS, "fp"
    )
    Dv = pf.emit_reduce(pf.emit_scale_const(pf.emit_conv(Z1, Z2), 2), "fp")
    E = B - A
    F = Dv - C
    G = Dv + C
    H = B + A
    return (
        pf.emit_mul(E, F, "fp"),
        pf.emit_mul(G, H, "fp"),
        pf.emit_mul(F, G, "fp"),
        pf.emit_mul(E, H, "fp"),
    )


def emit_point_double(p):
    """dbl-2008-hwcd (a = -1); 7 muls.  Ignores T1, so it accepts 3-tuple
    (X, Y, Z) inputs as well."""
    X1, Y1, Z1 = p[0], p[1], p[2]
    A = pf.emit_square(X1, "fp")
    B = pf.emit_square(Y1, "fp")
    C = pf.emit_reduce(pf.emit_scale_const(pf.emit_conv(Z1, Z1), 2), "fp")
    H = A + B
    E = H - pf.emit_square(X1 + Y1, "fp")
    G = A - B
    F = C + G
    return (
        pf.emit_mul(E, F, "fp"),
        pf.emit_mul(G, H, "fp"),
        pf.emit_mul(F, G, "fp"),
        pf.emit_mul(E, H, "fp"),
    )


# T-coordinate elision: dbl-2008-hwcd never READS T, and add-2008-hwcd-3
# reads both inputs' T but its T output is only needed when the result
# feeds another add.  In a windowed ladder (4 dbl + 1 table add per
# window) only the last doubling before an add must produce T, and the
# add itself can skip T because its output goes straight into the next
# window's doublings: 32 muls/window instead of 36.
def emit_point_double_xyz(p):
    """Doubling that skips the T output (6 muls): for results that feed
    only further doublings.  Accepts 3- or 4-tuples."""
    X1, Y1, Z1 = p[0], p[1], p[2]
    A = pf.emit_square(X1, "fp")
    B = pf.emit_square(Y1, "fp")
    C = pf.emit_reduce(pf.emit_scale_const(pf.emit_conv(Z1, Z1), 2), "fp")
    H = A + B
    E = H - pf.emit_square(X1 + Y1, "fp")
    G = A - B
    F = C + G
    return (
        pf.emit_mul(E, F, "fp"),
        pf.emit_mul(G, H, "fp"),
        pf.emit_mul(F, G, "fp"),
    )


def emit_point_add_xyz(p, q):
    """Unified add that skips the T output (7 muls): for results that feed
    only doublings.  Both inputs still need valid T coordinates."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = pf.emit_mul(Y1 - X1, Y2 - X2, "fp")
    B = pf.emit_mul(Y1 + X1, Y2 + X2, "fp")
    C = pf.emit_mul_const(
        pf.emit_reduce(pf.emit_conv(T1, T2), "fp"), _D2_ROWS, "fp"
    )
    Dv = pf.emit_reduce(pf.emit_scale_const(pf.emit_conv(Z1, Z2), 2), "fp")
    E = B - A
    F = Dv - C
    G = Dv + C
    H = B + A
    return (
        pf.emit_mul(E, F, "fp"),
        pf.emit_mul(G, H, "fp"),
        pf.emit_mul(F, G, "fp"),
    )


def emit_point_select(mask, p, q):
    """Per-lane select: mask is (SUB, LAN); broadcasts over the limb axis."""
    m = mask[None]
    return tuple(jnp.where(m, pc, qc) for pc, qc in zip(p, q))


def _identity_point(template):
    """Identity (0, 1, 1, 0) as stacked coords matching `template`'s shape."""
    zero = jnp.zeros_like(template)
    row0 = lax.broadcasted_iota(jnp.int32, template.shape, 0) == 0
    one0 = jnp.where(row0, jnp.int32(1), jnp.int32(0))
    return (zero, one0, one0, zero)


# ---------------------------------------------------------- basic kernels
def _padd_kernel(p_ref, q_ref, o_ref):
    _store_point(o_ref, emit_point_add(_load_point(p_ref), _load_point(q_ref)))


def _pdbl_kernel(p_ref, o_ref):
    _store_point(o_ref, emit_point_double(_load_point(p_ref)))


def _pspec():
    return pl.BlockSpec((ROWS, SUB, LAN_BLOCK), lambda i: (0, 0, i))


@jax.jit
def padd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(92, 8, LAN) x2 -> (92, 8, LAN) pointwise group add."""
    lan = a.shape[-1]
    assert lan % LAN_BLOCK == 0
    return pl.pallas_call(
        _padd_kernel,
        grid=(lan // LAN_BLOCK,),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        in_specs=[_pspec(), _pspec()],
        out_specs=_pspec(),
    )(a, b)


@jax.jit
def pdbl(a: jnp.ndarray) -> jnp.ndarray:
    lan = a.shape[-1]
    assert lan % LAN_BLOCK == 0
    return pl.pallas_call(
        _pdbl_kernel,
        grid=(lan // LAN_BLOCK,),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        in_specs=[_pspec()],
        out_specs=_pspec(),
    )(a)


# ------------------------------------------------------- scalar-mul kernels
def emit_block_reduce(acc):
    """Rotate-and-add so every lattice position holds the block total:
    log2(LAN) lane rounds + log2(SUB) sublane rounds."""
    shift = 1
    while shift < LAN_BLOCK:
        rolled = tuple(pltpu.roll(c, shift, 2) for c in acc)
        acc = emit_point_add(acc, rolled)
        shift *= 2
    shift = 1
    while shift < SUB:
        rolled = tuple(pltpu.roll(c, shift, 1) for c in acc)
        acc = emit_point_add(acc, rolled)
        shift *= 2
    return acc


def _ladder(pts, words_ref, with_reduce: bool):
    ident = _identity_point(pts[0])

    def _sel(pos):
        word = words_ref[pos // 32]
        bit = ((word >> (pos % 32)) & 1) > 0
        return emit_point_select(bit, pts, ident)

    # T-elided (14 muls/bit vs 15): the accumulator travels as (X, Y, Z);
    # each doubling feeds an add so it stays full, while the add output
    # only feeds the next doubling.  Final bit runs with a full add.
    def body(i, acc3):
        acc = emit_point_double(acc3)
        return emit_point_add_xyz(acc, _sel(252 - i))

    acc3 = lax.fori_loop(0, 252, body, ident[:3], unroll=False)
    acc = emit_point_add(emit_point_double(acc3), _sel(0))
    return emit_block_reduce(acc) if with_reduce else acc


def _smul_reduce_kernel(p_ref, words_ref, o_ref):
    _store_point(o_ref, _ladder(_load_point(p_ref), words_ref, True))


def _smul_kernel(p_ref, words_ref, o_ref):
    _store_point(o_ref, _ladder(_load_point(p_ref), words_ref, False))


def _wspec():
    return pl.BlockSpec((8, SUB, LAN_BLOCK), lambda i: (0, 0, i))


@jax.jit
def msm_block_totals(points: jnp.ndarray, words: jnp.ndarray) -> jnp.ndarray:
    """One-dispatch MSM: points (92, 8, LAN) x packed words (8, 8, LAN) ->
    (nblocks, 4, STORE) block totals (host sums the handful of blocks)."""
    lan = points.shape[-1]
    assert lan % LAN_BLOCK == 0
    nblocks = lan // LAN_BLOCK
    out = pl.pallas_call(
        _smul_reduce_kernel,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct(points.shape, jnp.int32),
        in_specs=[_pspec(), _wspec()],
        out_specs=_pspec(),
    )(points, words)
    totals = out[:, 0, ::LAN_BLOCK]  # (92, nblocks)
    return jnp.moveaxis(totals, 1, 0).reshape(nblocks, 4, STORE)


def _smul_acc_kernel(p_ref, words_ref, acc_ref, o_ref):
    """One fixed-size chunk of a chained MSM: block-reduced ladder total
    plus the running accumulator.  The block reduction broadcasts the total
    to every lattice position, so the accumulator stays position-uniform
    across calls and any position can be fetched at the end."""
    total = _ladder(_load_point(p_ref), words_ref, True)
    _store_point(o_ref, emit_point_add(total, _load_point(acc_ref)))


@jax.jit
def msm_chunk_acc(
    points: jnp.ndarray, words: jnp.ndarray, acc: jnp.ndarray
) -> jnp.ndarray:
    """Chained fixed-shape MSM chunk: points (92, 8, 256) + packed words
    (8, 8, 256) + acc (92, 8, 256) -> new acc.  ONE compiled shape serves
    every MSM in the engine (per-shape Mosaic compiles cost ~70 s on this
    backend; see ops/chunks.py)."""
    assert points.shape == (ROWS, SUB, LAN_BLOCK)
    return pl.pallas_call(
        _smul_acc_kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct(points.shape, jnp.int32),
        in_specs=[_pspec(), _wspec(), _pspec()],
        out_specs=_pspec(),
    )(points, words, acc)


# ----------------------------------------- signed-digit windowed scalar mul
# 4-bit signed-digit ladder: 64 windows x (4 dbl + 1 table add) + an 8-entry
# in-register multiple table (4 dbl + 3 add to build) = ~340 point-ops per
# lane vs 506 for the bit-serial ladder.  The table is addressed with pure
# lane-wise selects (jnp.where chains) - NO dynamic VMEM stores, which is
# what sank the earlier windowed-table kernel (see module docstring).
# Digits are two's-complement nibbles d in [-8, 7] packed 8-per-int32
# (ops/chunks.py signed_digit recode); nibble 0 selects the identity, so
# zero-padded words stay free.
def emit_point_negate(p, neg):
    """Conditional per-lane negation: (X, Y, Z, T) -> (-X, Y, Z, -T) where
    `neg` (SUB, LAN); balanced limbs negate exactly."""
    X, Y, Z, T = p
    m = neg[None]
    return (jnp.where(m, -X, X), Y, Z, jnp.where(m, -T, T))


def _build_w4_table(pts):
    """Multiple table t[k] = (k+1) * P for k = 0..7 (4 dbl + 3 add)."""
    t2 = emit_point_double(pts)
    t3 = emit_point_add(t2, pts)
    t4 = emit_point_double(t2)
    t5 = emit_point_add(t4, pts)
    t6 = emit_point_double(t3)
    t7 = emit_point_add(t6, pts)
    t8 = emit_point_double(t4)
    return (pts, t2, t3, t4, t5, t6, t7, t8)


def _w4_digit_select(words_ref, pos, table, ident):
    """Signed-nibble digit at `pos` -> d * P via lane-wise selects over the
    multiple table (no dynamic VMEM addressing)."""
    word = words_ref[pos // 8]
    e = (word >> (4 * (pos % 8))) & 15
    neg = e >= 8
    mag = jnp.where(neg, 16 - e, e)  # e=8 -> d=-8 -> mag 8
    sel = ident
    for k in range(1, 9):
        sel = emit_point_select(mag == k, table[k - 1], sel)
    return emit_point_negate(sel, neg)


def _ladder_w4(pts, words_ref, with_reduce: bool):
    ident = _identity_point(pts[0])
    table = _build_w4_table(pts)

    # T-elided body (32 muls/window vs 36): the accumulator travels as
    # (X, Y, Z); only the doubling feeding the table add produces T, and
    # the add itself skips T because its output goes straight into the
    # next window's doublings.  The last window (digit 0) runs outside the
    # loop with a full add so callers get a complete extended point.
    def body(j, acc3):
        for _ in range(3):
            acc3 = emit_point_double_xyz(acc3)
        acc = emit_point_double(acc3)
        sel = _w4_digit_select(words_ref, 63 - j, table, ident)
        return emit_point_add_xyz(acc, sel)

    acc3 = lax.fori_loop(0, 63, body, ident[:3], unroll=False)
    for _ in range(3):
        acc3 = emit_point_double_xyz(acc3)
    acc = emit_point_double(acc3)
    sel = _w4_digit_select(words_ref, 0, table, ident)
    acc = emit_point_add(acc, sel)
    return emit_block_reduce(acc) if with_reduce else acc


def _smul_acc_w4_kernel(p_ref, words_ref, acc_ref, o_ref):
    total = _ladder_w4(_load_point(p_ref), words_ref, True)
    _store_point(o_ref, emit_point_add(total, _load_point(acc_ref)))


@jax.jit
def msm_chunk_acc_w4(
    points: jnp.ndarray, words: jnp.ndarray, acc: jnp.ndarray
) -> jnp.ndarray:
    """Chained MSM chunk with the signed-digit windowed ladder; same
    signature as :func:`msm_chunk_acc` but `words` hold packed
    two's-complement nibble digits (chunks.signed_digit encoding)."""
    assert points.shape == (ROWS, SUB, LAN_BLOCK)
    return pl.pallas_call(
        _smul_acc_w4_kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct(points.shape, jnp.int32),
        in_specs=[_pspec(), _wspec(), _pspec()],
        out_specs=_pspec(),
    )(points, words, acc)


# ------------------------------------------------- fixed-capacity grid MSM
# One dispatch per MSM segment instead of one per 2048-point chunk: the
# grid walks up to GRID_CHUNKS blocks of a capacity-shaped (92, 8, 32768)
# point array, accumulating per-lane partials in VMEM (no per-chunk HBM
# accumulator traffic, no dispatch queue overhead) and block-reducing once
# at the last *valid* step.  The valid-chunk count and a chunk offset ride
# a scalar-prefetch arg so ONE compiled shape serves every segment size:
# index maps clamp to the last valid block, so padded steps re-address the
# same block (no DMA) and `pl.when` skips their compute entirely.
GRID_CHUNKS = 128
GRID_LANES = GRID_CHUNKS * LAN_BLOCK  # 32768 lane columns = 262144 points

def _grid_pspec():
    return pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, info[1] + jnp.minimum(j, info[0] - 1)),
    )


def _grid_wspec():
    return pl.BlockSpec(
        (8, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )


def _grid_fixed_pspec():
    return pl.BlockSpec((ROWS, SUB, LAN_BLOCK), lambda j, info: (0, 0, 0))


def _msm_grid_kernel(info_ref, p_ref, w_ref, acc_ref, o_ref):
    j = pl.program_id(0)
    v = info_ref[0]

    @pl.when(j == 0)
    def _init():
        _store_point(
            o_ref,
            _identity_point(jnp.zeros((STORE, SUB, LAN_BLOCK), jnp.int32)),
        )

    @pl.when(j < v)
    def _step():
        part = _ladder_w4(_load_point(p_ref), w_ref, False)
        _store_point(o_ref, emit_point_add(_load_point(o_ref), part))

    @pl.when(j == v - 1)
    def _final():
        tot = emit_block_reduce(_load_point(o_ref))
        _store_point(o_ref, emit_point_add(tot, _load_point(acc_ref)))


@jax.jit
def msm_grid_acc(
    points: jnp.ndarray, words: jnp.ndarray, acc: jnp.ndarray,
    info: jnp.ndarray,
) -> jnp.ndarray:
    """Single-dispatch MSM over a capacity-shaped point array.

    points (92, 8, GRID_LANES); words (8, 8, GRID_LANES) signed-digit
    encoded; acc (92, 8, 256) position-uniform running accumulator;
    info = int32 [valid_chunks, chunk_offset] (scalar-prefetched).  Lanes
    of chunk c of `words` apply to chunk `offset + c` of `points`; returns
    the new position-uniform accumulator."""
    assert points.shape == (ROWS, SUB, GRID_LANES)
    assert words.shape == (8, SUB, GRID_LANES)
    return pl.pallas_call(
        _msm_grid_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID_CHUNKS,),
            in_specs=[_grid_pspec(), _grid_wspec(), _grid_fixed_pspec()],
            out_specs=_grid_fixed_pspec(),
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, LAN_BLOCK), jnp.int32),
    )(info, points, words, acc)


def _msm_grid_local_call(
    points: jnp.ndarray, words: jnp.ndarray, acc: jnp.ndarray,
    info: jnp.ndarray,
) -> jnp.ndarray:
    """Width-generic :func:`msm_grid_acc`: walks ALL chunks of a
    (92, 8, LANES) array (any multiple of 256 lanes), with the same
    valid-chunk clamp semantics.  Used per-device by the points-axis
    sharded walker (``parallel.sharded_fast``), where each device's
    shard is a fixed fraction of the capacity array."""
    lanes = points.shape[-1]
    k = lanes // LAN_BLOCK
    assert lanes == k * LAN_BLOCK and words.shape == (8, SUB, lanes)
    return pl.pallas_call(
        _msm_grid_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k,),
            in_specs=[_grid_pspec(), _grid_wspec(), _grid_fixed_pspec()],
            out_specs=_grid_fixed_pspec(),
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, LAN_BLOCK), jnp.int32),
    )(info, points, words, acc)


msm_grid_local = jax.jit(_msm_grid_local_call)


def _fold_c_kernel(info_ref, l_ref, r_ref, w_ref, o_ref):
    """out = L_i + c_i * R_i per lane: the IPP generator fold with host-
    tracked factor vectors.  Because the engine's G_factors are piecewise
    constant ([1]*n1 + [u]*rest, core/prover.py:_prove_middle) and
    H_factors multiply in a geometric y^-i, the per-round fold ratio
    c_i = u^2 * F[i+m]/F[i] takes at most TWO values with one breakpoint;
    the host materialises those digits into `w_ref` (signed w4 nibbles,
    chunks.fold_big_c).  Per-lane factors fold into the MSM *scalars* on
    host, so this single shared-table ladder (~330 point-ops/lane) replaces
    the dual per-lane w2 fold (~516) and 3/4 of its word uploads.  The
    ladder/select structure is exactly `_ladder_w4` (the proven-to-compile
    MSM kernel body) plus one add."""
    j = pl.program_id(0)
    v = info_ref[0]

    @pl.when(j < v)
    def _step():
        prod = _ladder_w4(_load_point(r_ref), w_ref, False)
        _store_point(
            o_ref, emit_point_add(prod, _load_point(l_ref))
        )


def _fold_c_call(big: jnp.ndarray, words: jnp.ndarray,
                 info: jnp.ndarray) -> jnp.ndarray:
    assert big.shape == (ROWS, SUB, GRID_LANES)
    assert words.shape == (8, SUB, GRID_LANES)
    left_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    right_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1) + info[0]),
    )
    out_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    return pl.pallas_call(
        _fold_c_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID_CHUNKS // 2,),
            in_specs=[left_spec, right_spec, _grid_wspec()],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, GRID_LANES), jnp.int32),
    )(info, big, big, words)


fold_grid_c = jax.jit(_fold_c_call)

# Donating variant for rounds >= 2: the job owns its capacity array, so XLA
# may write the folded output in place (writes go to chunks [0, v) which are
# only read at the same grid step; reads of the right half [v, 2v) are never
# overwritten) — this removes a 96 MB allocation per fold round, the main
# HBM-pressure term of batched proving.
fold_grid_c_donate = jax.jit(_fold_c_call, donate_argnums=(0,))


# ----------------------------------------------- half-width dual w3 fold
# A fold constant c is full-width (252-bit challenge product), but the
# prover may fold by ANY invertible multiple: split c = alpha / beta
# (mod L) with |alpha|, |beta| < 2^127 (chunks.half_gcd_split) and fold
#   D' = beta * D_L + alpha * D_R   (= beta * (D_L + c * D_R)),
# absorbing beta^-1 into the host factor vectors.  The dual ladder shares
# its doubling chain: 44 w3 windows x (3 dbl + 2 table adds) + two
# 4-entry tables ~ 230 point-ops/lane vs ~330 for the single full-width
# w4 ladder.  Table VMEM footprint equals the proven single-w4 kernel's
# (8 entries total), so it compiles at full 256-lane blocks.
def _w3_digit_select(words_ref, pos, t1, t2, t3, t4, ident):
    """3-bit signed digit at nibble `pos` (code d & 7, d in [-4, 3]) ->
    d * P via lane selects over the 4-entry multiple table."""
    word = words_ref[pos // 8]
    e = (word >> (4 * (pos % 8))) & 7
    neg = e >= 4
    mag = jnp.where(neg, 8 - e, e)  # e=4 -> d=-4 -> mag 4
    sel = ident
    for k, ent in enumerate((t1, t2, t3, t4)):
        sel = emit_point_select(mag == k + 1, ent, sel)
    return emit_point_negate(sel, neg)


def _emit_fold_w3h(left, right, wl_ref, wr_ref):
    """Per-lane dual half-width ladder: wl * L + wr * R (44 signed w3
    digits each, chunks.w3h_digit_words packing).  T-elided: per window
    only the last doubling and the first add carry T."""
    ident = _identity_point(left[0])
    l2 = emit_point_double(left)
    l3 = emit_point_add(l2, left)
    l4 = emit_point_double(l2)
    r2 = emit_point_double(right)
    r3 = emit_point_add(r2, right)
    r4 = emit_point_double(r2)

    def _win(acc3, pos, last):
        acc = emit_point_double(
            emit_point_double_xyz(emit_point_double_xyz(acc3))
        )
        acc = emit_point_add(
            acc, _w3_digit_select(wl_ref, pos, left, l2, l3, l4, ident)
        )
        selR = _w3_digit_select(wr_ref, pos, right, r2, r3, r4, ident)
        return (emit_point_add(acc, selR) if last
                else emit_point_add_xyz(acc, selR))

    def body(j, acc3):
        return _win(acc3, 43 - j, False)

    acc3 = lax.fori_loop(0, 43, body, ident[:3], unroll=False)
    return _win(acc3, 0, True)


def _fold_w3h_kernel(info_ref, l_ref, r_ref, wl_ref, wr_ref, o_ref):
    j = pl.program_id(0)
    v = info_ref[0]

    @pl.when(j < v)
    def _step():
        _store_point(
            o_ref,
            _emit_fold_w3h(
                _load_point(l_ref), _load_point(r_ref), wl_ref, wr_ref
            ),
        )


def _fold_w3h_call(big: jnp.ndarray, wl: jnp.ndarray, wr: jnp.ndarray,
                   info: jnp.ndarray) -> jnp.ndarray:
    """Separate-sides layout: out[j] = wl*P[j] + wr*P[j+v] for j < v."""
    assert big.shape == (ROWS, SUB, GRID_LANES)
    left_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    right_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1) + info[0]),
    )
    out_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    return pl.pallas_call(
        _fold_w3h_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID_CHUNKS // 2,),
            in_specs=[left_spec, right_spec, _grid_wspec(), _grid_wspec()],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, GRID_LANES), jnp.int32),
    )(info, big, big, wl, wr)


fold_grid_w3h = jax.jit(_fold_w3h_call)


def _fold_w3h_comb_call(big: jnp.ndarray, wl: jnp.ndarray, wr: jnp.ndarray,
                        info: jnp.ndarray) -> jnp.ndarray:
    """Combined G|H layout (see fold_grid_c_comb index maps)."""
    assert big.shape == (ROWS, SUB, GRID_LANES)

    def _lmap(j, info):
        h = info[0] // 2
        jj = jnp.minimum(j, info[0] - 1)
        return (0, 0, jnp.where(jj < h, jj, jj + h))

    def _rmap(j, info):
        h = info[0] // 2
        jj = jnp.minimum(j, info[0] - 1)
        return (0, 0, jnp.where(jj < h, jj, jj + h) + h)

    out_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    return pl.pallas_call(
        _fold_w3h_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID_CHUNKS // 2,),
            in_specs=[
                pl.BlockSpec((ROWS, SUB, LAN_BLOCK), _lmap),
                pl.BlockSpec((ROWS, SUB, LAN_BLOCK), _rmap),
                _grid_wspec(),
                _grid_wspec(),
            ],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, GRID_LANES), jnp.int32),
    )(info, big, big, wl, wr)


fold_grid_w3h_comb = jax.jit(_fold_w3h_comb_call, donate_argnums=(0,))


# ------------------------------------------------- combined-layout fold
# With BOTH generator vectors in ONE capacity array (G chunks [0, k), H
# chunks [k, 2k)), a single dispatch folds both sides: out chunks [0, h)
# hold G' and [h, 2h) hold H' (h = k/2), with per-chunk L/R addressing
#   L(j) = j            for j < h   (G low half)
#        = j + h        for j >= h  (H low half, input offset k = 2h)
#   R(j) = L(j) + h
# Words carry the G-side constants in chunks [0, h) and the H-side in
# [h, 2h) (chunks._c_fold_words_comb).  In-place safe when donated: step j
# writes chunk j and reads chunks >= j only.
def _fold_c_comb_call(big: jnp.ndarray, words: jnp.ndarray,
                      info: jnp.ndarray) -> jnp.ndarray:
    assert big.shape == (ROWS, SUB, GRID_LANES)
    assert words.shape == (8, SUB, GRID_LANES)

    def _lmap(j, info):
        h = info[0] // 2
        jj = jnp.minimum(j, info[0] - 1)
        return (0, 0, jnp.where(jj < h, jj, jj + h))

    def _rmap(j, info):
        h = info[0] // 2
        jj = jnp.minimum(j, info[0] - 1)
        return (0, 0, jnp.where(jj < h, jj, jj + h) + h)

    out_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    return pl.pallas_call(
        _fold_c_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID_CHUNKS // 2,),
            in_specs=[
                pl.BlockSpec((ROWS, SUB, LAN_BLOCK), _lmap),
                pl.BlockSpec((ROWS, SUB, LAN_BLOCK), _rmap),
                _grid_wspec(),
            ],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, GRID_LANES), jnp.int32),
    )(info, big, big, words)


fold_grid_c_comb = jax.jit(_fold_c_comb_call, donate_argnums=(0,))


# ------------------------------------------------------ fused pair grid MSM
# The IPP needs, per log-round, FOUR generator-segment MSMs: the L point
# takes <scG_L, D[v:2v)> + <scH_L, D_H[0:v)>, the R point the complements.
# One pair dispatch walks all 2v valid chunks of ONE capacity array and
# accumulates the low half into output block 0 and the high half into
# block 1 (two accumulators, reduced at each half's last step) — so a
# round costs 2 pair dispatches + 2 Q chains instead of 4 grid MSMs + 2
# chains, with one fused words upload per array instead of two.
def _msm_grid_pair_kernel(info_ref, p_ref, w_ref, acc_ref, o_ref):
    j = pl.program_id(0)
    v = info_ref[0]
    active = jnp.where(j < v, j < info_ref[1], (j - v) < info_ref[2])

    @pl.when((j == 0) | (j == v))
    def _init():
        _store_point(
            o_ref,
            _identity_point(jnp.zeros((STORE, SUB, LAN_BLOCK), jnp.int32)),
        )

    @pl.when(active & (j < 2 * v))
    def _step():
        part = _ladder_w4(_load_point(p_ref), w_ref, False)
        _store_point(o_ref, emit_point_add(_load_point(o_ref), part))

    @pl.when((j == v - 1) | (j == 2 * v - 1))
    def _final():
        tot = emit_block_reduce(_load_point(o_ref))
        _store_point(o_ref, emit_point_add(tot, _load_point(acc_ref)))


@jax.jit
def msm_grid_pair(
    points: jnp.ndarray, words: jnp.ndarray, acc2: jnp.ndarray,
    info: jnp.ndarray,
) -> jnp.ndarray:
    """Two MSMs in one capacity-array walk.

    points (92, 8, GRID_LANES); words (8, 8, GRID_LANES) signed w4 digits;
    acc2 (92, 8, 2*LAN_BLOCK) holding the low-half chain accumulator in
    block 0 and the high-half one in block 1; info = int32
    [v, lo_limit, hi_limit]: chunks [0, v) reduce into output block 0 and
    chunks [v, 2v) into block 1, with compute skipped for chunk offsets
    beyond each half's limit (known-zero scalar regions, e.g. the padded
    witness half in IPP round 1).  Returns the updated (92, 8, 512) pair
    of position-uniform accumulators."""
    assert points.shape == (ROWS, SUB, GRID_LANES)
    assert words.shape == (8, SUB, GRID_LANES)
    assert acc2.shape == (ROWS, SUB, 2 * LAN_BLOCK)
    pair_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.where(j < info[0], 0, 1)),
    )
    return pl.pallas_call(
        _msm_grid_pair_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID_CHUNKS,),
            in_specs=[
                pl.BlockSpec(
                    (ROWS, SUB, LAN_BLOCK),
                    lambda j, info: (0, 0, jnp.minimum(j, 2 * info[0] - 1)),
                ),
                pl.BlockSpec(
                    (8, SUB, LAN_BLOCK),
                    lambda j, info: (0, 0, jnp.minimum(j, 2 * info[0] - 1)),
                ),
                pair_spec,
            ],
            out_specs=pair_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, 2 * LAN_BLOCK), jnp.int32),
    )(info, points, words, acc2)


def _w2_digit_select(words_ref, pos, p1, p2, ident):
    """Signed base-4 digit at `pos` (encoding d & 3, d in [-2, 1]) ->
    d * P via two lane-wise selects over {P, 2P} plus a negate."""
    word = words_ref[pos // 16]
    e = (word >> (2 * (pos % 16))) & 3
    neg = e >= 2
    mag = jnp.where(neg, 4 - e, e)  # e=2 -> d=-2 -> mag 2; e=3 -> d=-1
    sel = emit_point_select(mag == 1, p1, ident)
    sel = emit_point_select(mag == 2, p2, sel)
    return emit_point_negate(sel, neg)


def _emit_fold_w2(left, right, wl_ref, wr_ref):
    """Dual 2-bit signed-digit ladder sharing doublings: wl*L + wr*R per
    lane.  128 windows x (2 dbl + 2 table adds) with only {P, 2P} tables
    (~516 point-ops vs 759 dual bit-serial) — and unlike the w4 dual
    tables, the working set fits VMEM at full 256-lane blocks and the
    small body keeps Mosaic compile time sane.  T-elided: only the second
    doubling and the first add of each window carry T."""
    ident = _identity_point(left[0])
    l2 = emit_point_double(left)
    r2 = emit_point_double(right)

    def _win(acc3, pos, last):
        acc = emit_point_double(emit_point_double_xyz(acc3))
        acc = emit_point_add(
            acc, _w2_digit_select(wl_ref, pos, left, l2, ident)
        )
        selR = _w2_digit_select(wr_ref, pos, right, r2, ident)
        return (emit_point_add(acc, selR) if last
                else emit_point_add_xyz(acc, selR))

    def body(j, acc3):
        return _win(acc3, 127 - j, False)

    acc3 = lax.fori_loop(0, 127, body, ident[:3], unroll=False)
    return _win(acc3, 0, True)


def _fold_grid_kernel(info_ref, l_ref, r_ref, wl_ref, wr_ref, o_ref):
    j = pl.program_id(0)
    v = info_ref[0]

    @pl.when(j < v)
    def _step():
        _store_point(
            o_ref,
            _emit_fold_w2(
                _load_point(l_ref), _load_point(r_ref), wl_ref, wr_ref
            ),
        )


@jax.jit
def fold_grid(left_right: jnp.ndarray, words_l: jnp.ndarray,
              words_r: jnp.ndarray, info: jnp.ndarray) -> jnp.ndarray:
    """Single-dispatch IPP generator fold over a capacity-shaped array:
    out chunk i = wl[i]*P[i] + wr[i]*P[i + v] for i < v = info[0] (info is
    int32 [v, 0]); words hold packed 2-bit signed digits
    (chunks.signed_digit2 encoding: grid_words(encode="w2") /
    const_grid_words).  Output chunks beyond v are unspecified (callers
    only address lanes < v * LAN_BLOCK afterwards)."""
    assert left_right.shape == (ROWS, SUB, GRID_LANES)
    left_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    right_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1) + info[0]),
    )
    out_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK),
        lambda j, info: (0, 0, jnp.minimum(j, info[0] - 1)),
    )
    return pl.pallas_call(
        _fold_grid_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(GRID_CHUNKS // 2,),
            in_specs=[left_spec, right_spec, _grid_wspec(), _grid_wspec()],
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, GRID_LANES), jnp.int32),
    )(info, left_right, left_right, words_l, words_r)


# ------------------------------------------------ window-accumulator MSM
# The per-lane w4 ladder above pays ~256 accumulator doublings per POINT.
# An MSM only needs them per RESULT: split the scalar sum by window,
#   total = sum_w 16^w * (sum_i d_{i,w} * P_i),
# accumulate each window's inner sum across all points (1 table-select add
# per point per window = 64 adds/point), and run ONE shared Horner chain
# (4 dbl + 1 add per window) at the end — ~74 block-ops per 2048-point
# chunk instead of ~327 (measured 4x on the full MSM path).
#
# Memory plan (VMEM is ~16 MB): 64 full-width window accumulators would
# need 48 MB, so the grid runs WINDOW-OUTER, (64, chunks): the window
# accumulator and the Horner accumulator live in VMEM scratch (753 KB
# each) and persist across the chunk sweep, while the 8-entry multiple
# table streams from HBM (6 MB/block DMA ~7 us, hidden under the ~19 us
# padd per step).  Tables come from a one-dispatch prepass
# (`table_grid`); for the fixed generator vectors the table is built once
# per process and reused by every proof (fixed-base MSM).
#
# The result chains exactly like `msm_chunk_acc`: out = block-reduced
# total + chain, position-uniform — so walker calls compose with each
# other and with the chunk-chain kernels in any order.
TBL = 8  # multiple-table entries (1..8)*P for signed 4-bit digits


def _table_body(p):
    """8-entry multiple table (k+1)*P, k=0..7 (4 dbl + 3 add)."""
    t2 = emit_point_double(p)
    t3 = emit_point_add(t2, p)
    t4 = emit_point_double(t2)
    t5 = emit_point_add(t4, p)
    t6 = emit_point_double(t3)
    t7 = emit_point_add(t6, p)
    t8 = emit_point_double(t4)
    return (p, t2, t3, t4, t5, t6, t7, t8)


def _to_niels(q):
    """Extended -> precomputed "niels" form (Y+X, Y-X, 2d*T, Z): the
    mixed add against a niels entry needs no 2d constant-mul and no
    operand sums — one fewer reduce pass per table add.  Y+X / Y-X stay
    UNREDUCED (rows <= 2*(2^11+8), safely inside the validated conv
    bound); negation is (swap first two, negate 2dT)."""
    X, Y, Z, T = q
    return (
        Y + X,
        Y - X,
        pf.emit_mul_const(T, _D2_ROWS, "fp"),
        Z,
    )


def emit_point_add_niels(p, q):
    """p (extended, needs T) + q (niels form) -> extended (8 muls, no
    constant-mul)."""
    X1, Y1, Z1, T1 = p
    A = pf.emit_mul(Y1 - X1, q[1], "fp")
    B = pf.emit_mul(Y1 + X1, q[0], "fp")
    C = pf.emit_mul(T1, q[2], "fp")
    Dv = pf.emit_reduce(pf.emit_scale_const(pf.emit_conv(Z1, q[3]), 2), "fp")
    E = B - A
    F = Dv - C
    G = Dv + C
    H = B + A
    return (
        pf.emit_mul(E, F, "fp"),
        pf.emit_mul(G, H, "fp"),
        pf.emit_mul(F, G, "fp"),
        pf.emit_mul(E, H, "fp"),
    )


def _table_kernel(info_ref, p_ref, o_ref):
    for e, q in enumerate(_table_body(_load_point(p_ref))):
        nq = _to_niels(q)
        for c in range(4):
            o_ref[
                c * STORE : (c + 1) * STORE,
                :,
                e * LAN_BLOCK : (e + 1) * LAN_BLOCK,
            ] = nq[c]


def _table_call(points: jnp.ndarray, info: jnp.ndarray, v,
                tc: int) -> jnp.ndarray:
    """Multiple-table prepass over v = info[0] chunks of a capacity array
    (dynamic grid): output lane block j holds the 8 multiples of point
    chunk j (entry e at lanes [(8j+e)*256, ...)).  `tc` = table capacity
    in chunks; blocks beyond v stay unspecified (never addressed)."""
    assert points.shape == (ROWS, SUB, GRID_LANES)
    spec_in = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK), lambda j, info: (0, 0, j)
    )
    spec_out = pl.BlockSpec(
        (ROWS, SUB, TBL * LAN_BLOCK), lambda j, info: (0, 0, j)
    )
    return pl.pallas_call(
        _table_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(v,),
            in_specs=[spec_in],
            out_specs=spec_out,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, SUB, TBL * tc * LAN_BLOCK), jnp.int32
        ),
        compiler_params=pltpu.CompilerParams(
            # the niels transform's temporaries push the default 16 MB
            # scoped-vmem cap by ~1 MB; v5e has headroom (see msm_win)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(info, points)


table_grid_full = jax.jit(
    lambda p, info, v: _table_call(p, info, v, GRID_CHUNKS)
)
table_grid_half = jax.jit(
    lambda p, info, v: _table_call(p, info, v, GRID_CHUNKS // 2)
)
# rounds >= 3 own their table buffer; XLA reuses it in place
table_grid_half_donate = jax.jit(
    lambda old, p, info, v: _table_call(p, info, v, GRID_CHUNKS // 2),
    donate_argnums=(0,),
)
table_grid_full_donate = jax.jit(
    lambda old, p, info, v: _table_call(p, info, v, GRID_CHUNKS),
    donate_argnums=(0,),
)


def _identity_niels(template):
    """Identity in niels form: (Y+X, Y-X, 2dT, Z) = (1, 1, 0, 1)."""
    zero = jnp.zeros_like(template)
    row0 = lax.broadcasted_iota(jnp.int32, template.shape, 0) == 0
    one0 = jnp.where(row0, jnp.int32(1), jnp.int32(0))
    return (one0, one0, zero, one0)


def _win_digit_select(w_ref, window, t_ref, ident_n):
    """Signed-nibble digit `window` (traced) -> d * P in NIELS form via
    lane selects over the streamed table block (entry e at lane block e);
    negation swaps Y+X / Y-X and negates 2dT."""
    word = w_ref[window // 8]  # (SUB, LAN) dynamic sublane read
    e = (word >> (4 * (window % 8))) & 15
    neg = e >= 8
    mag = jnp.where(neg, 16 - e, e)
    sel = ident_n
    for k in range(1, 9):
        ent = tuple(
            t_ref[
                c * STORE : (c + 1) * STORE,
                :,
                (k - 1) * LAN_BLOCK : k * LAN_BLOCK,
            ]
            for c in range(4)
        )
        sel = emit_point_select(mag == k, ent, sel)
    m = neg[None]
    return (
        jnp.where(m, sel[1], sel[0]),
        jnp.where(m, sel[0], sel[1]),
        jnp.where(m, -sel[2], sel[2]),
        sel[3],
    )


def _msm_win_kernel(info_ref, t_ref, w_ref, chain_ref, o_ref, wacc, horner):
    w = pl.program_id(0)
    j = pl.program_id(1)
    v = info_ref[0]
    window = 63 - w  # Horner consumes digits MSB-first
    zeros = jnp.zeros((STORE, SUB, LAN_BLOCK), jnp.int32)
    ident_n = _identity_niels(zeros)

    @pl.when(j < v)
    def _step():
        sel = _win_digit_select(w_ref, window, t_ref, ident_n)

        @pl.when(j == 0)
        def _init():
            _store_point(wacc, _identity_point(zeros))

        _store_point(
            wacc, emit_point_add_niels(_load_point(wacc), sel)
        )

    @pl.when(j == v - 1)
    def _boundary():
        @pl.when(w == 0)
        def _first():
            _store_point(horner, _load_point(wacc))

        @pl.when(w > 0)
        def _fold():
            h = _load_point(horner)
            for _ in range(3):
                h = emit_point_double_xyz(h)
            h = emit_point_double(h)
            _store_point(horner, emit_point_add(h, _load_point(wacc)))

        @pl.when(w == 63)
        def _final():
            tot = emit_block_reduce(_load_point(horner))
            _store_point(o_ref, emit_point_add(tot, _load_point(chain_ref)))


def _msm_win_call(table: jnp.ndarray, words: jnp.ndarray,
                  chain: jnp.ndarray, info: jnp.ndarray, v) -> jnp.ndarray:
    """Window-accumulator MSM over v = info[0] chunks: point chunk
    `info[1] + c` for steps c < info[3], wrapping to `info[4] + (c -
    info[3])` beyond (a two-segment walk in ONE dispatch — the IPP R walk's
    split table segments ride one fixed cost; degenerate calls set
    info[3] = v so the second branch never fires), paired with word chunk
    `info[2] + c`; returns block-reduce(total) + chain, position-uniform
    (92, 8, 256).

    The chunk grid dimension is DYNAMIC (v is traced): one Mosaic compile
    per table shape serves every segment size with zero padded steps —
    measured ~23 us per idle step otherwise, which dominated small
    segments (the static-grid variant cost ~190 ms at v = 1)."""
    assert words.shape == (8, SUB, GRID_LANES)
    t_spec = pl.BlockSpec(
        (ROWS, SUB, TBL * LAN_BLOCK),
        lambda w, j, info: (
            0, 0,
            jnp.where(j < info[3], j + info[1], j - info[3] + info[4]),
        ),
    )
    w_spec = pl.BlockSpec(
        (8, SUB, LAN_BLOCK),
        lambda w, j, info: (0, 0, j + info[2]),
    )
    fix = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK), lambda w, j, info: (0, 0, 0)
    )
    return pl.pallas_call(
        _msm_win_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(64, v),
            in_specs=[t_spec, w_spec, fix],
            out_specs=fix,
            scratch_shapes=[
                pltpu.VMEM((ROWS, SUB, LAN_BLOCK), jnp.int32),
                pltpu.VMEM((ROWS, SUB, LAN_BLOCK), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, LAN_BLOCK), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # double-buffered 6 MB table stream + scratch accumulators sit
            # just past the default 16 MB scoped-vmem cap; v5e has headroom
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(info, table, words, chain)


# one jit; the two table shapes (full / half capacity) each compile once
msm_win_dyn = jax.jit(_msm_win_call)


# --------------------------------------------- w5 shared-table walker
# The two SHARED generator tables (phase-1, IPP round-1 and verifier
# mega-MSM walks over the FIXED gens — fixed-base MSMs whose tables are
# built once per process) trade 2x table HBM for 51 window steps instead
# of 64 (PERF_NOTES roadmap candidate #3): the walker is MUL-bound
# (8 muls per niels add; the digit selects pipeline-hide), so fewer
# adds/chunk is a real ~1.25x on those walks.  Per-JOB round tables stay
# w4 — their 2x memory would multiply per-in-flight-job HBM and cap the
# batch.  Digits are 51 signed base-32 values d in [-16, 15] coded one
# per BYTE (chunks.signed_digit5_bytes; byte alignment avoids cross-word
# 5-bit extraction), so word blocks are (16, SUB, LAN) int32.
TBL5 = 16
W5_WINDOWS = 51  # ceil(253 / 5)


def _table16_body(p):
    """16-entry multiple table (k+1)*P, k = 0..15 (8 dbl + 7 add)."""
    t2 = emit_point_double(p)
    t3 = emit_point_add(t2, p)
    t4 = emit_point_double(t2)
    t5 = emit_point_add(t4, p)
    t6 = emit_point_double(t3)
    t7 = emit_point_add(t6, p)
    t8 = emit_point_double(t4)
    t9 = emit_point_add(t8, p)
    t10 = emit_point_double(t5)
    t11 = emit_point_add(t10, p)
    t12 = emit_point_double(t6)
    t13 = emit_point_add(t12, p)
    t14 = emit_point_double(t7)
    t15 = emit_point_add(t14, p)
    t16 = emit_point_double(t8)
    return (p, t2, t3, t4, t5, t6, t7, t8,
            t9, t10, t11, t12, t13, t14, t15, t16)


def _table5_kernel(info_ref, p_ref, o_ref):
    for e, q in enumerate(_table16_body(_load_point(p_ref))):
        nq = _to_niels(q)
        for c in range(4):
            o_ref[
                c * STORE : (c + 1) * STORE,
                :,
                e * LAN_BLOCK : (e + 1) * LAN_BLOCK,
            ] = nq[c]


def _table5_call(points: jnp.ndarray, info: jnp.ndarray, v) -> jnp.ndarray:
    """16-multiple niels table prepass over v = info[0] chunks of a
    capacity array; full capacity only (shared gens tables)."""
    assert points.shape == (ROWS, SUB, GRID_LANES)
    spec_in = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK), lambda j, info: (0, 0, j)
    )
    spec_out = pl.BlockSpec(
        (ROWS, SUB, TBL5 * LAN_BLOCK), lambda j, info: (0, 0, j)
    )
    return pl.pallas_call(
        _table5_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(v,),
            in_specs=[spec_in],
            out_specs=spec_out,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, SUB, TBL5 * GRID_CHUNKS * LAN_BLOCK), jnp.int32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(info, points)


table_grid5_full = jax.jit(_table5_call)


def _win5_digit_select(w_ref, window, t_ref, ident_n):
    """Byte-coded signed base-32 digit `window` -> d * P in NIELS form via
    lane selects over the streamed 16-entry table block."""
    word = w_ref[window // 4]  # (SUB, LAN) dynamic sublane read
    e = (word >> (8 * (window % 4))) & 31
    neg = e >= 16
    mag = jnp.where(neg, 32 - e, e)
    sel = ident_n
    for k in range(1, TBL5 + 1):
        ent = tuple(
            t_ref[
                c * STORE : (c + 1) * STORE,
                :,
                (k - 1) * LAN_BLOCK : k * LAN_BLOCK,
            ]
            for c in range(4)
        )
        sel = emit_point_select(mag == k, ent, sel)
    m = neg[None]
    return (
        jnp.where(m, sel[1], sel[0]),
        jnp.where(m, sel[0], sel[1]),
        jnp.where(m, -sel[2], sel[2]),
        sel[3],
    )


def _msm_win5_kernel(info_ref, t_ref, w_ref, chain_ref, o_ref, wacc, horner):
    """The :func:`_msm_win_kernel` structure at w5: 51 windows, 5 Horner
    doublings per fold."""
    w = pl.program_id(0)
    j = pl.program_id(1)
    v = info_ref[0]
    window = W5_WINDOWS - 1 - w  # Horner consumes digits MSB-first
    zeros = jnp.zeros((STORE, SUB, LAN_BLOCK), jnp.int32)
    ident_n = _identity_niels(zeros)

    @pl.when(j < v)
    def _step():
        sel = _win5_digit_select(w_ref, window, t_ref, ident_n)

        @pl.when(j == 0)
        def _init():
            _store_point(wacc, _identity_point(zeros))

        _store_point(
            wacc, emit_point_add_niels(_load_point(wacc), sel)
        )

    @pl.when(j == v - 1)
    def _boundary():
        @pl.when(w == 0)
        def _first():
            _store_point(horner, _load_point(wacc))

        @pl.when(w > 0)
        def _fold():
            h = _load_point(horner)
            for _ in range(4):
                h = emit_point_double_xyz(h)
            h = emit_point_double(h)
            _store_point(horner, emit_point_add(h, _load_point(wacc)))

        @pl.when(w == W5_WINDOWS - 1)
        def _final():
            tot = emit_block_reduce(_load_point(horner))
            _store_point(o_ref, emit_point_add(tot, _load_point(chain_ref)))


def _msm_win5_call(table: jnp.ndarray, words: jnp.ndarray,
                   chain: jnp.ndarray, info: jnp.ndarray, v) -> jnp.ndarray:
    """w5 window-accumulator MSM over v = info[0] chunks of a TBL5-entry
    niels table; same info layout and chaining semantics as
    :func:`_msm_win_call` (incl. the two-segment wrap walk)."""
    assert words.shape == (16, SUB, GRID_LANES)
    t_spec = pl.BlockSpec(
        (ROWS, SUB, TBL5 * LAN_BLOCK),
        lambda w, j, info: (
            0, 0,
            jnp.where(j < info[3], j + info[1], j - info[3] + info[4]),
        ),
    )
    w_spec = pl.BlockSpec(
        (16, SUB, LAN_BLOCK),
        lambda w, j, info: (0, 0, j + info[2]),
    )
    fix = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK), lambda w, j, info: (0, 0, 0)
    )
    return pl.pallas_call(
        _msm_win5_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(W5_WINDOWS, v),
            in_specs=[t_spec, w_spec, fix],
            out_specs=fix,
            scratch_shapes=[
                pltpu.VMEM((ROWS, SUB, LAN_BLOCK), jnp.int32),
                pltpu.VMEM((ROWS, SUB, LAN_BLOCK), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, LAN_BLOCK), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # double-buffered 12 MB table stream + scratch accumulators
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(info, table, words, chain)


msm_win5_dyn = jax.jit(_msm_win5_call)


def _load_point_lane(ref, lo: int):
    return tuple(
        ref[c * STORE : (c + 1) * STORE, :, lo : lo + LAN_BLOCK]
        for c in range(4)
    )


def _store_point_lane(ref, p, lo: int):
    for c in range(4):
        ref[c * STORE : (c + 1) * STORE, :, lo : lo + LAN_BLOCK] = p[c]


def _msm_win_pair_kernel(info_ref, t_ref, w_ref, chain_ref, o_ref,
                         wacc, horner):
    """Both MSMs of a combined-layout IPP round in ONE dispatch via a
    SIDE grid dimension: grid (2, 64, 2k) runs the exact
    :func:`_msm_win_kernel` body once per side (side 0 = L over table
    chunks [k, 3k); side 1 = R over [0, k) then [3k, 4k)) — the inner
    step is the UNCONDITIONAL niels add of the single walker (v1 of this
    kernel predicated the add per side, which broke Mosaic's software
    pipelining: measured 0.74x in batch).  The scratch accumulators are
    reused across sides (j == 0 reinitialises per (side, window)); the
    only fused-away cost is the second dispatch's launch + ramp."""
    s = pl.program_id(0)
    w = pl.program_id(1)
    j = pl.program_id(2)
    v = info_ref[0]
    window = 63 - w  # Horner consumes digits MSB-first
    zeros = jnp.zeros((STORE, SUB, LAN_BLOCK), jnp.int32)
    ident_n = _identity_niels(zeros)

    @pl.when(j < v)
    def _step():
        sel = _win_digit_select(w_ref, window, t_ref, ident_n)

        @pl.when(j == 0)
        def _init():
            _store_point(wacc, _identity_point(zeros))

        _store_point(
            wacc, emit_point_add_niels(_load_point(wacc), sel)
        )

    @pl.when(j == v - 1)
    def _boundary():
        @pl.when(w == 0)
        def _first():
            _store_point(horner, _load_point(wacc))

        @pl.when(w > 0)
        def _fold():
            h = _load_point(horner)
            for _ in range(3):
                h = emit_point_double_xyz(h)
            h = emit_point_double(h)
            _store_point(horner, emit_point_add(h, _load_point(wacc)))

        @pl.when(w == 63)
        def _final():
            tot = emit_block_reduce(_load_point(horner))
            _store_point(o_ref, emit_point_add(tot, _load_point(chain_ref)))


def _msm_win_pair_call(table: jnp.ndarray, words: jnp.ndarray,
                       chain2: jnp.ndarray, info: jnp.ndarray,
                       v) -> jnp.ndarray:
    """One dispatch for a combined round's L AND R window walks
    (info = [2k, k, ...], grid (2, 64, 2k)).  Side 0 (L) reads table
    chunk j + k (the contiguous G-high|H-low span) with word chunk j;
    side 1 (R) reads chunk j for j < k (G-low) else chunk j + 2k
    (H-high), with word chunk j + 2k.  The caller lays words as
    [scG_L|scH_L|scG_R|scH_R] over 4k chunks.  Returns the (92, 8, 512)
    pair: L total + chain-lo in lanes [0, 256), R total + chain-hi
    beyond (pair_lo / pair_hi split)."""
    assert words.shape == (8, SUB, GRID_LANES)
    t_spec = pl.BlockSpec(
        (ROWS, SUB, TBL * LAN_BLOCK),
        lambda s, w, j, info: (
            0, 0,
            jnp.where(
                s == 0,
                j + info[1],
                jnp.where(j < info[1], j, j + 2 * info[1]),
            ),
        ),
    )
    w_spec = pl.BlockSpec(
        (8, SUB, LAN_BLOCK),
        lambda s, w, j, info: (0, 0, j + s * 2 * info[1]),
    )
    side_spec = pl.BlockSpec(
        (ROWS, SUB, LAN_BLOCK), lambda s, w, j, info: (0, 0, s)
    )
    return pl.pallas_call(
        _msm_win_pair_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(2, 64, v),
            in_specs=[t_spec, w_spec, side_spec],
            out_specs=side_spec,
            scratch_shapes=[
                pltpu.VMEM((ROWS, SUB, LAN_BLOCK), jnp.int32)
                for _ in range(2)
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS, SUB, 2 * LAN_BLOCK), jnp.int32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(info, table, words, chain2)


msm_win_pair_dyn = jax.jit(_msm_win_pair_call)


# ----------------------------------------------- per-chunk lane totals MSM
# The frozen-tail "flotilla": a batched IPP's late rounds each cost one
# 2-chunk pair dispatch PER JOB (~19 ms of mostly fixed cost).  This kernel
# instead walks v chunks of a capacity array in ONE dispatch, computing an
# INDEPENDENT block-reduced MSM total per chunk and writing it to lattice
# position j of a single (92, 8, 256) output block via a where-mask (no
# dynamic stores) — so one dispatch serves a whole wave's L/R points:
# chunk 2j carries job j's L words, chunk 2j+1 its R words.
def _msm_lane_kernel(info_ref, p_ref, w_ref, o_ref):
    j = pl.program_id(0)
    v = info_ref[0]
    zeros = jnp.zeros((STORE, SUB, LAN_BLOCK), jnp.int32)

    @pl.when(j < v)
    def _step():
        @pl.when(j == 0)
        def _init():
            _store_point(o_ref, _identity_point(zeros))

        total = _ladder_w4(_load_point(p_ref), w_ref, True)
        sub_i = lax.broadcasted_iota(jnp.int32, zeros.shape, 1)
        lan_i = lax.broadcasted_iota(jnp.int32, zeros.shape, 2)
        mask = (sub_i == j // LAN_BLOCK) & (lan_i == j % LAN_BLOCK)
        cur = _load_point(o_ref)
        _store_point(
            o_ref,
            tuple(jnp.where(mask, t, c) for t, c in zip(total, cur)),
        )


def _msm_lane_call(points: jnp.ndarray, words: jnp.ndarray,
                   info: jnp.ndarray, v) -> jnp.ndarray:
    """v independent per-chunk MSM totals in one dispatch; total of chunk
    j lands at lattice position j (sublane j//256, lane j%256) of the
    (92, 8, 256) output block.  Dynamic grid like the other grid kernels:
    one compiled shape serves every wave size."""
    assert points.shape == (ROWS, SUB, GRID_LANES)
    assert words.shape == (8, SUB, GRID_LANES)
    return pl.pallas_call(
        _msm_lane_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(v,),
            in_specs=[_grid_pspec(), _grid_wspec()],
            out_specs=_grid_fixed_pspec(),
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, SUB, LAN_BLOCK), jnp.int32),
    )(info, points, words)


msm_lane_dyn = jax.jit(_msm_lane_call)


@jax.jit
def smul_lanes(points: jnp.ndarray, words: jnp.ndarray) -> jnp.ndarray:
    """Per-lane scalar_i * P_i (no reduction)."""
    lan = points.shape[-1]
    assert lan % LAN_BLOCK == 0
    return pl.pallas_call(
        _smul_kernel,
        grid=(lan // LAN_BLOCK,),
        out_shape=jax.ShapeDtypeStruct(points.shape, jnp.int32),
        in_specs=[_pspec(), _wspec()],
        out_specs=_pspec(),
    )(points, words)


# ------------------------------------------------------------- fold kernel
def _emit_fold(left, right, wl_ref, wr_ref):
    """Per-lane dual bit-serial ladder: s_l_i * L_i + s_r_i * R_i.
    T-elided like :func:`_ladder`."""
    both = emit_point_add(left, right)
    ident = _identity_point(left[0])

    def _sel(pos):
        w = pos // 32
        sh = pos % 32
        bl = ((wl_ref[w] >> sh) & 1) > 0
        br = ((wr_ref[w] >> sh) & 1) > 0
        return emit_point_select(
            bl & br,
            both,
            emit_point_select(bl, left, emit_point_select(br, right, ident)),
        )

    def body(i, acc3):
        acc = emit_point_double(acc3)
        return emit_point_add_xyz(acc, _sel(252 - i))

    acc3 = lax.fori_loop(0, 252, body, ident[:3], unroll=False)
    return emit_point_add(emit_point_double(acc3), _sel(0))


def _fold_kernel(l_ref, r_ref, wl_ref, wr_ref, o_ref):
    _store_point(
        o_ref,
        _emit_fold(_load_point(l_ref), _load_point(r_ref), wl_ref, wr_ref),
    )


@jax.jit
def fold_chunk(left, right, words_l, words_r):
    """left/right (92, 8, LAN); packed scalar words (8, 8, LAN)."""
    lan = left.shape[-1]
    assert lan % LAN_BLOCK == 0
    return pl.pallas_call(
        _fold_kernel,
        grid=(lan // LAN_BLOCK,),
        out_shape=jax.ShapeDtypeStruct(left.shape, jnp.int32),
        in_specs=[_pspec(), _pspec(), _wspec(), _wspec()],
        out_specs=_pspec(),
    )(left, right, words_l, words_r)


# ------------------------------------------------------------ host helpers
def _ident_flat(npts: int) -> jnp.ndarray:
    out = np.zeros((ROWS, npts), dtype=np.int32)
    out[STORE] = 1
    out[2 * STORE] = 1
    return jnp.asarray(out)


def identity_rows_array(npts: int) -> jnp.ndarray:
    assert npts % SUB == 0
    return _ident_flat(npts).reshape(ROWS, SUB, npts // SUB)


def points_to_rows(arr) -> jnp.ndarray:
    """(N, 4, STORE) -> (92, 8, N/8); N % 8 == 0."""
    n = arr.shape[0]
    assert n % SUB == 0
    flat = jnp.moveaxis(jnp.asarray(arr).reshape(n, ROWS), 0, 1)  # (92, N)
    return flat.reshape(ROWS, SUB, n // SUB)


def rows_to_points(rows: jnp.ndarray) -> jnp.ndarray:
    """(92, 8, N/8) -> (N, 4, STORE)."""
    n = rows.shape[1] * rows.shape[2]
    return jnp.moveaxis(rows.reshape(ROWS, n), 1, 0).reshape(n, 4, STORE)


def reduce_lanes(rows: jnp.ndarray) -> jnp.ndarray:
    """Per-point values -> group total at flat position 0 via a halving
    padd chain (kept for per-lane kernel outputs; MSMs use the in-kernel
    reduction instead).  Returns one (92, 8, LAN_BLOCK) block."""
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
    if flat.shape[-1] < BLOCK_PTS:
        flat = jnp.concatenate(
            [flat, _ident_flat(BLOCK_PTS - flat.shape[-1])], axis=1
        )
    return flat.reshape(ROWS, SUB, LAN_BLOCK)


def bits_matrix(scalars: list[int]) -> np.ndarray:
    """(N, 256) LSB-first bit matrix (vectorised via unpackbits)."""
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    return np.unpackbits(
        np.frombuffer(buf, np.uint8).reshape(len(scalars), 32),
        axis=1,
        bitorder="little",
    ).astype(np.int32)


def words_matrix(scalars: list[int]) -> np.ndarray:
    """(N, 8) int32: scalars packed as little-endian 32-bit words (bit b of
    the scalar = bit b%32 of word b//32); 32x smaller than unpacked bits."""
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    return np.frombuffer(buf, "<u4").reshape(len(scalars), 8).astype(np.int32)


def words_to_rows(words: np.ndarray) -> jnp.ndarray:
    """(N, 8) -> (8, SUB, N/8) matching points_to_rows ordering."""
    n = words.shape[0]
    assert n % SUB == 0
    return jnp.asarray(np.moveaxis(words, 0, 1).reshape(8, SUB, n // SUB))


def bits_to_rows(bits: np.ndarray) -> jnp.ndarray:
    """(N, 256) -> (256, 8, N/8)."""
    n = bits.shape[0]
    assert n % SUB == 0
    return jnp.asarray(np.moveaxis(bits, 0, 1).reshape(256, SUB, n // SUB))
