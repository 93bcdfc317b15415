"""Fixed-shape chunked dispatch for the Pallas MSM/fold kernels.

Why this exists (measured, see PERF_NOTES.md): on the remote-compile TPU
backend every NEW kernel shape costs ~70 s of Mosaic compile and every
host<->device sync costs ~55-60 ms.  The round-1 backend dispatched each
MSM at its natural size, so the prover's 18 inner-product rounds plus the
phase-1/verifier MSMs compiled ~25 distinct shapes (~15 min of cold-start
compile per process).

This layer fixes the kernel working set to exactly TWO compiled shapes:

* ``msm_chunk_acc`` - a 2048-point block-reduced ladder chained through an
  accumulator argument; an MSM of any size is a Python loop of these with
  ONE final fetch (dispatches are queued asynchronously by JAX, so the
  device runs back-to-back; per-chunk marginal cost ~12 ms).
* ``fold_chunk`` - the IPP generator fold at the same 2048-lane shape.

Vectors of points live as **chunk lists**: ``list[(92, 8, 256) int32]``,
2048 points per chunk in the stacked-limb layout of
:mod:`.pallas_curve`.  Slicing at chunk granularity is Python list
slicing - no device reshapes/concats (which would themselves compile
per-shape on this backend).  Sub-chunk addressing for the IPP tail rounds
(n < 2048) uses ``lax.dynamic_slice`` with a *traced* lane offset, so the
helpers compile once and serve every tail size.

Scalars arrive as ``(m, 4) uint64`` arrays (:mod:`..core.scvec`); the
packed 32-bit ladder words are zero-copy views chunked host-side, and a
zero word-chunk contributes the identity - all padding is free.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core import scvec
from ..core.ristretto import RistrettoPoint
from ..utils.constants import P
from .field import STORE, limbs_to_int
from . import pallas_curve as pc

CHUNK = pc.BLOCK_PTS  # 2048 points
ROWS = pc.ROWS  # 92


# ----------------------------------------------------------- chunk builders
def _ident_limbs(n: int) -> np.ndarray:
    out = np.zeros((n, 4, STORE), dtype=np.int32)
    out[:, 1, 0] = 1
    out[:, 2, 0] = 1
    return out


def _flat_np(limbs: np.ndarray) -> np.ndarray:
    """(n, 4, STORE) -> (92, n) point-flat layout (numpy)."""
    n = limbs.shape[0]
    return np.ascontiguousarray(limbs.reshape(n, ROWS).T)


def limbs_to_chunks(limbs: np.ndarray) -> list[jnp.ndarray]:
    """(n, 4, STORE) int32 numpy -> identity-padded chunk list on device."""
    n = limbs.shape[0]
    k = max(1, -(-n // CHUNK))
    if n < k * CHUNK:
        limbs = np.concatenate([limbs, _ident_limbs(k * CHUNK - n)])
    flat = _flat_np(limbs)
    return [
        jnp.asarray(
            flat[:, c * CHUNK : (c + 1) * CHUNK].reshape(
                ROWS, pc.SUB, pc.LAN_BLOCK
            )
        )
        for c in range(k)
    ]


def points_to_chunks(points: list[RistrettoPoint]) -> list[jnp.ndarray]:
    from .curve import _ints_to_limbs_vec

    coords = []
    for pt in points:
        coords.extend((pt.X, pt.Y, pt.Z, pt.T))
    limbs = _ints_to_limbs_vec(coords).reshape(len(points), 4, STORE)
    return limbs_to_chunks(limbs)


def broadcast_chunk(point: RistrettoPoint) -> jnp.ndarray:
    """One chunk with `point` in EVERY lane (for tail-round packing)."""
    from .curve import _ints_to_limbs_vec

    limbs = _ints_to_limbs_vec([point.X, point.Y, point.Z, point.T])
    col = limbs.reshape(ROWS, 1)
    return jnp.asarray(
        np.broadcast_to(col, (ROWS, CHUNK)).reshape(
            ROWS, pc.SUB, pc.LAN_BLOCK
        )
    )


_IDENT_CHUNK_NP = _flat_np(_ident_limbs(CHUNK)).reshape(
    ROWS, pc.SUB, pc.LAN_BLOCK
)
_ident_chunk_dev = None


def ident_chunk() -> jnp.ndarray:
    global _ident_chunk_dev
    if _ident_chunk_dev is None:
        _ident_chunk_dev = jnp.asarray(_IDENT_CHUNK_NP)
    return _ident_chunk_dev


# ------------------------------------------------------------- word chunks
def _signed_recode(arr: np.ndarray, C: np.uint64) -> np.ndarray:
    """Closed-form signed-digit recode: (scalar + C) ^ C for a repeating
    mid-range constant C.  For a 2^w-ary digit split with C holding
    2^(w-1) in every w-bit group, t = s + C has digits q_i = d_i + 2^(w-1)
    with signed d_i in [-2^(w-1), 2^(w-1)-1] summing to s, and the w-bit
    encoding (d_i mod 2^w) equals q_i ^ 2^(w-1) — one carried 4-limb add
    plus an XOR, no per-digit carry chain (~1000x the looped version)."""
    a = np.ascontiguousarray(arr, dtype="<u8")
    t = np.empty_like(a)
    carry = np.uint64(0)
    with np.errstate(over="ignore"):
        for i in range(4):
            s = a[:, i] + C
            c_new = s < a[:, i]
            t[:, i] = s + carry
            carry = (c_new | (t[:, i] < s)).astype(np.uint64)
    # scalars are < L < 2^253, so the top limb cannot overflow
    assert not carry.any(), "signed-digit recode overflow"
    return (t ^ C).view("<u4").view(np.int32).reshape(arr.shape[0], 8)


def signed_digit_words(arr: np.ndarray) -> np.ndarray:
    """(m, 4) u64 scalars -> (m, 8) int32 packed 4-bit signed digits
    d_i in [-8, 7], sum d_i * 16^i == scalar (nibble encoding d & 15, so
    all-zero words mean "add nothing" and zero padding stays free).  For
    the windowed MSM ladder ``pallas_curve._ladder_w4``."""
    return _signed_recode(arr, np.uint64(0x8888888888888888))


W3H_DIGITS = 44  # 3-bit signed digits covering |x| < 2^130 (half-width)


def w3h_digit_words(x: int) -> np.ndarray:
    """Signed int |x| < 2^130 -> (8,) int32 packed 3-bit signed digits
    (one digit per NIBBLE, 44 digits): x = sum d_i * 8^i, d_i in [-4, 3],
    nibble code d & 7 (0 -> identity; e >= 4 -> d = e - 8).  For the
    half-width dual fold ladder ``pallas_curve._emit_fold_w3h``; digits
    are per-CONSTANT (a fold has at most a few distinct scalars), so this
    is plain python."""
    assert abs(x) < 1 << 130
    C = 4 * ((1 << (3 * W3H_DIGITS)) - 1) // 7  # 4 in every digit
    t = x + C
    assert 0 <= t < 1 << (3 * W3H_DIGITS)
    w = np.zeros(8, np.int32)
    buf = 0
    for i in range(W3H_DIGITS):
        code = ((t >> (3 * i)) & 7) ^ 4  # q - 4 == (q ^ 4) - ... exact:
        # q in 0..7, d = q - 4 in -4..3, code = d & 7 = q ^ 4
        buf |= code << (4 * i)
    for j in range(8):
        w[j] = np.int32((buf >> (32 * j)) & 0xFFFFFFFF)
    return w


def half_gcd_split(c: int, mod: int) -> tuple[int, int]:
    """Signed (alpha, beta) with alpha == beta * c (mod `mod`) and
    |alpha|, |beta| < 2^127 for a 253-bit modulus: the extended-GCD
    midpoint (first remainder below 2^127 gives |t| <= mod / r_prev
    < 2^126).  Lets a full-width fold constant run as a dual HALF-width
    ladder (beta * L + alpha * R) with beta^-1 absorbed into the
    host-tracked factor vectors."""
    c %= mod
    if c == 0:
        return 0, 1
    r0, r1 = mod, c
    t0, t1 = 0, 1
    while r1 >= 1 << 127:
        q = r0 // r1
        r0, r1 = r1, r0 - q * r1
        t0, t1 = t1, t0 - q * t1
    assert abs(t1) < 1 << 127 and (r1 - t1 * c) % mod == 0
    return r1, t1


def signed_digit2_words(arr: np.ndarray) -> np.ndarray:
    """(m, 4) u64 scalars -> (m, 8) int32 packed 2-bit signed digits
    d_i in [-2, 1], sum d_i * 4^i == scalar (encoding d & 3).  For the
    dual fold ladder ``pallas_curve._emit_fold_w2`` (2-entry tables fit
    VMEM at full 256-lane blocks where the w4 dual tables do not)."""
    return _signed_recode(arr, np.uint64(0xAAAAAAAAAAAAAAAA))


def words_chunks(arr: np.ndarray, nchunks: int | None = None,
                 encode=None) -> list[np.ndarray]:
    """(m, 4) u64 scalar array -> list of (8, 8, 256) int32 word chunks,
    zero-padded to `nchunks` (zero words select the identity in both
    ladder encodings, so padding costs nothing).

    ``encode`` picks the in-kernel ladder: None/"bits" for the bit-serial
    kernels (fold_chunk), "w4" for the signed-digit MSM kernel, "w2" for
    the dual fold kernel."""
    m = arr.shape[0]
    k = nchunks if nchunks is not None else max(1, -(-m // CHUNK))
    if encode == "w4":
        w = signed_digit_words(arr)
    elif encode == "w2":
        w = signed_digit2_words(arr)
    else:
        w = scvec.words_u32(arr).view(np.int32)  # (m, 8)
    if m < k * CHUNK:
        w = np.concatenate([w, np.zeros((k * CHUNK - m, 8), np.int32)])
    out = []
    for c in range(k):
        blk = w[c * CHUNK : (c + 1) * CHUNK]  # (2048, 8)
        out.append(
            np.ascontiguousarray(blk.T).reshape(8, pc.SUB, pc.LAN_BLOCK)
        )
    return out


def segment_words(segments) -> list[np.ndarray]:
    """Build MSM word chunks (signed-digit encoding) for a chunk-list of
    point segments: `segments` is a list of (scalar_array (m,4) u64,
    n_chunks) pairs; each segment is zero-padded to its own chunk boundary
    (matching how the point chunk lists concatenate)."""
    out = []
    for arr, k in segments:
        out.extend(words_chunks(arr, k, encode="w4"))
    return out


_ZERO_WORDS = np.zeros((8, pc.SUB, pc.LAN_BLOCK), np.int32)


def single_scalar_words(s) -> np.ndarray:
    """MSM word chunk with scalar `s` at lane 0 and zeros elsewhere."""
    row = scvec.scalar_to_row(s)[None]  # (1, 4) u64
    return words_chunks(row, 1, encode="w4")[0]


def const_words(s, n: int) -> np.ndarray:
    """Fold word chunk (bit encoding) with scalar `s` in lanes [0, n)."""
    arr = np.tile(scvec.scalar_to_row(s), (n, 1))
    return words_chunks(arr, 1)[0]


# ------------------------------------------------- capacity (grid) arrays
GRID_CHUNKS = pc.GRID_CHUNKS
GRID_LANES = pc.GRID_LANES

_pad_fns: dict = {}


def _pad_to_capacity(arr: jnp.ndarray) -> jnp.ndarray:
    """Device-pad (d0, 8, 256*v) -> (d0, 8, GRID_LANES) with zeros.  The
    padding is never addressed (grid index maps clamp to valid chunks);
    jitted per source width, a handful of widths per process."""
    key = arr.shape
    fn = _pad_fns.get(key)
    if fn is None:
        pad = GRID_LANES - arr.shape[-1]

        @jax.jit
        def fn(a):
            return jnp.pad(a, ((0, 0), (0, 0), (0, pad)))

        _pad_fns[key] = fn
    return fn(arr)


def chunks_to_big(chunk_list: list[jnp.ndarray]) -> jnp.ndarray:
    """Chunk list -> ONE capacity-shaped (92, 8, GRID_LANES) device array
    (chunk c at lanes [256c, 256(c+1))); requires len <= GRID_CHUNKS."""
    k = len(chunk_list)
    assert k <= GRID_CHUNKS
    cat = jnp.concatenate(chunk_list, axis=2)
    return _pad_to_capacity(cat) if k < GRID_CHUNKS else cat


def grid_words(arr: np.ndarray, nchunks: int, encode="w4") -> jnp.ndarray:
    """(m, 4) u64 scalars -> capacity-shaped (8, 8, GRID_LANES) device word
    array for :func:`pallas_curve.msm_grid_acc` (or fold_grid with
    encode=None); only the first `nchunks` chunks are meaningful."""
    blocks = words_chunks(arr, nchunks, encode=encode)
    cat = jnp.asarray(np.concatenate(blocks, axis=2))
    return _pad_to_capacity(cat) if nchunks < GRID_CHUNKS else cat


_const_grid_words_cache: dict = {}


def const_grid_words(s) -> jnp.ndarray:
    """Capacity word array with scalar `s` in EVERY lane (signed-digit w2
    encoding, for constant generator folds); cached by scalar value."""
    key = s.v if hasattr(s, "v") else int(s)
    got = _const_grid_words_cache.get(key)
    if got is None:
        row = signed_digit2_words(scvec.scalar_to_row(s)[None])  # (1, 8)
        one = np.broadcast_to(
            row.reshape(8, 1, 1, 1), (8, pc.SUB, GRID_CHUNKS, pc.LAN_BLOCK)
        )
        got = jnp.asarray(one.reshape(8, pc.SUB, GRID_LANES))
        if len(_const_grid_words_cache) > 64:
            _const_grid_words_cache.clear()
        _const_grid_words_cache[key] = got
    return got


def _info(valid: int, offset: int = 0) -> np.ndarray:
    return np.array([valid, offset], dtype=np.int32)


def msm_grid(points_big: jnp.ndarray, words_big: jnp.ndarray,
             valid: int, offset: int = 0, acc=None) -> jnp.ndarray:
    """One-dispatch MSM over `valid` chunks of a capacity array starting
    at chunk `offset`; chains through `acc` like :func:`msm_chain`."""
    assert 1 <= valid and offset + valid <= GRID_CHUNKS
    if acc is None:
        acc = ident_chunk()
    return pc.msm_grid_acc(points_big, words_big, acc, _info(valid, offset))


def fold_big(big: jnp.ndarray, wl_big: jnp.ndarray, wr_big: jnp.ndarray,
             valid_out: int) -> jnp.ndarray:
    """Capacity-array generator fold: out[i] = wl[i]*P[i] + wr[i]*P[i+v]
    for chunk i < v = valid_out; chunks beyond v are unspecified.  Word
    arrays use the signed-digit w2 encoding (grid_words(encode="w2") /
    const_grid_words)."""
    assert 1 <= valid_out <= GRID_CHUNKS // 2
    return pc.fold_grid(big, wl_big, wr_big, _info(valid_out))


def _c_fold_words(cA, cB, bp: int, k: int) -> jnp.ndarray:
    """Capacity word array (w4 signed digits) for the piecewise-constant
    fold scalar: cA for point index < bp, cB beyond, over k chunks.  Only
    the straddled chunk needs per-lane rows; the rest broadcast one row."""
    dA = signed_digit_words(scvec.scalar_to_row(cA)[None])[0]  # (8,)
    dB = signed_digit_words(scvec.scalar_to_row(cB)[None])[0]
    w = np.empty((k * CHUNK, 8), np.int32)
    j = min(max(bp, 0), k * CHUNK)
    w[:j] = dA
    w[j:] = dB
    # chunk-major capacity layout: word j of point i lives at
    # [j, (i % CHUNK) // LAN_BLOCK, (i // CHUNK) * LAN_BLOCK + i % LAN_BLOCK]
    cat = jnp.asarray(
        np.ascontiguousarray(
            w.reshape(k, pc.SUB, pc.LAN_BLOCK, 8).transpose(3, 1, 0, 2)
        ).reshape(8, pc.SUB, k * pc.LAN_BLOCK)
    )
    return _pad_to_capacity(cat) if k < GRID_CHUNKS else cat


def fold_big_c(big: jnp.ndarray, valid_out: int, bp: int, cA, cB,
               donate: bool) -> jnp.ndarray:
    """Constant-scalar capacity fold: out[i] = P[i] + c_i * P[i + v] for
    point index i < v*CHUNK, with c_i = cA for i < bp else cB (the
    host-tracked factor-vector fold, see pallas_curve._fold_c_kernel).
    `donate=True` lets XLA fold in place (only when `big` is owned by the
    caller, never for the shared generator cache array)."""
    assert 1 <= valid_out <= GRID_CHUNKS // 2
    words = _c_fold_words(cA, cB, bp, valid_out)
    fn = pc.fold_grid_c_donate if donate else pc.fold_grid_c
    return fn(big, words, _info(valid_out))


@jax.jit
def big_chunk0(big: jnp.ndarray) -> jnp.ndarray:
    """First 2048-point chunk of a capacity array (for IPP tail rounds)."""
    return big[:, :, : pc.LAN_BLOCK]


def big_chunk(big: jnp.ndarray, c: int) -> jnp.ndarray:
    """Chunk `c` of a capacity array (python-int index; eager slice)."""
    return big[:, :, c * pc.LAN_BLOCK : (c + 1) * pc.LAN_BLOCK]


_combine_fns: dict = {}


def combine_big(a: jnp.ndarray, b: jnp.ndarray, k: int) -> jnp.ndarray:
    """Two capacity arrays (valid chunks [0, k) each) -> ONE combined
    capacity array with a's chunks at [0, k) and b's at [k, 2k); a 192 MB
    device copy (~0.5 ms), paid once per proof at the round-1 -> round-2
    transition into the combined G|H layout."""
    assert 2 * k <= GRID_CHUNKS
    fn = _combine_fns.get(k)
    if fn is None:
        w = k * pc.LAN_BLOCK

        @jax.jit
        def fn(x, y):
            cat = jnp.concatenate([x[:, :, :w], y[:, :, :w]], axis=2)
            return jnp.pad(
                cat, ((0, 0), (0, 0), (0, GRID_LANES - 2 * w))
            )

        _combine_fns[k] = fn
    return fn(a, b)


def _c_fold_words_comb(cGA, cGB, cHA, cHB, bp: int, h: int) -> jnp.ndarray:
    """Word array for the combined-layout fold: out chunks [0, h) carry
    the G-side piecewise constants (cGA below point index bp, cGB beyond)
    and chunks [h, 2h) the H-side pair, both with the same side-local
    breakpoint."""
    side = np.empty((2, h * CHUNK, 8), np.int32)
    for s, (cA, cB) in enumerate(((cGA, cGB), (cHA, cHB))):
        dA = signed_digit_words(scvec.scalar_to_row(cA)[None])[0]
        dB = signed_digit_words(scvec.scalar_to_row(cB)[None])[0]
        j = min(max(bp, 0), h * CHUNK)
        side[s, :j] = dA
        side[s, j:] = dB
    w = side.reshape(2 * h * CHUNK, 8)
    cat = jnp.asarray(
        np.ascontiguousarray(
            w.reshape(2 * h, pc.SUB, pc.LAN_BLOCK, 8).transpose(3, 1, 0, 2)
        ).reshape(8, pc.SUB, 2 * h * pc.LAN_BLOCK)
    )
    return _pad_to_capacity(cat) if 2 * h < GRID_CHUNKS else cat


def fold_big_c_comb(big: jnp.ndarray, h: int, bp: int, cG, cH) -> jnp.ndarray:
    """Combined-layout constant fold (donating): input G chunks [0, 2h) +
    H chunks [2h, 4h) -> output G' [0, h) + H' [h, 2h); cG/cH are the
    (below-bp, beyond-bp) constant pairs of each side."""
    assert 1 <= 2 * h <= GRID_CHUNKS // 2
    words = _c_fold_words_comb(cG[0], cG[1], cH[0], cH[1], bp, h)
    return pc.fold_grid_c_comb(big, words, _info(2 * h))


# ------------------------------------------- half-width dual fold words
def _rows_pack(w: np.ndarray, k: int) -> jnp.ndarray:
    """(k*CHUNK, 8) int32 word rows -> capacity (8, SUB, GRID_LANES)."""
    cat = jnp.asarray(
        np.ascontiguousarray(
            w.reshape(k, pc.SUB, pc.LAN_BLOCK, 8).transpose(3, 1, 0, 2)
        ).reshape(8, pc.SUB, k * pc.LAN_BLOCK)
    )
    return _pad_to_capacity(cat) if k < GRID_CHUNKS else cat


def _pw_w3h_rows(xA: int, xB: int, bp: int, n_rows: int) -> np.ndarray:
    """(n_rows, 8) int32 half-width w3 digit rows: digits of xA below
    point index bp, xB beyond."""
    w = np.empty((n_rows, 8), np.int32)
    j = min(max(bp, 0), n_rows)
    w[:j] = w3h_digit_words(xA)
    w[j:] = w3h_digit_words(xB)
    return w


def fold_big_w3h(big: jnp.ndarray, valid_out: int, bp: int,
                 sA: tuple[int, int], sB: tuple[int, int]) -> jnp.ndarray:
    """Separate-sides half-width fold: out[i] = beta_i*P[i] +
    alpha_i*P[i+v] with (alpha, beta) = sA for point index i < bp else
    sB (signed half-width ints from :func:`half_gcd_split`)."""
    assert 1 <= valid_out <= GRID_CHUNKS // 2
    wl = _rows_pack(
        _pw_w3h_rows(sA[1], sB[1], bp, valid_out * CHUNK), valid_out
    )
    wr = _rows_pack(
        _pw_w3h_rows(sA[0], sB[0], bp, valid_out * CHUNK), valid_out
    )
    return pc.fold_grid_w3h(big, wl, wr, _info(valid_out))


def fold_big_w3h_comb(big: jnp.ndarray, h: int, bp: int,
                      gA, gB, hA, hB) -> jnp.ndarray:
    """Combined-layout half-width fold (donating): G' chunks [0, h) from
    (alpha, beta) pairs gA/gB (piecewise at bp), H' chunks [h, 2h) from
    hA/hB."""
    assert 1 <= 2 * h <= GRID_CHUNKS // 2
    lanes = h * CHUNK
    wl = _rows_pack(
        np.concatenate([
            _pw_w3h_rows(gA[1], gB[1], bp, lanes),
            _pw_w3h_rows(hA[1], hB[1], bp, lanes),
        ]),
        2 * h,
    )
    wr = _rows_pack(
        np.concatenate([
            _pw_w3h_rows(gA[0], gB[0], bp, lanes),
            _pw_w3h_rows(hA[0], hB[0], bp, lanes),
        ]),
        2 * h,
    )
    return pc.fold_grid_w3h_comb(big, wl, wr, _info(2 * h))


# ------------------------------------------------------- fused pair MSMs
@jax.jit
def _pair_cat(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([lo, hi], axis=2)


@jax.jit
def pair_lo(out: jnp.ndarray) -> jnp.ndarray:
    return out[:, :, : pc.LAN_BLOCK]


@jax.jit
def pair_hi(out: jnp.ndarray) -> jnp.ndarray:
    return out[:, :, pc.LAN_BLOCK :]


def msm_grid_pair(points_big: jnp.ndarray, words_big: jnp.ndarray,
                  valid_half: int, acc_lo=None, acc_hi=None,
                  lo_limit: int | None = None,
                  hi_limit: int | None = None) -> jnp.ndarray:
    """One walk of a capacity array computing TWO chained MSMs: chunks
    [0, v) accumulate into the low output block, [v, 2v) into the high
    one (v = valid_half).  lo/hi_limit skip compute for known-zero scalar
    chunks beyond that offset within each half.  Returns the (92, 8, 512)
    pair; split with :func:`pair_lo` / :func:`pair_hi`."""
    assert 1 <= valid_half and 2 * valid_half <= GRID_CHUNKS
    acc2 = _pair_cat(
        ident_chunk() if acc_lo is None else acc_lo,
        ident_chunk() if acc_hi is None else acc_hi,
    )
    info = np.array(
        [
            valid_half,
            valid_half if lo_limit is None else max(0, lo_limit),
            valid_half if hi_limit is None else max(0, hi_limit),
        ],
        dtype=np.int32,
    )
    return pc.msm_grid_pair(points_big, words_big, acc2, info)


# ------------------------------------------------ window-accumulator MSMs
TBL = pc.TBL
HALF_CHUNKS = GRID_CHUNKS // 2


def table_big(points_big: jnp.ndarray, valid: int,
              half: bool = False, old: jnp.ndarray | None = None
              ) -> jnp.ndarray:
    """Multiple-table prepass for the window-accumulator MSM walker:
    8 small multiples of every point in chunks [0, valid) of a capacity
    array.  `half` targets the half-capacity walker (IPP rounds >= 2);
    passing the previous round's table as `old` lets XLA write the new
    one in place (same shape, donated)."""
    info = _info(valid)
    if not half:
        assert valid <= GRID_CHUNKS
        if old is not None:
            return pc.table_grid_full_donate(old, points_big, info, valid)
        return pc.table_grid_full(points_big, info, valid)
    assert valid <= HALF_CHUNKS
    if old is not None:
        return pc.table_grid_half_donate(old, points_big, info, valid)
    return pc.table_grid_half(points_big, info, valid)


def msm_win(table: jnp.ndarray, words_big: jnp.ndarray, valid: int,
            poff: int = 0, woff: int = 0, chain=None,
            split: int | None = None, poff2: int = 0) -> jnp.ndarray:
    """Window-accumulator MSM over `valid` chunks: table chunks
    [poff, poff+valid) x word chunks [woff, woff+valid); returns the
    position-uniform (92, 8, 256) accumulator `chain + total` (chains
    with msm_chain / other msm_win calls in any order).

    `split`/`poff2` walk TWO table segments in one dispatch (wrap-around
    index map): steps [0, split) read table chunks [poff, poff+split),
    steps [split, valid) read [poff2, poff2+valid-split) — the IPP R
    walk's disjoint G-low/H-high segments stop paying a second ~12 ms
    fixed dispatch cost."""
    assert valid >= 1
    if chain is None:
        chain = ident_chunk()
    tc = table.shape[-1] // (TBL * pc.LAN_BLOCK)
    if split is None:
        split, poff2 = valid, poff  # degenerate: second branch never fires
    else:
        assert 1 <= split <= valid
        assert poff2 + (valid - split) <= tc
    assert poff + split <= tc
    info = np.array([valid, poff, woff, split, poff2], dtype=np.int32)
    return pc.msm_win_dyn(table, words_big, chain, info, valid)


# --------------------------------------------- w5 shared-table walker
TBL5 = pc.TBL5
_C5 = sum(16 << (5 * i) for i in range(pc.W5_WINDOWS))  # 16 per 5-bit group
_C5_LIMBS = np.array(
    [(_C5 >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)], dtype="<u8"
)


def signed_digit5_bytes(arr: np.ndarray) -> np.ndarray:
    """(m, 4) u64 scalars -> (m, 16) int32 packing 51 signed base-32
    digits d_i in [-16, 15], one per byte (code d & 31; byte i holds
    digit i), sum d_i * 32^i == scalar.  Same closed-form recode as
    :func:`signed_digit_words` but with a 5-bit-period constant: digits
    of t = s + C are q_i = d_i + 16, and code = q_i ^ 16."""
    a = np.ascontiguousarray(arr, dtype="<u8")
    m = a.shape[0]
    t = np.empty_like(a)
    carry = np.uint64(0)
    with np.errstate(over="ignore"):
        for i in range(4):
            s = a[:, i] + _C5_LIMBS[i]
            c_new = s < a[:, i]
            t[:, i] = s + carry
            carry = (c_new | (t[:, i] < s)).astype(np.uint64)
        # s < 2^253 and C < 2^255 -> t < 2^256: no carry out
        assert not carry.any(), "w5 recode overflow"
        for i in range(4):
            t[:, i] ^= _C5_LIMBS[i]  # q ^ 16 in every 5-bit group
    out = np.zeros((m, 64), np.uint8)
    for i in range(pc.W5_WINDOWS):
        pos = 5 * i
        limb, sh = pos >> 6, np.uint64(pos & 63)
        with np.errstate(over="ignore"):
            v = t[:, limb] >> sh
            if (pos & 63) > 59:
                v = v | (t[:, limb + 1] << np.uint64(64 - (pos & 63)))
        out[:, i] = (v & np.uint64(31)).astype(np.uint8)
    return out.view("<u4").view(np.int32).reshape(m, 16)


def words5_chunks(arr: np.ndarray, nchunks: int) -> list[np.ndarray]:
    """(m, 4) u64 scalars -> list of (16, 8, 256) int32 w5 word chunks,
    zero-padded to `nchunks` (zero bytes select the identity)."""
    m = arr.shape[0]
    k = nchunks
    w = signed_digit5_bytes(arr)
    if m < k * CHUNK:
        w = np.concatenate([w, np.zeros((k * CHUNK - m, 16), np.int32)])
    out = []
    for c in range(k):
        blk = w[c * CHUNK : (c + 1) * CHUNK]  # (2048, 16)
        out.append(
            np.ascontiguousarray(blk.T).reshape(16, pc.SUB, pc.LAN_BLOCK)
        )
    return out


def grid_words5(arr: np.ndarray, nchunks: int) -> jnp.ndarray:
    """(m, 4) u64 scalars -> capacity-shaped (16, 8, GRID_LANES) device
    word array for :func:`msm_win5`."""
    blocks = words5_chunks(arr, nchunks)
    cat = jnp.asarray(np.concatenate(blocks, axis=2))
    return _pad_to_capacity(cat) if nchunks < GRID_CHUNKS else cat


def table_big5(points_big: jnp.ndarray, valid: int) -> jnp.ndarray:
    """16-multiple niels table prepass (full capacity; for the SHARED
    generator tables only — built once per gens object)."""
    assert valid <= GRID_CHUNKS
    return pc.table_grid5_full(points_big, _info(valid), valid)


def msm_win5(table5: jnp.ndarray, words_big: jnp.ndarray, valid: int,
             poff: int = 0, woff: int = 0, chain=None,
             split: int | None = None, poff2: int = 0) -> jnp.ndarray:
    """w5 window-accumulator MSM over `valid` chunks of a 16-entry
    table; identical call semantics to :func:`msm_win` (chains with every
    other accumulator kernel)."""
    assert valid >= 1
    if chain is None:
        chain = ident_chunk()
    tc = table5.shape[-1] // (TBL5 * pc.LAN_BLOCK)
    if split is None:
        split, poff2 = valid, poff
    else:
        assert 1 <= split <= valid
        assert poff2 + (valid - split) <= tc
    assert poff + split <= tc
    info = np.array([valid, poff, woff, split, poff2], dtype=np.int32)
    return pc.msm_win5_dyn(table5, words_big, chain, info, valid)


def msm_win_pair(table: jnp.ndarray, words_big: jnp.ndarray,
                 k: int) -> jnp.ndarray:
    """Both window walks of a combined-layout IPP round (side = 2k
    chunks) in ONE dispatch: L = <words[0:2k), table chunks [k, 3k)>,
    R = <words[2k:4k), chunks [0, k) then [3k, 4k)>.  The caller encodes
    words as grid_words(concat(scG_L, scH_L, scG_R, scH_R), 4k).  Returns
    the (92, 8, 512) accumulator pair; split with pair_lo / pair_hi."""
    tc = table.shape[-1] // (TBL * pc.LAN_BLOCK)
    assert 1 <= k and 4 * k <= tc
    acc2 = _pair_cat(ident_chunk(), ident_chunk())
    info = np.array([2 * k, k, 0, 0, 0], dtype=np.int32)
    return pc.msm_win_pair_dyn(table, words_big, acc2, info, 2 * k)


# ------------------------------------------------------- frozen-tail pack
_frozen_pack_fns: dict = {}


def frozen_pack_chunk(g_chunk: jnp.ndarray, h_chunk: jnp.ndarray,
                      S: int) -> jnp.ndarray:
    """ONE packed frozen-tail chunk: lanes [G(S) | H(S) | identity...]
    (92, 8, 256).  Requires 2*S <= CHUNK; jitted once per S.  The Q
    terms of a frozen round ride the host (round_finish ``_host_q``
    pattern), which is what lets S reach CHUNK/2 = 1024 — one more tail
    round served by the cheap flotilla walk."""
    assert 2 * S <= CHUNK
    fn = _frozen_pack_fns.get(S)
    if fn is None:
        pad = CHUNK - 2 * S

        @jax.jit
        def fn(g, h):
            gf = g.reshape(ROWS, CHUNK)[:, :S]
            hf = h.reshape(ROWS, CHUNK)[:, :S]
            return jnp.concatenate(
                [gf, hf, _IDENT_FLAT[:, :pad]], axis=1
            ).reshape(ROWS, pc.SUB, pc.LAN_BLOCK)

        _frozen_pack_fns[S] = fn
    return fn(g_chunk, h_chunk)


@jax.jit
def _frozen_dup(packed: jnp.ndarray) -> jnp.ndarray:
    two = jnp.concatenate([packed, packed], axis=2)
    return jnp.pad(
        two, ((0, 0), (0, 0), (0, GRID_LANES - 2 * pc.LAN_BLOCK))
    )


frozen_pack_dup = _frozen_dup


def frozen_pack(g_chunk: jnp.ndarray, h_chunk: jnp.ndarray,
                S: int) -> jnp.ndarray:
    """Packed frozen-tail point array for the late IPP rounds: the
    :func:`frozen_pack_chunk` chunk duplicated into the first two chunks
    of a capacity array so ``msm_grid_pair`` with valid_half=1 walks the
    L words over chunk 0 and the R words over chunk 1 (see pallas_backend
    frozen-tail helpers)."""
    return _frozen_dup(frozen_pack_chunk(g_chunk, h_chunk, S))


_FLOTILLA_CAT_FNS: dict = {}


def flotilla_pack(packed_chunks: list[jnp.ndarray]) -> jnp.ndarray:
    """B frozen packed chunks -> ONE capacity array with job j's chunk
    duplicated at chunks 2j and 2j+1 (L words ride 2j, R words 2j+1 —
    the layout of :func:`msm_lane` + ``frozen_pair_words`` rows).  Jitted
    once per B."""
    B = len(packed_chunks)
    assert 2 * B <= GRID_CHUNKS
    fn = _FLOTILLA_CAT_FNS.get(B)
    if fn is None:
        pad = GRID_LANES - 2 * B * pc.LAN_BLOCK

        @jax.jit
        def fn(*chunks):
            cat = jnp.concatenate(
                [c for ch in chunks for c in (ch, ch)], axis=2
            )
            return jnp.pad(cat, ((0, 0), (0, 0), (0, pad)))

        _FLOTILLA_CAT_FNS[B] = fn
    return fn(*packed_chunks)


def flotilla_words(rows_pairs: list[tuple[np.ndarray, np.ndarray]]
                   ) -> jnp.ndarray:
    """B (rowsL, rowsR) composite-scalar row pairs -> capacity word array
    with job j's L words in chunk 2j and R words in chunk 2j+1."""
    B = len(rows_pairs)
    arr = np.zeros((2 * B * CHUNK, 4), np.uint64)
    for j, (rowsL, rowsR) in enumerate(rows_pairs):
        arr[2 * j * CHUNK : 2 * j * CHUNK + rowsL.shape[0]] = rowsL
        arr[(2 * j + 1) * CHUNK : (2 * j + 1) * CHUNK + rowsR.shape[0]] = (
            rowsR
        )
    return grid_words(arr, 2 * B)


def msm_lane(points_big: jnp.ndarray, words_big: jnp.ndarray,
             valid: int) -> jnp.ndarray:
    """`valid` INDEPENDENT per-chunk MSM totals in one dispatch; chunk
    j's total lands at lattice position j of the returned (92, 8, 256)
    block (fetch with :func:`fetch_lane_points`)."""
    assert 1 <= valid <= GRID_CHUNKS
    return pc.msm_lane_dyn(points_big, words_big, _info(valid), valid)


def fetch_lane_points(block: jnp.ndarray, count: int
                      ) -> list[RistrettoPoint]:
    """ONE host sync decoding `count` per-position totals of an
    :func:`msm_lane` output block (position j at sublane j//256, lane
    j%256)."""
    arr = np.asarray(block)  # (92, 8, 256)
    out = []
    for j in range(count):
        c = arr[:, j // pc.LAN_BLOCK, j % pc.LAN_BLOCK].reshape(4, STORE)
        out.append(
            RistrettoPoint(
                limbs_to_int(c[0]) % P,
                limbs_to_int(c[1]) % P,
                limbs_to_int(c[2]) % P,
                limbs_to_int(c[3]) % P,
            )
        )
    return out


def frozen_pair_words(rowsL: np.ndarray, rowsR: np.ndarray) -> jnp.ndarray:
    """(2S+1, 4) u64 L/R composite-scalar rows -> capacity word array with
    the L words in chunk 0 and the R words in chunk 1 (w4 digits)."""
    arr = np.zeros((2 * CHUNK, 4), np.uint64)
    arr[: rowsL.shape[0]] = rowsL
    arr[CHUNK : CHUNK + rowsR.shape[0]] = rowsR
    return grid_words(arr, 2)


# --------------------------------------------------------------- MSM chain
def msm_chain(pts_chunks, word_chunks, acc=None) -> jnp.ndarray:
    """Chained MSM over aligned chunk lists (signed-digit words); returns
    the device accumulator (position-uniform).  No host sync - fetch with
    :func:`fetch_points`."""
    if acc is None:
        acc = ident_chunk()
    for p, w in zip(pts_chunks, word_chunks, strict=True):
        acc = pc.msm_chunk_acc_w4(p, w, acc)
    return acc


@jax.jit
def _acc_lane0(acc: jnp.ndarray) -> jnp.ndarray:
    return acc[:, 0, 0]  # (92,)


def fetch_points(accs: list[jnp.ndarray]) -> list[RistrettoPoint]:
    """ONE host sync for a handful of accumulators."""
    if len(accs) == 1:
        rows = np.asarray(_acc_lane0(accs[0]))[None]
    else:
        rows = np.asarray(jnp.stack([_acc_lane0(a) for a in accs]))
    out = []
    for row in rows:
        c = row.reshape(4, STORE)
        out.append(
            RistrettoPoint(
                limbs_to_int(c[0]) % P,
                limbs_to_int(c[1]) % P,
                limbs_to_int(c[2]) % P,
                limbs_to_int(c[3]) % P,
            )
        )
    return out


# ------------------------------------------------------- tail-round helpers
_IDENT_FLAT = jnp.asarray(_flat_np(_ident_limbs(CHUNK)))  # (92, 2048)


@jax.jit
def _tail_shift(chunk: jnp.ndarray, n) -> jnp.ndarray:
    """Lanes [0, CHUNK-n) <- chunk lanes [n, CHUNK); identity beyond.
    Compiled ONCE: `n` is a traced lane offset (dynamic_slice)."""
    flat = chunk.reshape(ROWS, CHUNK)
    padded = jnp.concatenate([flat, _IDENT_FLAT], axis=1)
    out = lax.dynamic_slice(padded, (0, n), (ROWS, CHUNK))
    return out.reshape(ROWS, pc.SUB, pc.LAN_BLOCK)


@jax.jit
def _tail_pack_pair(g: jnp.ndarray, h: jnp.ndarray, n):
    """IPP tail-round L/R point packing for vector length n < 1024:
    ptsL lanes = [G[n..2n) | H[0..n) | junk]  (junk lanes get zero words)
    ptsR lanes = [G[0..n)  | H[n..2n) | junk]
    One compile: n is traced."""
    gflat = g.reshape(ROWS, CHUNK)
    hflat = h.reshape(ROWS, CHUNK)
    g_hi = lax.dynamic_slice(
        jnp.concatenate([gflat, _IDENT_FLAT], axis=1), (0, n), (ROWS, CHUNK)
    )
    # H shifted right by n lanes: lanes [n, ...) hold H[0..)
    h_shift = lax.dynamic_slice(
        jnp.concatenate([_IDENT_FLAT, hflat], axis=1),
        (0, CHUNK - n),
        (ROWS, CHUNK),
    )
    lane = lax.broadcasted_iota(jnp.int32, (ROWS, CHUNK), 1)
    ptsL = jnp.where(lane < n, g_hi, h_shift)
    ptsR = jnp.where(lane < n, gflat, hflat)
    shp = (ROWS, pc.SUB, pc.LAN_BLOCK)
    return ptsL.reshape(shp), ptsR.reshape(shp)


def tail_pair_words(sc_G: np.ndarray, sc_H: np.ndarray, n: int) -> np.ndarray:
    """MSM word chunk (signed-digit) matching _tail_pack_pair's lane
    layout: sc_G in lanes [0, n), sc_H in lanes [n, 2n), zeros beyond."""
    w = np.zeros((CHUNK, 8), np.int32)
    w[:n] = signed_digit_words(sc_G)
    w[n : 2 * n] = signed_digit_words(sc_H)
    return np.ascontiguousarray(w.T).reshape(8, pc.SUB, pc.LAN_BLOCK)


def tail_fold(chunk: jnp.ndarray, n: int, s_left: np.ndarray,
              s_right: np.ndarray) -> jnp.ndarray:
    """Fold lanes [0, n) with lanes [n, 2n) of one chunk (n <= 1024):
    out[j] = s_left[j] * P[j] + s_right[j] * P[n + j]; identity beyond n."""
    right = _tail_shift(chunk, n)
    wl = np.zeros((CHUNK, 8), np.int32)
    wl[:n] = scvec.words_u32(s_left).view(np.int32)
    wr = np.zeros((CHUNK, 8), np.int32)
    wr[:n] = scvec.words_u32(s_right).view(np.int32)
    return pc.fold_chunk(
        chunk,
        right,
        np.ascontiguousarray(wl.T).reshape(8, pc.SUB, pc.LAN_BLOCK),
        np.ascontiguousarray(wr.T).reshape(8, pc.SUB, pc.LAN_BLOCK),
    )


def fold_chunks(chunks: list[jnp.ndarray], wl_chunks, wr_chunks):
    """Chunk-granular fold: out[i] = fold(chunks[i], chunks[i+k]) for
    k = len(chunks)//2 output chunks; word chunks are per-output-chunk."""
    k = len(chunks) // 2
    return [
        pc.fold_chunk(chunks[i], chunks[i + k], wl_chunks[i], wr_chunks[i])
        for i in range(k)
    ]
