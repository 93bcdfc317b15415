"""Multi-scalar multiplication on TPU.

The MSM is the dominant cost of Bulletproofs proving/verification
(SURVEY.md CS-1: ">95% of wall time").  TPU-first design notes:

* GPUs run Pippenger with scatter-heavy bucket accumulation; TPUs hate
  data-dependent scatter.  Instead we run a *dense windowed double-and-add*:
  every point processes its own scalar in lock-step across the batch (VPU
  lanes fully utilised, zero data movement), followed by a log2(N) tree
  reduction.  Work is O(N * 253/w * (w dbl + 1 table-select + 1 add)) with
  a w-bit window - the table "select" is a one-hot weighted sum of limb
  vectors, which costs a fraction of a point add on the VPU.
* Chunking bounds the live table memory ((2^w - 1) * chunk * 368 B).
* Generators are fixed per proof system, so the engine caches their device
  arrays (and can later cache window tables) across calls.

Correctness oracle: ``core.ristretto.multiscalar_mul`` (host Pippenger).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.ristretto import RistrettoPoint
from ..core.scalar import Scalar
from .field import STORE
from .curve import (
    point_add,
    point_double,
    identity_points,
    points_to_device,
    points_from_device,
)

WINDOW = 4  # bits per window
NWINDOWS = (253 + WINDOW - 1) // WINDOW  # 64
CHUNK = 1 << 14  # points per large device chunk
SMALL_CHUNK = 1 << 10  # tail/small-problem chunk
# Only these two shapes are ever compiled for the MSM kernel; tails are
# padded with (identity, zero-scalar) pairs, which the unified formulas
# absorb at negligible cost.


def scalars_to_digits(scalars, window: int = WINDOW) -> np.ndarray:
    """(N, NWINDOWS) int32 window digits, least-significant window first.

    Accepts a list of ints or a ``core.scvec`` (N, 4) u64 array; the array
    path is fully vectorized (nibble split of the little-endian byte view —
    no per-scalar Python loop, VERDICT round-1 item 8)."""
    nwin = (253 + window - 1) // window
    if isinstance(scalars, np.ndarray) and scalars.ndim == 2:
        assert window in (1, 2, 4, 8), "array fast path needs window | 8"
        n = scalars.shape[0]
        b = np.ascontiguousarray(scalars, dtype="<u8").view(np.uint8)
        b = b.reshape(n, 32)
        per = 8 // window
        mask = (1 << window) - 1
        out = np.empty((n, 32 * per), dtype=np.int32)
        for k in range(per):
            out[:, k::per] = (b >> (window * k)) & mask
        return out[:, :nwin]
    n = len(scalars)
    out = np.zeros((n, nwin), dtype=np.int32)
    mask = (1 << window) - 1
    for i, s in enumerate(scalars):
        v = s
        for w in range(nwin):
            out[i, w] = v & mask
            v >>= window
    return out


def msm_chunk_impl(
    points: jnp.ndarray, digits: jnp.ndarray, window: int = WINDOW
) -> jnp.ndarray:
    """MSM over one chunk: points (N,4,S), digits (N,W) -> (4,S) sum.

    Windowed double-and-add, MSB window first; the per-point multiple
    d * P_i is selected from a (2^w - 1)-entry table by a one-hot weighted
    sum (pure VPU multiply-adds, no gather).  ``window`` trades table size
    (graph size / compile time) against doubling count; the CPU-mesh tests
    use w=2 to keep XLA compiles short.
    """
    n = points.shape[0]
    nent = (1 << window) - 1
    # table[k] = (k+1) * P, k = 0..nent-1  -> (nent, N, 4, S)
    entries = [points]
    for k in range(1, nent):
        entries.append(point_add(entries[-1], points))
    table = jnp.stack(entries, axis=0)

    nwin = digits.shape[-1]

    def body(acc, w):
        # acc: (N, 4, S) running per-point accumulator
        for _ in range(window):
            acc = point_double(acc)
        d = digits[:, nwin - 1 - w]  # (N,)
        # one-hot select of d*P (identity when d == 0)
        onehot = (
            d[None, :] == jnp.arange(1, nent + 1)[:, None]
        ).astype(jnp.int32)
        sel = jnp.einsum("kn,knab->nab", onehot, table)
        # d == 0 -> identity
        ident = jnp.broadcast_to(identity_points(()), points.shape)
        addend = jnp.where((d > 0)[:, None, None], sel, ident)
        acc = point_add(acc, addend)
        return acc, None

    ident = jnp.broadcast_to(identity_points(()), points.shape)
    acc, _ = lax.scan(body, ident, jnp.arange(nwin))

    # tree-reduce the per-point results
    m = n
    while m > 1:
        half = m // 2
        extra = acc[m - 1 : m] if m % 2 else None
        summed = point_add(acc[:half], acc[half : 2 * half])
        acc = jnp.concatenate([summed, extra], axis=0) if extra is not None else summed
        m = acc.shape[0]
    return acc[0]


_msm_chunk = jax.jit(msm_chunk_impl)


def _pad_chunk(points: jnp.ndarray, digits: np.ndarray, size: int):
    n = points.shape[0]
    if n == size:
        return points, jnp.asarray(digits)
    pad_pts = jnp.broadcast_to(identity_points(()), (size - n, 4, STORE))
    points = jnp.concatenate([points, pad_pts], axis=0)
    digits = np.concatenate(
        [digits, np.zeros((size - n, digits.shape[1]), dtype=np.int32)], axis=0
    )
    return points, jnp.asarray(digits)


def msm_device(
    scalars: list[int], points_dev: jnp.ndarray
) -> jnp.ndarray:
    """Full MSM: host scalars x device points -> device point (4, STORE).

    Work is split into CHUNK-sized pieces (one compiled shape) with a
    SMALL_CHUNK shape for tails, keeping total distinct compilations at two.
    """
    n = len(scalars)
    assert points_dev.shape[0] == n
    if n == 0:
        return identity_points(())
    digits = scalars_to_digits(scalars)
    partials = []
    off = 0
    while off < n:
        rest = n - off
        if rest >= CHUNK:
            size = CHUNK
        elif rest > SMALL_CHUNK:
            # one padded large chunk eats the whole tail
            size = CHUNK if rest > CHUNK // 2 else SMALL_CHUNK
        else:
            size = SMALL_CHUNK
        hi = min(off + size, n)
        pts, digs = _pad_chunk(points_dev[off:hi], digits[off:hi], size)
        partials.append(_msm_chunk(pts, digs))
        off = hi
    acc = partials[0]
    for p in partials[1:]:
        acc = point_add(acc, p)
    return acc


class MsmEngine:
    """Caches device arrays for fixed generator vectors across calls."""

    def __init__(self):
        self._cache: dict[int, jnp.ndarray] = {}

    def device_points(self, points: list[RistrettoPoint]) -> jnp.ndarray:
        key = id(points)
        hit = self._cache.get(key)
        if hit is not None and hit.shape[0] == len(points):
            return hit
        dev = points_to_device(points)
        self._cache[key] = dev
        return dev

    def msm(self, scalars: list[Scalar], points: list[RistrettoPoint]) -> RistrettoPoint:
        dev = self.device_points(points)
        out = msm_device([s.v for s in scalars], dev)
        return points_from_device(out)[0]
