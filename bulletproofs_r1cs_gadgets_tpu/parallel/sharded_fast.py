"""Points-axis sharding of the PRODUCTION (fast-path) MSM walker.

``parallel.sharded_backend.ShardedMsmBackend`` shards the XLA-composed
oracle MSM; this module shards the fast path's own data structures — the
stacked-limb capacity array (``ops/chunks`` layout: (92, 8, LANES) int32,
2048-point chunks), the packed signed-digit word array, and the
valid-chunk ``info`` semantics of the grid walkers — over a
``jax.sharding.Mesh`` axis:

* the lane (chunk) axis splits into contiguous per-device groups;
* each device runs ONE local walk over its shard with its own clamped
  valid-chunk count (the same scalar-prefetched info contract as
  ``pallas_curve._msm_grid_kernel``: zero-word chunks contribute the
  identity, so devices past the valid span walk one zeroed chunk);
* the per-device partial accumulators (92 int32 limb rows each) ride ONE
  ``all_gather`` over ICI (~0.4 KB x n_shards) and fold with log-n
  point adds, replicated — the structure measured for the 8-chip MSM
  projection (BASELINE.md "MSM points axis").

The local walk is pluggable with an identical contract:

* ``local_walk_pallas`` — the production Pallas grid walker
  (``pallas_curve.msm_grid_local``, the width-generic
  ``_msm_grid_kernel``) for TPU meshes;
* ``local_walk_xla`` — an exact XLA decoder of the SAME packed
  signed-digit words (built from ``ops/curve`` group ops), used to
  validate the sharded structure on the virtual CPU mesh where Pallas
  kernels cannot execute (interpret mode is ~1000x too slow under an
  8-device shard_map).  Byte-equal outputs by construction: both
  implement sum_i d_i(words) * P_i over the local shard.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as PSpec
from jax.experimental.shard_map import shard_map

from ..core.ristretto import RistrettoPoint
from ..ops.field import STORE, limbs_to_int
from ..ops.curve import (
    point_add,
    point_neg,
    point_double,
    identity_points,
)
from ..ops import pallas_curve as pc
from ..utils.constants import P

ROWS = pc.ROWS
SUB = pc.SUB
LAN_BLOCK = pc.LAN_BLOCK


# --------------------------------------------------------- local walks
def local_walk_pallas(big_l: jnp.ndarray, words_l: jnp.ndarray,
                      info: jnp.ndarray) -> jnp.ndarray:
    """Production local walk: the width-generic Pallas grid walker over
    this device's shard.  Returns the (92,) accumulator limb rows."""
    ident = pc.identity_rows_array(SUB * LAN_BLOCK)
    blk = pc.msm_grid_local(big_l, words_l, ident, info)
    return blk[:, 0, 0]


def local_walk_xla(big_l: jnp.ndarray, words_l: jnp.ndarray,
                   info: jnp.ndarray) -> jnp.ndarray:
    """Oracle local walk: decode the fast path's packed signed 4-bit
    digit words with XLA ops and compute the identical windowed MSM.

    Matches the kernel semantics exactly: nibble e of word j selects
    d = e - 16*(e >= 8) in [-8, 7], total = sum_i sum_w d_{i,w} 16^w P_i,
    chunks at index >= info[0] contribute nothing."""
    lanes = big_l.shape[-1]
    n = SUB * lanes
    # (92, 8, LANES) -> (N, 4, STORE); flat order (sublane, lane) — the
    # words flatten the same way, so pairs stay aligned (MSM totals are
    # order-invariant)
    pts = jnp.moveaxis(big_l.reshape(ROWS, n), 1, 0).reshape(n, 4, STORE)
    w = jnp.moveaxis(words_l.reshape(8, n), 1, 0)  # (N, 8) int32
    # chunk index of each flat position f = s*LANES + l: (f % LANES) // 256
    f = jnp.arange(n, dtype=jnp.int32)
    chunk = (f % lanes) // LAN_BLOCK
    live = (chunk < info[0])[:, None, None]

    # multiples 1..8 of every point: (8, N, 4, STORE)
    entries = [pts]
    for _ in range(7):
        entries.append(point_add(entries[-1], pts))
    table = jnp.stack(entries, axis=0)
    ident = jnp.broadcast_to(identity_points(()), pts.shape)

    def body(acc, j):
        # acc (4, STORE) total so far, MSB window first (Horner)
        for _ in range(4):
            acc = point_double(acc)
        win = 63 - j
        e = (w[:, win // 8] >> (4 * (win % 8))) & 15
        neg = e >= 8
        mag = jnp.where(neg, 16 - e, e)  # (N,)
        onehot = (
            mag[None, :] == jnp.arange(1, 9)[:, None]
        ).astype(jnp.int32)
        sel = jnp.einsum("kn,knab->nab", onehot, table)
        sel = jnp.where(neg[:, None, None], point_neg(sel), sel)
        sel = jnp.where((mag > 0)[:, None, None] & live, sel, ident)
        # tree-reduce the window addends, then fold into the Horner acc
        m = sel.shape[0]
        red = sel
        while m > 1:
            half = m // 2
            rest = red[2 * half :]
            red = point_add(red[:half], red[half : 2 * half])
            if rest.shape[0]:
                red = jnp.concatenate([red, rest], axis=0)
            m = red.shape[0]
        return point_add(acc, red[0]), None

    acc, _ = lax.scan(
        body, identity_points(()), jnp.arange(64)
    )
    # (4, STORE) -> (92,) stacked rows (the walker's lane-0 layout)
    return acc.reshape(ROWS)


class ShardedWalkMsm:
    """One MSM sharded chunk-wise over ``mesh[axis]`` with the fast
    path's array layout; see module docstring.

    ``local_chunks`` is each device's chunk count; the global walk spans
    ``n_shards * local_chunks`` chunks of 2048 points.  ``local_walk``
    defaults to the production Pallas walker (TPU); pass
    :func:`local_walk_xla` on CPU meshes."""

    def __init__(self, mesh: Mesh, axis: str = "points",
                 local_chunks: int = 2, local_walk=None):
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        self.local_chunks = local_chunks
        self.total_chunks = self.n_shards * local_chunks
        walk = local_walk or local_walk_pallas
        lc = local_chunks

        def sharded(big_l, words_l, karr):
            d = lax.axis_index(axis)
            start = d * lc
            lv = jnp.clip(karr[0] - start, 0, lc)
            # lv == 0 devices walk one zero-word chunk: identity (the
            # capacity zero-padding invariant of the word encodes)
            info = jnp.stack([jnp.maximum(lv, 1), jnp.int32(0)])
            part = walk(big_l, words_l, info)  # (92,)
            parts = lax.all_gather(part, axis)  # (n_shards, 92)
            tot = parts[0].reshape(4, STORE)
            for i in range(1, self.n_shards):
                tot = point_add(tot, parts[i].reshape(4, STORE))
            return tot

        self._fn = jax.jit(
            shard_map(
                sharded,
                mesh=mesh,
                in_specs=(
                    PSpec(None, None, axis),
                    PSpec(None, None, axis),
                    PSpec(),
                ),
                out_specs=PSpec(),
                check_rep=False,
            )
        )

    def msm(self, big: jnp.ndarray, words: jnp.ndarray,
            valid_chunks: int) -> RistrettoPoint:
        """big (92, 8, total_chunks*256) stacked-limb points; words
        (8, 8, same) packed signed w4 digits (``chunks`` layout); chunks
        beyond ``valid_chunks`` must hold zero words."""
        assert big.shape == (ROWS, SUB, self.total_chunks * LAN_BLOCK)
        assert words.shape == (8, SUB, self.total_chunks * LAN_BLOCK)
        assert 1 <= valid_chunks <= self.total_chunks
        karr = jnp.asarray(np.array([valid_chunks, 0], np.int32))
        rows = np.asarray(self._fn(big, words, karr))  # (4, STORE)
        return RistrettoPoint(
            limbs_to_int(rows[0]) % P,
            limbs_to_int(rows[1]) % P,
            limbs_to_int(rows[2]) % P,
            limbs_to_int(rows[3]) % P,
        )


class ShardedWalkVerifyBackend:
    """Verifier backend whose mega-MSM G/H generator segments — the
    dominant verification cost — run through :class:`ShardedWalkMsm`
    (the fast path's arrays sharded over the mesh); head/tail
    proof-specific points stay on host.  This puts the points-axis
    sharded walk inside a REAL verified proof (dryrun_multichip phase D;
    VERDICT r4 item 3): the projection basis for the 8-chip MSM metric
    is the structure exercised here.

    Prover-side use rides the same primitive (every prover MSM is a
    generator-vector walk of the same layout); the verify equation is
    the strongest single check because a wrong segment total fails it.
    """

    def __init__(self, sharded: ShardedWalkMsm):
        self._sh = sharded
        self._big_cache: dict = {}

    def msm(self, scalars, points):
        from ..core.ristretto import multiscalar_mul
        from ..core import scvec

        if isinstance(scalars, np.ndarray):
            scalars = scvec.to_scalars(scalars)
        return multiscalar_mul(list(scalars), points)

    def _gens_big(self, gens_share, padded_n: int, which: str):
        key = (id(gens_share._gens), which)
        got = self._big_cache.get(key)
        if got is None:
            from ..ops import chunks as ck

            pts = (
                gens_share.G(padded_n) if which == "G"
                else gens_share.H(padded_n)
            )
            chunks = ck.points_to_chunks(pts)
            pad = self._sh.total_chunks - len(chunks)
            assert pad >= 0, "padded_n exceeds the sharded walker's span"
            chunks = chunks + [ck.ident_chunk()] * pad
            got = jnp.concatenate(chunks, axis=2)
            self._big_cache[key] = got
        return got

    def msm_gens(
        self, scalars, head_points, gens_share, padded_n, tail_points
    ) -> RistrettoPoint:
        from ..core import scvec
        from ..ops import chunks as ck
        from ..core.ristretto import multiscalar_mul

        assert padded_n % (SUB * LAN_BLOCK) == 0
        k = padded_n // (SUB * LAN_BLOCK)
        nh, nt = len(head_points), len(tail_points)
        arr = (
            scalars if isinstance(scalars, np.ndarray)
            else scvec.from_scalars(list(scalars))
        )
        tc = self._sh.total_chunks

        def words_for(seg):
            blocks = ck.words_chunks(seg, tc, encode="w4")
            return jnp.asarray(np.concatenate(blocks, axis=2))

        G_pt = self._sh.msm(
            self._gens_big(gens_share, padded_n, "G"),
            words_for(arr[nh : nh + padded_n]), k,
        )
        H_pt = self._sh.msm(
            self._gens_big(gens_share, padded_n, "H"),
            words_for(arr[nh + padded_n : nh + 2 * padded_n]), k,
        )
        rest = multiscalar_mul(
            scvec.to_scalars(arr[:nh])
            + scvec.to_scalars(arr[nh + 2 * padded_n :]),
            head_points + tail_points,
        )
        return G_pt + H_pt + rest
