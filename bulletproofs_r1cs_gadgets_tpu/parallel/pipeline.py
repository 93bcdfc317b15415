"""Sharded proving pipeline building blocks.

``proving_step`` is the computational heart of batched proving expressed as
one jittable function: a data-parallel batched Poseidon witness transform
plus a points-sharded partial MSM whose per-device partial sums are combined
with an all-gather and local group additions (point addition is not a
``psum``-able monoid over int32 lanes, but the 4x23-limb partials are tiny).

``make_sharded_step(mesh)`` wraps it in ``shard_map`` with
  witness:  P('batch')          (dp)
  points:   P('points')         (tensor-parallel MSM shard)
  bits:     P('points')
and a ``psum`` over the batch axis for the witness checksum, exercising both
mesh axes and both collective types.  ``__graft_entry__.dryrun_multichip``
drives it on an 8-device CPU mesh; the same code scales the n-axis of real
proofs across chips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as PSpec
from jax.experimental.shard_map import shard_map

from ..ops.field import FQ, STORE
from ..ops.curve import scalar_mul_bits, tree_reduce, point_add, identity_points


def witness_transform(witness: jnp.ndarray, rounds: int = 8) -> jnp.ndarray:
    """Batched square-and-add chain over FQ (B, W, STORE) -> (B, STORE);
    a stand-in for per-proof witness hashing on the dp axis."""
    acc = witness[:, 0, :]
    for i in range(1, witness.shape[1]):
        acc = FQ.add(FQ.square(acc), witness[:, i, :])
    for _ in range(rounds):
        acc = FQ.add(FQ.square(acc), acc)
    return acc


def partial_msm(points: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 4, STORE) x (N, nbits) -> (4, STORE) partial commitment."""
    return tree_reduce(scalar_mul_bits(points, bits))


def proving_step(witness, points, bits):
    """Single-device reference step (also the __graft_entry__ forward fn)."""
    digest = witness_transform(witness)
    commitment = partial_msm(points, bits)
    return digest, commitment


def make_sharded_step(mesh):
    """Full step over the mesh: dp witness hashing + tp MSM + collectives."""

    def step(witness, points, bits):
        # dp: per-shard witness digests, then a batch-axis psum checksum
        digest = witness_transform(witness)
        checksum = lax.psum(jnp.sum(digest, axis=0), "batch")

        # tp: per-shard partial MSM, all-gather partials, fold locally
        part = partial_msm(points, bits)
        parts = lax.all_gather(part, "points")  # (n_shards, 4, STORE)
        total = parts[0]
        for i in range(1, parts.shape[0]):
            total = point_add(total, parts[i])
        return digest, checksum, total

    n_batch = mesh.shape["batch"]
    n_points = mesh.shape["points"]
    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(
                PSpec("batch"),
                PSpec("points"),
                PSpec("points"),
            ),
            out_specs=(
                PSpec("batch"),
                PSpec(),
                PSpec(),
            ),
            check_rep=False,
        )
    )
