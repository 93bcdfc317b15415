"""Multi-chip MSM sharding: a proof-engine backend whose every device MSM
partitions the point axis over a ``jax.sharding.Mesh``.

This is the tensor-parallel axis of SURVEY.md §2b N10 made real: the same
``Prover.prove`` / ``Verifier.verify`` calls that run single-chip route
their phase commitments, IPP L/R MSMs and the verifier mega-MSM through
``shard_map`` — each device computes a windowed partial MSM over its point
shard, the (4, 23)-limb partial sums ride one ``all_gather`` over ICI, and
the handful of partials fold locally (point addition is not a ``psum``-able
monoid over int32 lanes, so the gather+fold costs a few hundred bytes and
log-n adds).

Built on the XLA-composed kernels (:mod:`..ops.msm`), so the identical
code validates on a ``--xla_force_host_platform_device_count`` CPU mesh
(``__graft_entry__.dryrun_multichip`` proves and verifies a real R1CS proof
this way) and scales on a TPU pod mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PSpec
from jax.experimental.shard_map import shard_map

from ..ops.backend import DeviceBackend
from ..ops.field import STORE
from ..ops.curve import point_add, identity_points
from ..ops.msm import msm_chunk_impl, scalars_to_digits


class ShardedMsmBackend(DeviceBackend):
    """DeviceBackend with the point axis of every MSM sharded over a mesh.

    ``mesh`` must have the named axis ``axis`` (default ``"points"``); all
    other backend behaviour (host fallbacks for small circuits, generator
    caching, IPP folds) is inherited.

    Every MSM is dispatched as identity-padded fixed-size chunks so the
    ``shard_map`` graph compiles for exactly ONE shape regardless of the
    proof's MSM size schedule (the prover + IPP + verifier mega-MSM span
    ~10 distinct sizes; per-shape XLA compiles would dominate CPU-mesh
    test time and TPU cold starts alike).  ``window`` sizes the in-kernel
    multiple table: 4 on TPU; the CPU mesh tests pass 2 to keep the
    compiled graph small.
    """

    def __init__(
        self,
        mesh: Mesh,
        axis: str = "points",
        min_device_n: int = 512,
        chunk: int = 1 << 14,
        window: int = 4,
    ):
        super().__init__(min_device_n=min_device_n)
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        assert chunk % self.n_shards == 0
        self.chunk = chunk
        self.window = window

        def sharded_msm(points, digits):
            # per-shard partial over the local point slice
            part = msm_chunk_impl(points, digits, window)  # (4, STORE)
            parts = jax.lax.all_gather(part, axis)  # (n_shards, 4, STORE)
            total = parts[0]
            for i in range(1, self.n_shards):
                total = point_add(total, parts[i])
            return total

        self._sharded_msm = jax.jit(
            shard_map(
                sharded_msm,
                mesh=mesh,
                in_specs=(PSpec(axis), PSpec(axis)),
                out_specs=PSpec(),
                check_rep=False,
            )
        )

    def _msm_dev(self, scalars, dev: jnp.ndarray) -> jnp.ndarray:
        n = dev.shape[0]
        digits = scalars_to_digits(scalars, self.window)
        nwin = digits.shape[1]
        # identity-pad the point axis to a multiple of the chunk size
        # (zero digits select the identity, so padding is free) and
        # dispatch per chunk: one compiled shard_map shape serves every
        # MSM in the engine.
        m = -(-n // self.chunk) * self.chunk
        if m != n:
            pad_pts = jnp.broadcast_to(
                identity_points(()), (m - n, 4, STORE)
            )
            dev = jnp.concatenate([dev, pad_pts], axis=0)
            digits = np.concatenate(
                [digits, np.zeros((m - n, nwin), dtype=np.int32)]
            )
        digits = jnp.asarray(digits)
        total = None
        for off in range(0, m, self.chunk):
            part = self._sharded_msm(
                dev[off : off + self.chunk],
                digits[off : off + self.chunk],
            )
            total = part if total is None else point_add(total, part)
        return total
