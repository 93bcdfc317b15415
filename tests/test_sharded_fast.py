"""Points-axis sharding of the fast-path MSM structure (VERDICT r4 #3).

``parallel.sharded_fast.ShardedWalkMsm`` shards the production walker's
OWN arrays — the stacked-limb (92, 8, LANES) point layout, the packed
signed-w4 word array, the valid-chunk info contract — over the virtual
8-device CPU mesh, with the per-device partial gather + fold the 8-chip
MSM projection is based on.  The local walk here is the XLA decoder of
the same packed words (``local_walk_xla``; the Pallas local walk cannot
execute on a CPU mesh) — the sharding/clamping/gather/fold structure and
array layouts are exactly the production ones.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bulletproofs_r1cs_gadgets_tpu import BulletproofGens, Scalar
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import multiscalar_mul
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.parallel.mesh import make_mesh
from bulletproofs_r1cs_gadgets_tpu.parallel.sharded_fast import (
    ShardedWalkMsm,
    local_walk_xla,
)
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(8, batch_axis=1, axis_names=("batch", "points"))


@pytest.mark.mesh_slow
def test_sharded_walk_msm_matches_host(mesh):
    """8 devices x 1 chunk each; valid span 5 chunks (so three devices
    walk only zero words and the middle device is partially live via the
    global clamp): total must equal the host MSM over the live lanes."""
    import random

    rnd = random.Random(23)
    total_chunks = 8
    valid = 5
    n_live = valid * ck.CHUNK
    gens = BulletproofGens(total_chunks * ck.CHUNK)
    share = gens.share(0)
    G = share.G(total_chunks * ck.CHUNK)

    big = jnp.concatenate(ck.points_to_chunks(G), axis=2)
    scalars = [Scalar(rnd.randrange(L)) for _ in range(n_live)]
    arr = scvec.from_scalars(scalars)
    words = jnp.asarray(
        np.concatenate(ck.words_chunks(arr, total_chunks, encode="w4"),
                       axis=2)
    )

    sharded = ShardedWalkMsm(
        mesh, axis="points", local_chunks=1, local_walk=local_walk_xla
    )
    got = sharded.msm(big, words, valid)
    exp = multiscalar_mul(scalars, G[:n_live])
    assert got.compress() == exp.compress()


@pytest.mark.mesh_slow
def test_sharded_walk_full_span(mesh):
    """All 8 chunks live (every device fully valid)."""
    import random

    rnd = random.Random(5)
    total_chunks = 8
    n = total_chunks * ck.CHUNK
    gens = BulletproofGens(n)
    share = gens.share(0)
    G = share.G(n)
    big = jnp.concatenate(ck.points_to_chunks(G), axis=2)
    scalars = [Scalar(rnd.randrange(L)) for _ in range(n)]
    words = jnp.asarray(
        np.concatenate(
            ck.words_chunks(scvec.from_scalars(scalars), total_chunks,
                            encode="w4"),
            axis=2,
        )
    )
    sharded = ShardedWalkMsm(
        mesh, axis="points", local_chunks=1, local_walk=local_walk_xla
    )
    got = sharded.msm(big, words, total_chunks)
    exp = multiscalar_mul(scalars, G)
    assert got.compress() == exp.compress()
