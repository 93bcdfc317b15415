"""Interpret-mode equivalence of the paired window walk (msm_win_pair).

The batched prover's combined IPP rounds dispatch BOTH the L and R window
walks through one ``msm_win_pair`` call (``BPTPU_PAIRWALK``, default on;
``ops/pallas_curve._msm_win_pair_kernel``).  The kernel math must match
the pure-host ``multiscalar_mul`` oracle exactly — this test runs the
REAL kernel under ``pallas_call(interpret=True)`` on CPU at the minimal
combined geometry (k = 1: side = 2 chunks, 4,096 lanes per side) and pins
both output points against the host group implementation.

Slow (~1-2 min of interpret-mode execution): run with ``--run-slow``.
The same check passes on hardware via the bench stage-5 nine-path
byte-equivalence gate.
"""

import functools

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_msm_win_pair_matches_host_oracle(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    # (re)import AFTER the patch so kernel call sites bind interpret mode;
    # the modules are already imported in-process, so patch the entry
    # points the wrappers actually call instead: pallas_call is read at
    # call time inside the jitted wrappers only on first trace — clear
    # their jit caches to force a re-trace under interpret mode.
    import jax

    from bulletproofs_r1cs_gadgets_tpu.core import scvec
    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
    from bulletproofs_r1cs_gadgets_tpu.core.ristretto import multiscalar_mul
    from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend

    for fn in (pc.table_grid_full, pc.msm_win_pair_dyn):
        fn.clear_cache()

    k = 1
    C = ck.CHUNK
    n = 4 * k * C
    gens = BulletproofGens(n)
    share = gens.share(0)
    be = PallasBackend()
    big = be._gens_big(share, n, "G")
    tbl = ck.table_big(big, 4 * k)
    rng = np.random.RandomState(11)
    rows = scvec.from_wide_bytes(rng.bytes(64 * n))
    w4k = ck.grid_words(rows, 4 * k)
    pair = ck.msm_win_pair(tbl, w4k, k)
    got = ck.fetch_points([ck.pair_lo(pair), ck.pair_hi(pair)])

    G = share.G(n)
    sc = scvec.to_scalars(rows)
    expL = multiscalar_mul(sc[0 : 2 * C], G[C : 3 * C])
    expR = multiscalar_mul(
        sc[2 * C : 3 * C] + sc[3 * C : 4 * C], G[0:C] + G[3 * C : 4 * C]
    )
    assert got[0].compress() == expL.compress()
    assert got[1].compress() == expR.compress()
    del jax  # silence linters
