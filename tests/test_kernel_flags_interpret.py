"""Real-kernel interpret-mode math for the default-on kernel flags
(VERDICT r4 weak #5): WRAPMSM (two-segment wrap walk), TBLTIER
(half-capacity table walk), FLOTILLA (msm_lane per-chunk totals).

One shared setup (2-chunk gens, w4 tables) drives each kernel at its
minimal geometry under ``pallas_call(interpret=True)`` on CPU, pinned
against the host multiscalar oracle — so a regression in the kernel
indexing/math fails in the default suite, not on hardware at bench time.
PAIRWALK's full-size variant stays in test_pairwalk_interpret (slow);
its step body is the unchanged msm_win body exercised here.
"""

import functools

import numpy as np
import pytest

pytestmark = pytest.mark.kernelmath

from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import multiscalar_mul
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc


@pytest.fixture(scope="module")
def interp(request):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
    for fn in (pc.table_grid_full, pc.table_grid_half, pc.msm_win_dyn,
               pc.msm_lane_dyn):
        fn.clear_cache()

    def fin():
        pl.pallas_call = orig
        for fn in (pc.table_grid_full, pc.table_grid_half, pc.msm_win_dyn,
                   pc.msm_lane_dyn):
            fn.clear_cache()

    request.addfinalizer(fin)
    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend

    n = 2 * ck.CHUNK
    gens = BulletproofGens(n)
    share = gens.share(0)
    be = PallasBackend()
    big = be._gens_big(share, n, "G")
    rng = np.random.RandomState(7)
    rows = scvec.from_wide_bytes(rng.bytes(64 * n))
    return {
        "share": share, "big": big, "rows": rows, "n": n,
        "G": share.G(n), "sc": scvec.to_scalars(rows),
    }


def test_wrapmsm_two_segment_walk(interp):
    """WRAPMSM geometry: ONE msm_win dispatch whose steps [0, split)
    read table chunk poff+j and steps beyond read poff2+(j-split) — the
    IPP R walk's disjoint segments.  v=2, split=1, poff=0, poff2=1 walks
    chunks 0 then 1 through the wrap branch; words chunk j applies to
    walk step j."""
    d = interp
    tbl = ck.table_big(d["big"], 2)
    w = ck.grid_words(d["rows"], 2)
    acc = ck.msm_win(tbl, w, 2, split=1, poff2=1)
    got = ck.fetch_points([acc])[0]
    exp = multiscalar_mul(d["sc"], d["G"])
    assert got.compress() == exp.compress()


def test_tbltier_half_table_walk(interp):
    """TBLTIER geometry: the HALF-capacity table shape (tc = 64) with a
    walk at poff/woff offsets — the tier the combined rounds drop to."""
    d = interp
    half = ck.table_big(d["big"], 2, half=True)
    assert half.shape[-1] == ck.TBL * (ck.GRID_CHUNKS // 2) * pc.LAN_BLOCK
    w = ck.grid_words(d["rows"], 2)
    acc = ck.msm_win(half, w, 1, poff=1, woff=1)
    got = ck.fetch_points([acc])[0]
    exp = multiscalar_mul(
        d["sc"][ck.CHUNK :], d["G"][ck.CHUNK :]
    )
    assert got.compress() == exp.compress()


def test_flotilla_lane_totals(interp):
    """FLOTILLA dispatch shape: msm_lane computes INDEPENDENT per-chunk
    totals landing at lattice positions 0/1 — the packed frozen-round
    walk (chunk 2j = job j's L words, 2j+1 = R words)."""
    d = interp
    wl = ck.grid_words(d["rows"], 2)
    block = ck.msm_lane(d["big"], wl, 2)
    pts = ck.fetch_lane_points(block, 2)
    exp0 = multiscalar_mul(d["sc"][: ck.CHUNK], d["G"][: ck.CHUNK])
    exp1 = multiscalar_mul(d["sc"][ck.CHUNK :], d["G"][ck.CHUNK :])
    assert pts[0].compress() == exp0.compress()
    assert pts[1].compress() == exp1.compress()
