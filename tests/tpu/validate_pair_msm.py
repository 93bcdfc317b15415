"""On-TPU validation of the fused pair grid MSM (pallas_curve.msm_grid_pair)
against the proven single-walk grid kernel and a small host oracle.

Run manually on the TPU host:  python tests/tpu/validate_pair_msm.py
(Not collected by pytest - the fast suite pins JAX to CPU where the Mosaic
kernels cannot run; grid ROUTING can only be exercised on hardware.)
"""

import random
import time

import numpy as np

from bulletproofs_r1cs_gadgets_tpu.core.ristretto import RistrettoPoint
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L

rnd = random.Random(7)
CHUNK = ck.CHUNK


def rand_rows(m):
    return np.stack(
        [scvec.scalar_to_row(Scalar(rnd.randrange(L))) for _ in range(m)]
    )


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def main():
    k = 2  # chunks per half -> n = 4096 points per half
    n = k * CHUNK
    B = RistrettoPoint.basepoint()
    # distinct small multiples of B: cheap to build, still "random" points
    mults = [rnd.randrange(1, 1 << 20) for _ in range(2 * n)]
    pts = [B.scalar_mul(Scalar(m)) for m in mults]
    log(f"built {2*n} host points")
    big = ck.chunks_to_big(ck.points_to_chunks(pts))

    sc_lo = rand_rows(n)
    sc_hi = rand_rows(n)
    words = ck.grid_words(np.concatenate([sc_lo, sc_hi]), 2 * k)
    log("uploads done; dispatching pair kernel (cold compile)")

    t0 = time.time()
    pair = ck.msm_grid_pair(big, words, k)
    lo, hi = ck.fetch_points([ck.pair_lo(pair), ck.pair_hi(pair)])
    log(f"pair walk + fetch: {time.time()-t0:.1f}s (incl. compile)")

    # reference: the proven single grid MSM over each half
    ref_lo_acc = ck.msm_grid(big, ck.grid_words(sc_lo, k), k)
    ref_hi_acc = ck.msm_grid(
        big, ck.grid_words(sc_hi, k), k, offset=k
    )
    ref_lo, ref_hi = ck.fetch_points([ref_lo_acc, ref_hi_acc])
    assert lo == ref_lo, "pair low half != grid MSM"
    assert hi == ref_hi, "pair high half != grid MSM"
    log("pair == single grid MSM on both halves")

    # host oracle on a tiny slice: zero all but the first 8 scalars/half
    sc_lo_z = sc_lo.copy()
    sc_lo_z[8:] = 0
    sc_hi_z = sc_hi.copy()
    sc_hi_z[8:] = 0
    words_z = ck.grid_words(np.concatenate([sc_lo_z, sc_hi_z]), 2 * k)
    pair_z = ck.msm_grid_pair(big, words_z, k, lo_limit=1, hi_limit=1)
    lo_z, hi_z = ck.fetch_points([ck.pair_lo(pair_z), ck.pair_hi(pair_z)])

    def host_msm(scs, offset):
        acc = RistrettoPoint.identity()
        for i in range(8):
            s = Scalar(int.from_bytes(scs[i].tobytes(), "little") % L)
            acc = acc + pts[offset + i].scalar_mul(s)
        return acc

    assert lo_z == host_msm(sc_lo_z, 0), "pair low != host oracle"
    assert hi_z == host_msm(sc_hi_z, n), "pair high != host oracle"
    log("pair (with lo/hi limits) == host oracle")

    # chained accumulators: acc_lo/acc_hi seeds must add in
    seed = ck.msm_grid(big, ck.grid_words(sc_hi, k), k)  # arbitrary point
    pair_c = ck.msm_grid_pair(
        big, words, k, acc_lo=seed, acc_hi=seed
    )
    lo_c, hi_c = ck.fetch_points([ck.pair_lo(pair_c), ck.pair_hi(pair_c)])
    seed_pt = ck.fetch_points([seed])[0]
    assert lo_c == ref_lo + seed_pt, "low chain accumulator broken"
    assert hi_c == ref_hi + seed_pt, "high chain accumulator broken"
    log("chained accumulators OK")
    log("ALL PAIR-MSM CHECKS PASSED")


if __name__ == "__main__":
    main()
