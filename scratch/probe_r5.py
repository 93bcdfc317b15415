"""Round-5 probe: queued per-dispatch overhead decomposition.

Everything here is measured in a queued stream (N dispatches queued
asynchronously, ONE final fetch) because that is what the batched prover
pays.  Goal: decide how much a cross-job "convoy" kernel (merging a
wave's same-round dispatches into one multi-segment dispatch) can save.

Questions:
  Q1  marginal cost of a queued msm_win dispatch at k=1 (pure fixed)
      vs k=8 (fixed + walk) -- and how it scales with queue depth.
  Q2  msm_win_pair(k) vs 2x msm_win(2k... same total chunks): per-extra-
      segment cost inside ONE dispatch (Horner+reduce per output).
  Q3  msm_lane marginal per chunk (the flotilla economics).
  Q4  fold_big_c / table_big queued marginals.
  Q5  a tiny jitted XLA op's queued marginal (pure dispatch/RPC floor).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L

N = 1 << 16  # 32-chunk working set is enough for marginals
K = N // ck.CHUNK


def t_q(label, fn, reps=8, fetch=None):
    """Queued-stream marginal: queue `reps` dispatches, one final sync."""
    fetch = fetch or (lambda accs: ck.fetch_points(accs[-1:]))
    fn()  # compile
    fetch([fn()])  # warm
    t0 = time.time()
    accs = [fn() for _ in range(reps)]
    fetch(accs)
    dt = (time.time() - t0) / reps
    print(f"{label:42s}: {dt * 1e3:8.2f} ms/dispatch (reps={reps})",
          flush=True)
    return dt


def main():
    import random

    rnd = random.Random(11)
    t0 = time.time()
    gens = BulletproofGens(N)
    b = PallasBackend()
    share = gens.share(0)
    tG = b._gens_table(share, N, "G")
    print(f"setup (gens+table) {time.time() - t0:.1f}s", flush=True)

    sc = scvec.from_scalars([Scalar(rnd.randrange(L)) for _ in range(N)])
    w = ck.grid_words(sc, K)

    # Q5: pure dispatch floor -- a trivial jitted XLA op on a small array
    import jax

    small = jnp.zeros((92, 8, 256), jnp.int32)

    @jax.jit
    def nop(x):
        return x + 1

    t_q("xla nop (92,8,256)", lambda: nop(small), reps=32,
        fetch=lambda accs: np.asarray(accs[-1]))
    t_q("xla pair_cat (2x753KB)",
        lambda: ck._pair_cat(small, small), reps=32,
        fetch=lambda accs: np.asarray(accs[-1]))

    # Q1: msm_win fixed vs walk, and queue-depth dependence
    for reps in (4, 16):
        t_q(f"msm_win k=1 (reps={reps})",
            lambda: ck.msm_win(tG, w, 1), reps=reps)
    t_q("msm_win k=4", lambda: ck.msm_win(tG, w, 4))
    t_q("msm_win k=8", lambda: ck.msm_win(tG, w, 8))
    t_q("msm_win k=16", lambda: ck.msm_win(tG, w, 16))
    t_q("msm_win k=32", lambda: ck.msm_win(tG, w, 32))

    # Q2: pair kernel = 2 segments in one dispatch.  msm_win_pair(k)
    # walks 4k chunks split into two 2k-chunk segments (2 Horners).
    def fetch_pair(accs):
        ck.fetch_points([ck.pair_lo(accs[-1]), ck.pair_hi(accs[-1])])

    t_q("msm_win_pair k=1 (2 seg x 2 chunks)",
        lambda: ck.msm_win_pair(tG, w, 1), fetch=fetch_pair)
    t_q("msm_win_pair k=4 (2 seg x 8 chunks)",
        lambda: ck.msm_win_pair(tG, w, 4), fetch=fetch_pair)
    t_q("msm_win_pair k=8 (2 seg x 16 chunks)",
        lambda: ck.msm_win_pair(tG, w, 8), fetch=fetch_pair)

    # Q3: msm_lane marginal per chunk (w4 per-lane ladder per chunk)
    big = b._gens_big(share, N, "G")
    wl = ck.grid_words(sc, K)

    def fetch_lane(accs):
        ck.fetch_lane_points(accs[-1], 2)

    t_q("msm_lane v=2", lambda: ck.msm_lane(big, wl, 2), fetch=fetch_lane)
    t_q("msm_lane v=8", lambda: ck.msm_lane(big, wl, 8), fetch=fetch_lane)
    t_q("msm_lane v=16", lambda: ck.msm_lane(big, wl, 16),
        fetch=fetch_lane)

    # Q4: fold + table queued marginals at convoy-relevant sizes
    cA, cB = Scalar(rnd.randrange(L)), Scalar(rnd.randrange(L))
    st = {"arr": ck.fold_big_c(big, K // 2, 5000, cA, cB, donate=False)}

    def foldv(v):
        st["arr"] = ck.fold_big_c(st["arr"], v, 5000, cA, cB, donate=True)
        return ck.big_chunk0(st["arr"])

    t_q("fold_big_c v=2", lambda: foldv(2))
    t_q("fold_big_c v=8", lambda: foldv(8))
    t_q("fold_big_c v=16", lambda: foldv(16))

    tb = {"t": ck.table_big(big, 8, half=True)}

    def tabv(v):
        tb["t"] = ck.table_big(big, v, half=True, old=tb["t"])
        return ck.big_chunk0(tb["t"])

    t_q("table_big half v=2", lambda: tabv(2))
    t_q("table_big half v=8", lambda: tabv(8))
    t_q("table_big half v=16", lambda: tabv(16))

    # ladder chunk for reference
    pts = ck.limbs_to_chunks(
        np.asarray(ck._ident_limbs(ck.CHUNK))
    )[0]
    wd = ck.words_chunks(sc[: ck.CHUNK], 1, encode="w4")[0]
    t_q("msm_chunk_acc_w4 (1 chunk ladder)",
        lambda: ck.msm_chain([pts], [wd]))

    print("done", flush=True)


if __name__ == "__main__":
    main()
