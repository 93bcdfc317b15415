"""Per-kernel device-time microbenchmark on the real chip.

Measures steady-state per-dispatch cost of each kernel class used by a
warm VSMT-2 prove (n = 2^18), then prints the modelled per-proof device
split.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L

N = 1 << 18
K = N // ck.CHUNK  # 128


def t_it(label, fn, reps=4):
    fn()  # compile + warm
    ck.fetch_points([fn()])
    t0 = time.time()
    accs = [fn() for _ in range(reps)]
    ck.fetch_points(accs[-1:])
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import random
    rnd = random.Random(7)
    gens = BulletproofGens(N)
    b = PallasBackend()
    share = gens.share(0)
    big = b._gens_big(share, N, "G")
    tG = b._gens_table(share, N, "G")
    sc = scvec.from_scalars([Scalar(rnd.randrange(L)) for _ in range(N)])
    w_full = ck.grid_words(sc, K)
    w_half = ck.grid_words(sc[: N // 2], K // 2)

    # --- window-accumulator walks
    d_win128 = t_it("msm_win k=128", lambda: ck.msm_win(tG, w_full, K))
    d_win64 = t_it("msm_win k=64", lambda: ck.msm_win(tG, w_half, K // 2))
    d_win32 = t_it("msm_win k=32", lambda: ck.msm_win(tG, w_half, K // 4))
    d_win1 = t_it("msm_win k=1", lambda: ck.msm_win(tG, w_half, 1))

    # --- constant-scalar fold (owned copy so donate path mirrors prod)
    cA, cB = Scalar(rnd.randrange(L)), Scalar(rnd.randrange(L))
    st = {"arr": ck.fold_big_c(big, K // 2, 5000, cA, cB, donate=False)}

    def fold64():
        st["arr"] = ck.fold_big_c(st["arr"], K // 2, 5000, cA, cB,
                                  donate=True)
        return st["arr"][:, :, :256]

    d_fold64 = t_it("fold_big_c k=64", fold64)

    def fold32():
        st["arr"] = ck.fold_big_c(st["arr"], K // 4, 5000, cA, cB,
                                  donate=True)
        return st["arr"][:, :, :256]

    d_fold32 = t_it("fold_big_c k=32", fold32)

    def fold1():
        st["arr"] = ck.fold_big_c(st["arr"], 1, 500, cA, cB, donate=True)
        return st["arr"][:, :, :256]

    d_fold1 = t_it("fold_big_c k=1", fold1)

    # --- half-table prepass
    tbl = {"t": ck.table_big(st["arr"], K // 2, half=True)}

    def prep64():
        tbl["t"] = ck.table_big(st["arr"], K // 2, half=True, old=tbl["t"])
        return tbl["t"][:, :, :256]

    d_prep64 = t_it("table_big half k=64", prep64)

    def prep8():
        tbl["t"] = ck.table_big(st["arr"], 8, half=True, old=tbl["t"])
        return tbl["t"][:, :, :256]

    d_prep8 = t_it("table_big half k=8", prep8)

    # --- single-chunk ladder (Q chains / msm_chain)
    qw = ck.single_scalar_words(cA)
    qc = big[:, :, :256]
    d_chunk = t_it("msm_chunk_acc_w4 (1 chunk)",
                   lambda: ck.msm_chunk_acc_w4_probe(qc, qw)
                   if hasattr(ck, "msm_chunk_acc_w4_probe")
                   else ck.msm_chain([qc], [qw]))

    # --- tail fold (bit-serial single chunk)
    ones = np.tile(scvec.scalar_to_row(Scalar.one()), (512, 1))
    cs = np.tile(scvec.scalar_to_row(cA), (512, 1))
    d_tail = t_it("tail_fold n=512",
                  lambda: ck.tail_fold(qc, 512, ones, cs))

    # ---------------- model a warm VSMT-2 prove (n = 2^18, 18 IPP rounds)
    # phase 1: 5 full msm_win walks (aL,aR on A_I; aO on A_O; sL,sR on S)
    phase1 = 5 * d_win128
    # per-round walks: 4 * msm_win(k) for k = 64, 32, ..., 1 (rounds 1-7),
    # then tail rounds use packed single chunks (2 chunk ladders per round)
    walk = 0.0
    k = K // 2
    per_chunk_win = (d_win64 - d_win1) / 63  # marginal per chunk
    while k >= 1:
        walk += 4 * (d_win1 + per_chunk_win * (k - 1))
        k //= 2
    walk += 2 * 2 * d_chunk * 11  # 11 tail rounds, L/R each 2 chain steps
    # folds: k = 64, 32, ..., 1 for G and H
    per_chunk_fold = (d_fold64 - d_fold1) / 63
    fold = 0.0
    k = K // 2
    while k >= 1:
        fold += 2 * (d_fold1 + per_chunk_fold * (k - 1))
        k //= 2
    fold += 2 * 11 * d_tail  # tail folds
    # prepasses: rounds with n >= 2*CHUNK: k = 64, 32, ..., 2
    per_chunk_prep = (d_prep64 - d_prep8) / 56
    base_prep = d_prep8 - 8 * per_chunk_prep
    prep = 0.0
    k = K // 2
    while k >= 2:
        prep += 2 * (base_prep + per_chunk_prep * k)
        k //= 2
    total = phase1 + walk + fold + prep
    print(f"\nmodelled per-proof device time: {total:.2f}s")
    print(f"  phase1 walks : {phase1:.2f}s")
    print(f"  IPP L/R walks: {walk:.2f}s")
    print(f"  gen folds    : {fold:.2f}s")
    print(f"  table prepass: {prep:.2f}s")


if __name__ == "__main__":
    main()
