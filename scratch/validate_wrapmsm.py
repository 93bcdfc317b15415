#!/usr/bin/env python3
"""TPU validation for the msm_win wrap-around index map (BPTPU_WRAPMSM).

Runs on the real chip only.  Three levels:
  1. kernel-level: a two-segment msm_win vs two chained single-segment
     calls over random words — byte-equal accumulators;
  2. proof-level: depth-8 VSMT-2 proof with WRAPMSM on vs off (same seeded
     rng) — byte-identical proofs;
  3. prints timings (dispatch saving per R walk).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
    from bulletproofs_r1cs_gadgets_tpu.core import scvec
    from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend

    # ---- level 1: kernel equivalence
    n = 8 * ck.CHUNK  # 8 chunks
    gens = BulletproofGens(n)
    backend = PallasBackend()
    table = backend._gens_table(gens.share(0), n, "G")
    rows = scvec.from_wide_bytes(np.random.RandomState(5).bytes(64 * n))
    words = ck.grid_words(rows, 8)
    # (valid, split, poff, poff2) — every table chunk touched must be
    # INITIALIZED (< 8): table_big only writes [0, n_chunks) of the
    # 128-chunk capacity array, and on garbage limbs the Horner /
    # associativity identities the check relies on do not hold.
    # (8,4,4,0) is a true wrap (high segment first); (4,2,0,6) mirrors
    # production's R walk (split=k, poff2=3k with 4k=8 chunks).
    for valid, split, poff, poff2 in (
        (8, 4, 4, 0), (8, 2, 6, 0), (6, 3, 0, 5), (4, 2, 0, 6),
    ):
        assert poff + split <= 8 and poff2 + (valid - split) <= 8
        a = ck.fetch_points([
            ck.msm_win(table, words, valid, poff=poff, split=split,
                       poff2=poff2)
        ])[0]
        b_acc = ck.msm_win(table, words, split, poff=poff)
        b_acc = ck.msm_win(table, words, valid - split, poff=poff2,
                           woff=split, chain=b_acc)
        b = ck.fetch_points([b_acc])[0]
        ok = a == b
        print(f"kernel valid={valid} split={split} poff={poff} "
              f"poff2={poff2}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            sys.exit(1)

    # ---- level 2: proof equivalence (depth-8 VSMT, combined rounds)
    from bulletproofs_r1cs_gadgets_tpu import (
        BulletproofGens as BG, PedersenGens, Prover, Transcript, Verifier,
        Scalar,
    )
    from bulletproofs_r1cs_gadgets_tpu.gadgets.poseidon import PoseidonParams
    from bulletproofs_r1cs_gadgets_tpu.models.compiled import CompiledVSMT2
    from bulletproofs_r1cs_gadgets_tpu.models.vsmt2 import (
        VanillaSparseMerkleTree, leaf_index_bit_scalars,
    )
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pbm

    params = PoseidonParams(6, 4, 4, 140)
    tree = VanillaSparseMerkleTree(params, depth=8)
    for i in range(1, 4):
        tree.update(Scalar(i), Scalar(i))
    k = Scalar(2)
    mp = []
    assert tree.get(k, mp) == k
    bits = [b.v for b in leaf_index_bit_scalars(k, 8)]
    nodes = list(reversed(mp))
    comp = CompiledVSMT2(params, 8, constrain_index_bits=False)
    tape = comp.tape(tree.root)
    aL, aR, aO = comp.witness(k, bits, nodes)
    pc = PedersenGens.default()
    bp = BG(8192)

    def prove(wrap: bool):
        pbm._WRAPMSM = wrap
        pr = Prover(pc, Transcript(b"VSMT"), rng=np.random.RandomState(42))
        comms = comp.commit_prover(pr, k, bits, nodes,
                                   rng=np.random.RandomState(7))
        pr.load_compiled(tape, aL, aR, aO)
        t0 = time.time()
        proof = pr.prove(bp, backend=backend)
        return proof, comms, time.time() - t0

    p_off, comms, t_off = prove(False)
    p_on, _, t_on = prove(True)
    print(f"proof bytes equal: {p_off.to_bytes() == p_on.to_bytes()} "
          f"(off {t_off:.2f}s, on {t_on:.2f}s)")
    if p_off.to_bytes() != p_on.to_bytes():
        sys.exit(1)
    verifier = Verifier(Transcript(b"VSMT"))
    comp.commit_verifier(verifier, comms, pc)
    verifier.load_compiled(tape, comp.num_multipliers)
    verifier.verify(p_on, pc, bp, backend=backend)
    print("VERIFIED — wrap-around msm_win validated")


if __name__ == "__main__":
    main()
