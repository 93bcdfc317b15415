#!/usr/bin/env python3
"""Round-4 batched-proving probe (real chip): timing breakdown + B/waves
sweep for the VSMT-2 workload, to locate the device-op vs bubble split.

Usage:  BPTPU_TIMING=1 python scratch/probe_batch_r4.py "12:3,16:4,20:5"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sweep = [
        tuple(int(x) for x in item.split(":"))
        for item in (sys.argv[1] if len(sys.argv) > 1 else "12:3,16:4").split(",")
    ]
    import bench
    from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
    from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_provers

    backend = PallasBackend()
    dt, ctx = bench.stage3_vsmt(backend=backend)
    log(f"serial warm {dt:.2f}s")
    pc_gens, bp_gens, comp, tape = (
        ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
    )

    from concurrent.futures import ThreadPoolExecutor

    def build(_):
        p = Prover(pc_gens, Transcript(b"VSMT"))
        comp.commit_prover(p, ctx["k"], ctx["bits"], ctx["nodes"])
        p.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
        return p

    Bmax = max(b for b, _ in sweep)
    with ThreadPoolExecutor(max_workers=3) as pool:
        provers = list(pool.map(build, range(Bmax)))
    snaps = [p.snapshot() for p in provers]

    for B, waves in sweep:
        for rep in range(2):
            for p, s in zip(provers[:B], snaps[:B]):
                p.restore(s)
            t0 = time.time()
            prove_provers(provers[:B], bp_gens, backend=backend, waves=waves)
            el = time.time() - t0
            log(f"B={B} waves={waves} rep={rep}: {el:.1f}s total, "
                f"{el/B:.2f}s/proof, {B/el:.3f} proofs/s")


if __name__ == "__main__":
    main()
