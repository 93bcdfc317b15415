"""Probe batched-prove throughput at larger B (HBM headroom check)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend


def main():
    backend = PallasBackend()
    dt, ctx = bench.stage3_vsmt(backend=backend)
    print(f"serial {dt:.2f}s", file=sys.stderr, flush=True)

    from concurrent.futures import ThreadPoolExecutor

    from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript
    from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_provers

    pc_gens, bp_gens, comp, tape = (
        ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
    )

    def _build(_):
        p = Prover(pc_gens, Transcript(b"VSMT"))
        comp.commit_prover(p, ctx["k"], ctx["bits"], ctx["nodes"])
        p.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
        return p

    for B, waves in [(8, 2), (12, 3), (16, 4), (12, 2)]:
        try:
            with ThreadPoolExecutor(max_workers=3) as pool:
                provers = list(pool.map(_build, range(B)))
            for rep in range(2):
                if rep:
                    with ThreadPoolExecutor(max_workers=3) as pool:
                        provers = list(pool.map(_build, range(B)))
                t0 = time.time()
                prove_provers(provers, bp_gens, backend=backend, waves=waves)
                dt = time.time() - t0
                print(
                    f"B={B} waves={waves} pass {rep}: {dt:.1f}s "
                    f"({B/dt:.3f} proofs/s)",
                    file=sys.stderr, flush=True,
                )
        except Exception as e:
            print(f"B={B} waves={waves} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            break


if __name__ == "__main__":
    main()
