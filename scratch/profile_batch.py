"""Profile batched VSMT-2 proving: phase breakdown + waves sweep."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("BPTPU_TIMING", "1")

import bench  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.utils.metrics import METRICS  # noqa: E402


def main():
    backend = PallasBackend()
    dt, ctx = bench.stage3_vsmt(backend=backend)
    print(f"serial warm prove {dt:.2f}s", file=sys.stderr, flush=True)

    from concurrent.futures import ThreadPoolExecutor

    from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript
    from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_provers

    pc_gens, bp_gens, comp, tape = (
        ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
    )

    def _build(_):
        prover = Prover(pc_gens, Transcript(b"VSMT"))
        comp.commit_prover(prover, ctx["k"], ctx["bits"], ctx["nodes"])
        prover.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
        return prover

    for B, waves in [(8, 2), (8, 4), (8, 1)]:
        with ThreadPoolExecutor(max_workers=7) as pool:
            provers = list(pool.map(_build, range(B)))
        METRICS.reset()
        t0 = time.time()
        prove_provers(provers, bp_gens, backend=backend, waves=waves)
        total = time.time() - t0
        snap = METRICS.snapshot()
        print(
            f"== B={B} waves={waves}: {total:.2f}s total, "
            f"{total/B:.2f}s/proof, {B/total:.3f} proofs/s",
            file=sys.stderr, flush=True,
        )
        print(json.dumps(snap["timers_s"], indent=1, sort_keys=True),
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
