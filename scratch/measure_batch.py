#!/usr/bin/env python3
"""Round-4 batch-phase breakdown: where do the ~2.2 s/proof go at B=12?

Runs bench stage3 (serial warm VSMT-2 — compiles every kernel), then
timed batch passes under BPTPU_TIMING=1:

  A. B=12 waves=3 (bench default) x2  — pass 0 warms batch-only kernels
  B. B=12 waves=1 (single lockstep pipeline; cleanest attribution:
     pair_sync is then the true device wait per round-sum)
  C. B=12 waves=2
  D. B=16 waves=4 inflight=16 (TBLTIER HBM-headroom probe; last — OOM risk)

[timing:ipp] stderr lines per wave carry pair_sync / pair_dispatch /
ipp_host_scalars / ipp_host_folds / fold_dispatch / phase1_* totals.
"""
import os
import sys
import time

os.environ.setdefault("BPTPU_TIMING", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
    print(f"[t{time.time()-T0:7.1f}s]", *a, flush=True)


import bench  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import (  # noqa: E402
    PallasBackend,
)
from bulletproofs_r1cs_gadgets_tpu.parallel.batch import (  # noqa: E402
    prove_provers,
)

backend = PallasBackend()
serial_dt, ctx = bench.stage3_vsmt(backend=backend)
log("serial warm", serial_dt)

from concurrent.futures import ThreadPoolExecutor  # noqa: E402

pc_gens, bp_gens, comp, tape = (
    ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
)


def _build(_):
    p = Prover(pc_gens, Transcript(b"VSMT"))
    comp.commit_prover(p, ctx["k"], ctx["bits"], ctx["nodes"])
    p.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
    return p


t0 = time.time()
with ThreadPoolExecutor(max_workers=3) as pool:
    provers = list(pool.map(_build, range(16)))
snaps = [p.snapshot() for p in provers]
log(f"built 16 provers in {time.time()-t0:.1f}s")


def run(tag, B, waves, inflight=None, passes=1):
    for rep in range(passes):
        for p, s in zip(provers[:B], snaps[:B]):
            p.restore(s)
        t0 = time.time()
        prove_provers(
            provers[:B], bp_gens, backend=backend, waves=waves,
            inflight=inflight,
        )
        dt = time.time() - t0
        log(
            f"{tag} B={B} w={waves} i={inflight or B} pass {rep}: "
            f"{dt:.1f}s = {B/dt:.3f} proofs/s"
        )


run("A", 12, 3, passes=2)
run("B", 12, 1)
run("C", 12, 2)
run("D", 16, 4, inflight=16)
log("DONE")
