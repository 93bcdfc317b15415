#!/usr/bin/env python3
"""Round-5 A/B: W5 shared-table walker + S=1024 frozen tail.

One process, machine otherwise idle (CPU contention invalidates batch
passes — PERF_NOTES measurement hygiene).

Stages:
  1. serial warm VSMT-2 prove (compiles every kernel incl. w5) + VERIFY
  2. bench.stage5_equiv_gate — now includes the pallas(W5=0) combo:
     seeded-rng byte equivalence across native C++ / all kernel flag
     combos / w4 vs w5 shared tables / flotilla batch
  3. B=12 w=3 x3 passes with W5 ON
  4. evict + flip to W5 OFF (w4 shared tables), x3 passes
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
    print(f"[t{time.time()-T0:7.1f}s]", *a, flush=True)


import bench  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pb  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.parallel.batch import (  # noqa: E402
    prove_provers,
)

backend = pb.PallasBackend()
log("W5 default:", pb._W5)
serial_dt, ctx = bench.stage3_vsmt(backend=backend)
log("serial warm (W5 on)", f"{serial_dt:.2f}s")

log("=== stage5 equivalence gate (incl W5=0 combo) ===")
backend.evict_gens()
bench.stage5_equiv_gate(backend)
backend.evict_gens()

pc_gens, bp_gens, comp, tape = (
    ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
)

from concurrent.futures import ThreadPoolExecutor  # noqa: E402


def _build(_):
    p = Prover(pc_gens, Transcript(b"VSMT"))
    comp.commit_prover(p, ctx["k"], ctx["bits"], ctx["nodes"])
    p.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
    return p


t0 = time.time()
with ThreadPoolExecutor(max_workers=3) as pool:
    provers = list(pool.map(_build, range(12)))
snaps = [p.snapshot() for p in provers]
log(f"built 12 provers in {time.time()-t0:.1f}s")


def run(tag, passes=3):
    best = 1e9
    for rep in range(passes):
        for pr, s in zip(provers, snaps):
            pr.restore(s)
        t0 = time.time()
        prove_provers(provers, bp_gens, backend=backend, waves=3)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"{tag} pass {rep}: {dt:.1f}s = {12/dt:.3f} proofs/s")
    log(f"{tag} best: {best:.1f}s = {12/best:.3f} proofs/s")


# warm the 2^18 w5 tables once (evicted above for the gate)
provers[0].restore(snaps[0])
prove_provers(provers[:1], bp_gens, backend=backend)
run("W5=1", passes=3)
pb._W5 = False
backend.evict_gens()
# warm the w4 tables + shapes once before timed passes
provers[0].restore(snaps[0])
prove_provers(provers[:1], bp_gens, backend=backend)
run("W5=0", passes=3)
log("done")
