#!/usr/bin/env python3
"""Round-4e TPU session: final steady-state headline with all round-4
optimizations default-on (host heads + fused axpby + PAIRWALK).

  1. stage3 serial warm
  2. B=12 w=3 batch x5 passes (min = steady state)
  3. VSMT-4 B=24 batch (bench stage3b)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(*a):
    print(f"[t{time.time()-T0:7.1f}s]", *a, flush=True)


RESULTS = {}


def record(key, val):
    RESULTS[key] = val
    log("RESULT", key, "=", val)
    with open("/tmp/session_r4e_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


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
record("serial_warm_s", round(serial_dt, 3))

pc_gens, bp_gens, comp, tape = (
    ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
)
from concurrent.futures import ThreadPoolExecutor  # noqa: E402


def _build(_):
    q = Prover(pc_gens, Transcript(b"VSMT"))
    comp.commit_prover(q, ctx["k"], ctx["bits"], ctx["nodes"])
    q.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
    return q


t0 = time.time()
with ThreadPoolExecutor(max_workers=3) as pool:
    provers = list(pool.map(_build, range(12)))
snaps = [q.snapshot() for q in provers]
log(f"built 12 provers in {time.time()-t0:.1f}s")
best = None
for rep in range(5):
    for q, s in zip(provers, snaps):
        q.restore(s)
    t0 = time.time()
    prove_provers(provers, bp_gens, backend=backend, waves=3)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
    log(f"batch B=12 w=3 pass {rep}: {dt:.1f}s = {12/dt:.3f} proofs/s")
record("batch_12x3_s", round(best, 2))
record("batch_12x3_proofs_per_s", round(12 / best, 3))
del provers, snaps

backend.evict_gens()
log("============ VSMT-4 B=24 ============")
try:
    dt4, bdt4, B4 = bench.stage3b_vsmt4(backend)
    record("vsmt4_warm_s", round(dt4, 3))
    if bdt4 is not None:
        record("vsmt4_batch24_proofs_per_s", round(B4 / bdt4, 3))
except Exception as e:
    log(f"stage3b FAILED: {type(e).__name__}: {e}")
log("DONE")
log(json.dumps(RESULTS, indent=1))
