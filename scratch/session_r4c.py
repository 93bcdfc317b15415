#!/usr/bin/env python3
"""Round-4c TPU session: validate BPTPU_PAIRWALK (combined-round L+R in
one msm_win_pair dispatch) and measure its batch effect.

  1. stage3 serial warm (compiles)
  2. stage5 equivalence gate (now includes the PAIRWALK=1 combo)
  3. B=12 w=3 batch: PAIRWALK off x2 (control), on x3 — min of each
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
    with open("/tmp/session_r4c_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


import bench  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pbm  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import (  # noqa: E402
    PallasBackend,
)
from bulletproofs_r1cs_gadgets_tpu.parallel.batch import (  # noqa: E402
    prove_provers,
)

backend = PallasBackend()
serial_dt, ctx = bench.stage3_vsmt(backend=backend)
record("serial_warm_s", round(serial_dt, 3))

log("============ equivalence gate (incl. PAIRWALK) ============")
try:
    bench.stage5_equiv_gate(backend)
    record("equiv_gate", "OK")
except AssertionError as e:
    record("equiv_gate", f"DIVERGENCE: {e}")
    log("!! DIVERGENCE — aborting")
    sys.exit(1)
except Exception as e:
    record("equiv_gate", f"error: {type(e).__name__}: {e}")

log("============ B=12 w=3: pairwalk off vs on ============")
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


def run(tag, passes):
    best = None
    for rep in range(passes):
        for q, s in zip(provers, snaps):
            q.restore(s)
        t0 = time.time()
        prove_provers(provers, bp_gens, backend=backend, waves=3)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        log(f"{tag} pass {rep}: {dt:.1f}s = {12/dt:.3f} proofs/s")
    record(f"batch_{tag}_s", round(best, 2))
    record(f"batch_{tag}_proofs_per_s", round(12 / best, 3))
    return best


saved = pbm._PAIRWALK
pbm._PAIRWALK = False
off = run("pairwalk_off", 3)
pbm._PAIRWALK = True
on = run("pairwalk_on", 3)
pbm._PAIRWALK = saved
record("pairwalk_speedup", round(off / on, 3))
log("DONE")
log(json.dumps(RESULTS, indent=1))
