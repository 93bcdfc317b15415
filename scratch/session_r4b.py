#!/usr/bin/env python3
"""Round-4b TPU session: validate the phase-1 host-heads change and
decompose the measured ~1.1 s/proof phase-1 device cost.

  1. stage3 serial warm (compiles everything; serial number w/ host heads)
  2. stage5 equivalence gate — 8 paths byte-identical incl. the native
     C++ CPU prover, which proves the host-head A_I/A_O/S points produce
     byte-identical proofs to the old device-chain heads
  3. phase-1 decomposition: warm phase_commitments x3 isolated;
     msm_win walks at k=71/32; sync overhead
  4. B=12 w=3 batch x2 — headline with host heads + fused axpby
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[t{time.time()-T0:7.1f}s]", *a, flush=True)


RESULTS = {}


def record(key, val):
    RESULTS[key] = val
    log("RESULT", key, "=", val)
    with open("/tmp/session_r4b_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


import bench  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.core import scvec  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck  # noqa: E402
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import (  # noqa: E402
    PallasBackend,
)
from bulletproofs_r1cs_gadgets_tpu.parallel.batch import (  # noqa: E402
    prove_provers,
)

backend = PallasBackend()

# ------------------------------------------------- 1. serial warm
serial_dt, ctx = bench.stage3_vsmt(backend=backend)
record("serial_warm_s", round(serial_dt, 3))

# ------------------------------------------------- 2. equivalence gate
log("============ equivalence gate ============")
try:
    bench.stage5_equiv_gate(backend)
    record("equiv_gate", "OK")
except AssertionError as e:
    record("equiv_gate", f"DIVERGENCE: {e}")
    log("!! DIVERGENCE — aborting before timing stages")
    sys.exit(1)
except Exception as e:  # incidental
    record("equiv_gate", f"error: {type(e).__name__}: {e}")

# ------------------------------------------------- 3. phase-1 probe
log("============ phase-1 decomposition ============")
pc_gens, bp_gens, comp, tape = (
    ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
)
p = Prover(pc_gens, Transcript(b"VSMT"))
comp.commit_prover(p, ctx["k"], ctx["bits"], ctx["nodes"])
p.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
st = p._phase1_state(bp_gens)
args = p._phase1_msm_args(st)
for rep in range(3):
    t0 = time.time()
    backend.phase_commitments_batch([args])
    dt = time.time() - t0
    log(f"phase_commitments x1 rep {rep}: {dt*1e3:.1f} ms")
record("phase1_single_ms", round(dt * 1e3, 1))

gens_share = st["gens"]
n = p.num_multipliers()
k = -(-n // ck.CHUNK)
tG = backend._gens_table(gens_share, n, "G")
tH = backend._gens_table(gens_share, n, "H")
rows = scvec.from_wide_bytes(np.random.RandomState(7).bytes(64 * n))
t0 = time.time()
w = ck.grid_words(rows, k)
t_words = time.time() - t0
log(f"grid_words(n={n}, k={k}) host: {t_words*1e3:.1f} ms")
record("grid_words_ms", round(t_words * 1e3, 1))
for kk in (k, 32, 8, 1):
    for rep in range(3):
        t0 = time.time()
        ck.fetch_points([ck.msm_win(tG, w, kk)])
        dt = time.time() - t0
    log(f"msm_win k={kk} warm: {dt*1e3:.1f} ms")
    record(f"msm_win_k{kk}_ms", round(dt * 1e3, 1))
# chained pair like A_I (G walk -> H walk -> one fetch)
for rep in range(3):
    t0 = time.time()
    ck.fetch_points([ck.msm_win(tH, w, k, chain=ck.msm_win(tG, w, k))])
    dt = time.time() - t0
log(f"A_I-like chained G+H walk (k={k}): {dt*1e3:.1f} ms")
record("phase1_AI_chain_ms", round(dt * 1e3, 1))
# bare sync overhead
for rep in range(3):
    t0 = time.time()
    ck.fetch_points([ck.msm_win(tG, w, 1)])
    dt = time.time() - t0
record("sync_floor_ms", round(dt * 1e3, 1))

# ------------------------------------------------- 4. batch headline
log("============ B=12 w=3 batch ============")
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
for rep in range(3):
    for q, s in zip(provers, snaps):
        q.restore(s)
    t0 = time.time()
    prove_provers(provers, bp_gens, backend=backend, waves=3)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
    log(f"batch B=12 w=3 pass {rep}: {dt:.1f}s = {12/dt:.3f} proofs/s")
record("batch_12x3_s", round(best, 2))
record("batch_12x3_proofs_per_s", round(12 / best, 3))
log("DONE")
log(json.dumps(RESULTS, indent=1))
