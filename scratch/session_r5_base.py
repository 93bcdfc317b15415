#!/usr/bin/env python3
"""Round-5 session baseline: B=12 w=3 batch with phase timing, 3 passes.

Establishes THIS session's reference number before convoy work, plus the
[timing:ipp] attribution (pair_sync vs dispatch vs host)."""
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
    provers = list(pool.map(_build, range(12)))
snaps = [p.snapshot() for p in provers]
log(f"built 12 provers in {time.time()-t0:.1f}s")


def run(tag, B, waves, inflight=None, passes=3):
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


run("BASE", 12, 3, passes=3)
log("done")
