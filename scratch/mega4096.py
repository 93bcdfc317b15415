#!/usr/bin/env python3
"""The BASELINE 4096-proof configuration, run for real on one chip.

Streams 4096 template-stamped VSMT-2 provers (depth 253, 143,704
multipliers, gens 2^18 — the reference's gadget_vsmt_2.rs:290 workload)
through prove_stream with 12 proofs' device state in flight, verifies
every proof in combined mega-MSM groups, and writes MEGA4096.json with
aggregate proofs/s, wall time, peak HBM, and host-core utilization.

Run with the machine otherwise idle (CPU contention depresses the
batch 1.5-2x — PERF_NOTES measurement hygiene).  ~2h at ~0.55 proofs/s.

Usage: python scratch/mega4096.py [count]  (default 4096)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend

    backend = PallasBackend()
    t0 = time.time()
    serial_dt, ctx = bench.stage3_vsmt(backend=backend)
    bench.log(f"[mega] warmup done in {time.time()-t0:.0f}s, "
              f"serial warm {serial_dt:.2f}s")

    rep, vdt = bench.stage6_stream(
        ctx, backend, B=count,
        wave=int(os.environ.get("BENCH_STREAM_WAVE", 4)),
        inflight=int(os.environ.get("BENCH_INFLIGHT", 12)),
        verify_group=int(os.environ.get("BENCH_STREAM_VERIFY_GROUP", 128)),
    )

    base = bench._load_local_baseline()
    native_s = base.get("vsmt2_prove_s")
    out = {
        "workload": "VSMT-2 depth-253 (gadget_vsmt_2.rs:290), gens 2^18",
        "count": rep.count,
        "wave": rep.wave,
        "inflight": rep.inflight,
        "wall_seconds": round(rep.wall_s, 1),
        "proofs_per_sec_chip": round(rep.proofs_per_s, 4),
        "verify_seconds": round(vdt, 1),
        "hbm_peak_bytes": rep.hbm_peak_bytes,
        "host_cpu_util": round(rep.cpu_util, 3),
        "host_build_seconds_agg": round(rep.build_s, 1),
        "group_time_p50": round(
            sorted(rep.group_times)[len(rep.group_times) // 2], 2
        ) if rep.group_times else None,
        "group_time_max": round(max(rep.group_times), 2)
        if rep.group_times else None,
        "native_single_core_prove_s": native_s,
        "vs_single_core_per_chip": round(
            rep.proofs_per_s * native_s, 2
        ) if native_s else None,
        "projected_8chip_vs_single_core": round(
            8 * rep.proofs_per_s * native_s, 2
        ) if native_s else None,
        "target": ">= 50x single-core aggregate on 8 chips "
                  "(BASELINE.md: 0.90 proofs/s aggregate)",
        "serial_warm_prove_s": round(serial_dt, 2),
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MEGA4096.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    bench.log(f"[mega] wrote {path}")


if __name__ == "__main__":
    main()
