#!/usr/bin/env python3
"""Deadline-safe 4096-proof streamed run with verify-as-you-go.

Streams toward the full 4096-proof BASELINE configuration
(gadget_vsmt_2.rs:290 workload) and VERIFIES completed proofs
concurrently in combined-MSM groups on the single-core C++ native
backend (so verification never touches the chip the stream is using).
On SIGTERM/SIGINT or MEGA_DEADLINE_TS (unix seconds) the stream drains
gracefully — in-flight wave groups finish — and MEGA4096.json records
the honest partial: target, completed, verified, aggregate proofs/s,
peak HBM, host-core utilization.

Usage: MEGA_DEADLINE_TS=<epoch> python scratch/mega_stream.py [count]
"""
import json
import os
import queue
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    deadline_ts = float(os.environ.get("MEGA_DEADLINE_TS", 0)) or None
    vgroup = int(os.environ.get("MEGA_VERIFY_GROUP", 128))

    from bulletproofs_r1cs_gadgets_tpu import (
        Prover, Transcript, Verifier, batch_verify,
    )
    from bulletproofs_r1cs_gadgets_tpu.ops.native_backend import (
        NativeBackend, native_available,
    )
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
    from bulletproofs_r1cs_gadgets_tpu.parallel.stream import prove_stream

    backend = PallasBackend()
    t0 = time.time()
    serial_dt, ctx = bench.stage3_vsmt(backend=backend)
    bench.log(f"[mega] warmup {time.time()-t0:.0f}s, serial warm "
              f"{serial_dt:.2f}s")
    pc_gens, bp_gens, comp, tape = (
        ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
    )

    stop = threading.Event()

    def _sig(signum, frame):
        bench.log(f"[mega] signal {signum}: draining stream")
        stop.set()

    signal.signal(signal.SIGTERM, _sig)
    signal.signal(signal.SIGINT, _sig)

    comms_by_idx = {}
    lk = threading.Lock()

    def make_prover(i: int):
        p = Prover(pc_gens, Transcript(b"VSMT"))
        comms = comp.commit_prover(p, ctx["k"], ctx["bits"], ctx["nodes"])
        p.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
        with lk:
            comms_by_idx[i] = comms
        return p

    # ---- concurrent verification on the C++ native backend (host-only)
    vbackend = (
        NativeBackend(threads=2) if native_available() else None
    )
    vq: queue.Queue = queue.Queue()
    vstate = {"verified": 0, "failed": [], "done": False, "vtime": 0.0}

    def verifier_thread():
        pend = []
        while True:
            try:
                item = vq.get(timeout=5)
            except queue.Empty:
                item = "FLUSH" if vstate["done"] else None
            if item == "DONE":
                vstate["done"] = True
                item = "FLUSH"
            if item not in (None, "FLUSH"):
                pend.append(item)
            if pend and (len(pend) >= vgroup or item == "FLUSH"):
                grp, pend = pend, []
                t0 = time.time()
                verifiers, proofs = [], []
                for i, pf in grp:
                    v = Verifier(Transcript(b"VSMT"))
                    comp.commit_verifier(v, comms_by_idx[i], pc_gens)
                    v.load_compiled(tape, comp.num_multipliers)
                    verifiers.append(v)
                    proofs.append(pf)
                try:
                    batch_verify(
                        verifiers, proofs, pc_gens, bp_gens,
                        backend=vbackend,
                    )
                    vstate["verified"] += len(grp)
                except Exception as e:
                    vstate["failed"].append(repr(e))
                vstate["vtime"] += time.time() - t0
                bench.log(
                    f"[mega] verified {vstate['verified']} "
                    f"(+{len(grp)} in {time.time()-t0:.1f}s, native host)"
                )
            if vstate["done"] and not pend and vq.empty():
                return

    vthread = threading.Thread(target=verifier_thread, daemon=True)
    vthread.start()

    last = [time.time()]

    def progress(done, elapsed):
        if deadline_ts and time.time() > deadline_ts and not stop.is_set():
            bench.log("[mega] deadline reached: draining stream")
            stop.set()
        if time.time() - last[0] >= 30:
            last[0] = time.time()
            bench.log(
                f"[mega] streamed {done}/{target} in {elapsed:.0f}s "
                f"({done/elapsed:.3f} proofs/s running, "
                f"{vstate['verified']} verified)"
            )

    t_stream = time.time()
    stream_error = None
    try:
        _, rep = prove_stream(
            make_prover, target, bp_gens, backend=backend,
            wave=int(os.environ.get("BENCH_STREAM_WAVE", 4)),
            inflight=int(os.environ.get("BENCH_INFLIGHT", 12)),
            keep=False,
            on_result=lambda i, pf: vq.put((i, pf)),
            progress=progress,
            stop_event=stop,
        )
    except BaseException as e:  # still write the honest partial artifact
        stream_error = repr(e)
        from bulletproofs_r1cs_gadgets_tpu.parallel.stream import (
            StreamReport,
        )

        rep = StreamReport(
            vstate["verified"], 4, 12, time.time() - t_stream,
            vstate["verified"] / max(1e-9, time.time() - t_stream),
            0.0, 0.0, 0.0, None,
        )
    bench.log(
        f"[mega] stream ended: {rep.count}/{target} proofs in "
        f"{rep.wall_s:.0f}s = {rep.proofs_per_s:.3f} proofs/s"
    )
    vq.put("DONE")
    vthread.join(timeout=1800)

    base = bench._load_local_baseline()
    native_s = base.get("vsmt2_prove_s")
    out = {
        "workload": "VSMT-2 depth-253 (gadget_vsmt_2.rs:290), gens 2^18",
        "target": target,
        "completed": rep.count,
        "verified": vstate["verified"],
        "verify_failures": vstate["failed"],
        "terminated_early": bool(stop.is_set()),
        "stream_error": stream_error,
        "wave": rep.wave,
        "inflight": rep.inflight,
        "wall_seconds": round(rep.wall_s, 1),
        "proofs_per_sec_chip": round(rep.proofs_per_s, 4),
        "verify_wall_seconds_native_host": round(vstate["vtime"], 1),
        "hbm_peak_bytes": rep.hbm_peak_bytes,
        "host_cpu_util": round(rep.cpu_util, 3),
        "host_build_seconds_agg": round(rep.build_s, 1),
        "group_time_p50": round(
            sorted(rep.group_times)[len(rep.group_times) // 2], 2
        ) if rep.group_times else None,
        "native_single_core_prove_s": native_s,
        "vs_single_core_per_chip": round(
            rep.proofs_per_s * native_s, 2
        ) if native_s else None,
        "projected_8chip_vs_single_core": round(
            8 * rep.proofs_per_s * native_s, 2
        ) if native_s else None,
        "target_bar": ">= 50x single-core aggregate on 8 chips "
                      "(BASELINE.md: 0.90 proofs/s aggregate)",
        "serial_warm_prove_s": round(serial_dt, 2),
        "session_note": "degraded chip window 2026-08-20 evening: sync "
                        "RTT ~6x round-4 morning levels (PERF_NOTES "
                        "round-5 session)",
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
