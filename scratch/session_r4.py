#!/usr/bin/env python3
"""Round-4 TPU session, ONE process (remote compiles do not persist across
processes — PERF_NOTES #5 — and are slow today, so everything shares one
warm kernel set).

Order (cheap validation first, heaviest sweep in the middle, extra-compile
steps last):
  1. wrap-around msm_win kernel equivalence (3 split geometries)
  2. bench stage2 (Poseidon 2:1) + stage3 (serial VSMT-2) — warm numbers
  3. batched VSMT-2 sweep: flag A/B (TBLTIER/FLOTILLA/WRAPMSM) + B/waves
  4. bench stage3b (VSMT-4 depth-128)
  5. bench stage5 equivalence gate (ladder + native paths byte-equal)
  6. roofline ceilings (new kernel compiles; documentation numbers)

Usage: python scratch/session_r4.py [sweep]
  sweep default "12:3,16:4,24:6" as B:waves pairs.
Every section prints [tNNNNs] wall marks; safe to read partial logs.
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


def section(name):
    log("=" * 12, name, "=" * 12)


RESULTS = {}


def record(key, val):
    RESULTS[key] = val
    log("RESULT", key, "=", val)
    with open("/tmp/session_r4_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    sweep = [
        tuple(int(x) for x in item.split(":"))
        for item in (
            sys.argv[1] if len(sys.argv) > 1 else "12:3,16:4,24:6"
        ).split(",")
    ]
    # which sections to run, e.g. "23" = serial + sweep only
    sections = sys.argv[2] if len(sys.argv) > 2 else "123456"

    import bench
    from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript
    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
    from bulletproofs_r1cs_gadgets_tpu.core import scvec
    from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pbm
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
    from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_provers

    backend = PallasBackend()

    # ---------------------------------------------- 1. wrapmsm kernel check
    def section1():
        section("1. wrap-around msm_win kernel equivalence")
        n = 8 * ck.CHUNK
        gens8 = BulletproofGens(n)
        t0 = time.time()
        table = backend._gens_table(gens8.share(0), n, "G")
        rows = scvec.from_wide_bytes(np.random.RandomState(5).bytes(64 * n))
        words = ck.grid_words(rows, 8)
        # (valid, split, poff, poff2): every table chunk touched must be
        # INITIALIZED (< 8) — table_big only writes [0, n_chunks); capacity
        # is 128 chunks so out-of-range reads hit garbage limbs for which
        # the Horner/associativity identities do NOT hold (an earlier run
        # compared garbage and "failed").  (8,4,4,0) is the true wrap
        # shape; (4,2,0,6) mirrors production's R walk (split=k, poff2=3k
        # with 4k=8 chunks).
        ok_all = True
        for valid, split, poff, poff2 in (
            (8, 4, 4, 0), (8, 2, 6, 0), (6, 3, 0, 5), (4, 2, 0, 6),
        ):
            assert poff + split <= 8 and poff2 + (valid - split) <= 8
            a = ck.fetch_points([
                ck.msm_win(table, words, valid, poff=poff, split=split,
                           poff2=poff2)
            ])[0]
            b_acc = ck.msm_win(table, words, split, poff=poff)
            b_acc = ck.msm_win(table, words, valid - split, poff=poff2,
                               woff=split, chain=b_acc)
            b = ck.fetch_points([b_acc])[0]
            ok = a == b
            ok_all = ok_all and ok
            log(f"kernel valid={valid} split={split} poff={poff} "
                f"poff2={poff2}: {'OK' if ok else 'MISMATCH'}")
        record("wrapmsm_kernel_ok", ok_all)
        log(f"(section incl. first msm_win compiles: {time.time()-t0:.0f}s)")
        return ok_all

    wrap_ok = section1() if "1" in sections else True
    backend.evict_gens()  # free the section-1 gens table (~0.9 GB HBM)

    # ---------------------------------------------- 2. serial stage2+3
    section("2. Poseidon 2:1 + serial VSMT-2 (warm)")
    warm2, _total2 = bench.stage2_poseidon(backend)
    record("poseidon2_warm_prove_s", round(warm2, 3))
    backend.evict_gens()  # free the 2048-gens arrays before the big tree
    dt3, ctx = bench.stage3_vsmt(backend=backend)
    record("vsmt2_serial_warm_s", round(dt3, 3))
    if "3" in sections:
        # ---------------------------------------------- 3. batched sweep
        section("3. batched VSMT-2 sweep")
        pc_gens, bp_gens, comp, tape = (
            ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
        )
        from concurrent.futures import ThreadPoolExecutor

        def build(_):
            p = Prover(pc_gens, Transcript(b"VSMT"))
            comp.commit_prover(p, ctx["k"], ctx["bits"], ctx["nodes"])
            p.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
            return p

        Bmax = max(pt[0] for pt in sweep)
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=3) as pool:
            provers = list(pool.map(build, range(Bmax)))
        snaps = [p.snapshot() for p in provers]
        log(f"built {Bmax} provers in {time.time()-t0:.0f}s")

        def run_batch(B, waves, inflight=None, reps=2):
            best = None
            for rep in range(reps):
                for p, s in zip(provers[:B], snaps[:B]):
                    p.restore(s)
                t0 = time.time()
                prove_provers(provers[:B], bp_gens, backend=backend,
                              waves=waves, inflight=inflight)
                el = time.time() - t0
                best = el if best is None else min(best, el)
                log(f"  B={B} waves={waves} inflight={inflight or B} "
                    f"rep={rep}: {el:.1f}s ({B/el:.3f} proofs/s)")
            return best

        # flag A/B at the first sweep point: baseline (round-3 flags) vs the
        # round-4 candidates, one at a time, then combined
        B0, w0 = sweep[0][0], sweep[0][1]
        combos = []
        if "c" in sections:
            combos = [
                ("r3-flags", dict(w=False, t=False, f=False)),
                ("TBLTIER", dict(w=False, t=True, f=False)),
                ("TBLTIER+FLOT", dict(w=False, t=True, f=True)),
            ]
            if wrap_ok:
                combos.append(
                    ("WRAP+TBLTIER+FLOT", dict(w=True, t=True, f=True))
                )
            else:
                log("skipping WRAP combos (kernel equivalence failed)")
        saved = (pbm._WRAPMSM, pbm._TBLTIER, pbm._FLOTILLA)
        ab = {}
        try:
            for tag, fl in combos:
                pbm._WRAPMSM, pbm._TBLTIER, pbm._FLOTILLA = (
                    fl["w"], fl["t"], fl["f"]
                )
                log(f"-- combo {tag}")
                try:
                    ab[tag] = run_batch(B0, w0, reps=2)
                except Exception as e:
                    log(f"combo {tag} FAILED: {type(e).__name__}: {e}")
                    continue
                record(f"batch_{B0}x{w0}_{tag}_s", round(ab[tag], 2))
        finally:
            pbm._WRAPMSM, pbm._TBLTIER, pbm._FLOTILLA = saved

        # pick the fastest combo for the B sweep
        if ab:
            best_tag = min(ab, key=ab.get)
            fl = dict(combos)[best_tag]
            pbm._WRAPMSM, pbm._TBLTIER, pbm._FLOTILLA = fl["w"], fl["t"], fl["f"]
            record("best_combo", best_tag)
            rest = sweep[1:]
        else:
            best_tag = "defaults"  # module defaults (env-set flags)
            rest = sweep
        for pt in rest:
            B, waves = pt[0], pt[1]
            inflight = pt[2] if len(pt) > 2 else None
            try:
                el = run_batch(B, waves, inflight, reps=2)
            except Exception as e:
                log(f"  B={B} waves={waves} FAILED: {type(e).__name__}: {e}")
                record(f"batch_{B}x{waves}_{best_tag}_s", f"FAILED: {e}")
                continue
            key = f"batch_{B}x{waves}" + (f"i{inflight}" if inflight else "")
            record(f"{key}_{best_tag}_s", round(el, 2))
            record(f"{key}_proofs_per_s", round(B / el, 3))

        # free the sweep provers before the next stages
        del provers, snaps

    # ---------------------------------------------- 4. VSMT-4
    if "4" in sections:
      section("4. VSMT-4 depth-128")
      try:
        dt4, bdt4, B4 = bench.stage3b_vsmt4(backend)
        record("vsmt4_warm_prove_s", round(dt4, 3))
        if bdt4 is not None:
            record(f"vsmt4_batch{B4}_proofs_per_s", round(B4 / bdt4, 3))
      except Exception as e:
        log(f"stage3b FAILED: {type(e).__name__}: {e}")

    # ---------------------------------------------- 5. equivalence gate
    if "5" not in sections:
        section("DONE")
        log(json.dumps(RESULTS, indent=1))
        return
    section("5. path-equivalence gate")
    try:
        bench.stage5_equiv_gate(backend)
        record("equiv_gate", "OK")
    except AssertionError as e:
        log(f"GATE FAILED: {e}")
        record("equiv_gate", f"DIVERGENCE: {e}")
    except Exception as e:
        log(f"gate errored (non-divergence): {type(e).__name__}: {e}")
        record("equiv_gate", f"error: {e}")

    # ---------------------------------------------- 6. roofline
    section("6. roofline ceilings")
    try:
        import importlib

        rl = importlib.import_module("roofline")
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import roofline as rl
    try:
        a = rl.ceiling_mul()
        b = rl.ceiling_step()
        step_rate, mul_rate, dtm = rl.measured_msm()
        record("roofline", {
            "ceiling_mul_elem_per_s": round(a),
            "ceiling_step_elem_per_s": round(b),
            "msm_win_65536_s": round(dtm, 4),
            "achieved_step_elem_per_s": round(step_rate),
            "achieved_mul_elem_per_s": round(mul_rate),
            "step_mfu_pct": round(100 * step_rate / b, 1),
            "mul_mfu_pct": round(100 * mul_rate / a, 1),
            "walkstep_mul_content_pct": round(100 * (b * 8) / a, 1),
        })
    except Exception as e:
        log(f"roofline FAILED: {type(e).__name__}: {e}")

    section("DONE")
    log(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
