#!/usr/bin/env python3
"""Benchmark driver: prints JSON result lines; the LAST line printed is the
best metric achieved (the driver records it).

Primary metric (BASELINE.json): proofs/sec/chip on the VSMT-2 workload -
a depth-253 sparse-Merkle-tree membership proof with Poseidon (width 6,
rounds 4+140+4, inverse S-box): 143,704 multipliers padded to 2^18
(SURVEY.md CS-2).  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is null unless a local host-path estimate exists.

Stages (progressively heavier; each emits a provisional JSON line so a
result lands even if a later stage runs out of time):
  1. pallas MSM micro-benchmark        -> "MSM point-adds/sec"
  2. Poseidon-hash-2 preimage proof    -> "proofs/sec/chip (Poseidon 2:1)"
  3. VSMT-2 depth-253 proof            -> "proofs/sec/chip (VSMT-2)"
  4. batched VSMT-2 (BENCH_BATCH=B)    -> amortised proofs/sec/chip
  6. streamed VSMT-2 queue (BENCH_STREAM_B, deadline-guarded)
                                       -> "streamed proofs/sec/chip"
  3b. batched VSMT-4 (BENCH_VSMT4_BATCH)
  5. kernel-path byte-equivalence gate (10 paths incl native C++ + W5
     on/off; a divergence fails the run loudly)

A watchdog thread prints the best-so-far result and exits 0 at
BENCH_DEADLINE_S seconds (default 1500) so the external driver timeout can
never void the run.  Env knobs: BENCH_STAGE=1|2|3 (stop after that stage),
BENCH_DEPTH (shrink the tree), BENCH_MSM_N, BENCH_DEADLINE_S.
"""

import json
import os
import sys
import threading
import time

T_START = time.time()
_LOCK = threading.Lock()
_BEST = None  # (metric, value, unit, vs_baseline, extra)
_PRINTED = None


def log(*args):
    print(f"[{time.time()-T_START:7.1f}s]", *args, file=sys.stderr, flush=True)


def _emit(rec) -> None:
    global _PRINTED
    out = {
        "metric": rec[0],
        "value": round(rec[1], 6),
        "unit": rec[2],
        "vs_baseline": rec[3],
    }
    if rec[4]:
        out["extra"] = rec[4]
    print(json.dumps(out), flush=True)
    _PRINTED = rec


def result(metric, value, unit, vs_baseline=None, extra=None):
    """Record a stage result and print it immediately (provisional lines are
    fine: the driver keeps the last line).

    Every line with a non-null vs_baseline also carries
    ``extra.vs_baseline_conservative`` = vs_baseline / 2.5: the local
    single-core C++ proxy runs on a 2.1 GHz Xeon and BASELINE.md's own
    estimate is that dalek AVX2 on a modern core could be 2-3x faster, so
    the honest range's low end rides in the data, not just in a doc."""
    global _BEST
    if vs_baseline is not None:
        extra = dict(extra or {})
        extra["vs_baseline_conservative"] = round(vs_baseline / 2.5, 2)
    with _LOCK:
        _BEST = (metric, value, unit, vs_baseline, extra)
        _emit(_BEST)


def _watchdog(deadline_s: float):
    while True:
        left = deadline_s - (time.time() - T_START)
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    with _LOCK:
        log(f"WATCHDOG: deadline {deadline_s:.0f}s reached, exiting with "
            f"best-so-far result")
        if _BEST is None:
            _emit((
                "bench incomplete (deadline before first stage)", 0.0,
                "n/a", None, None,
            ))
        elif _PRINTED is not _BEST:
            _emit(_BEST)
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


# --------------------------------------------------------------------- stages
def stage1_msm():
    """MSM point-adds/sec on one chip (north-star secondary metric).

    Uses the production grid-MSM path (one dispatch per MSM over a
    capacity-shaped generator array, signed-digit w4 ladders) — the same
    kernel the prover compiles, so stage 1's compile cost is shared with
    stages 2-4 instead of adding a stage-1-only kernel shape."""
    import random

    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
    from bulletproofs_r1cs_gadgets_tpu.core import scvec
    from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
    from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
    from bulletproofs_r1cs_gadgets_tpu.utils.constants import L

    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pbm

    n = int(os.environ.get("BENCH_MSM_N", 1 << 16))
    k = max(1, -(-n // ck.CHUNK))
    path = "window-accumulator" if pbm._WINMSM else "ladder grid"
    log(f"[stage1] MSM n={n} ({k} chunks, {path} path)")
    gens = BulletproofGens(max(n, 2048))
    backend = PallasBackend()
    big = backend._gens_big(gens.share(0), n, "G")
    table = (
        backend._gens_table(gens.share(0), n, "G") if pbm._WINMSM else None
    )
    rnd = random.Random(1)
    # distinct scalar sets per rep (identical repeat calls can be elided
    # by the runtime and would overstate throughput); the encode matches
    # the shared-table walker flavor (w5 digits under BPTPU_W5)
    reps = 3
    enc = pbm._shared_grid_words if pbm._WINMSM else ck.grid_words
    word_sets = [
        enc(
            scvec.from_scalars([Scalar(rnd.randrange(L)) for _ in range(n)]),
            k,
        )
        for _ in range(reps + 1)
    ]

    def run(words):
        # fetch_points is a real device->host transfer (block_until_ready
        # has been observed returning early on this remote backend)
        if table is not None:
            return ck.fetch_points([pbm._shared_win(table, words, k)])[0]
        return ck.fetch_points([ck.msm_grid(big, words, k)])[0]

    t0 = time.time()
    run(word_sets[-1])
    log(f"[stage1] first call (compile) {time.time()-t0:.1f}s")
    t0 = time.time()
    for i in range(reps):
        run(word_sets[i])
    dt = (time.time() - t0) / reps
    # equivalent bit-serial double-and-add work: 253 * (dbl + add) / point
    point_ops = n * 506
    log(f"[stage1] msm({n}) = {dt*1e3:.1f} ms")
    return point_ops / dt, dt


def _prove_verify_poseidon2(backend):
    """One Poseidon 2:1 preimage prove+verify round-trip (SURVEY CS-3);
    returns (warm_prove_seconds, total_seconds)."""
    from bulletproofs_r1cs_gadgets_tpu import (
        BulletproofGens,
        PedersenGens,
        Prover,
        Scalar,
        Transcript,
        Verifier,
    )
    from bulletproofs_r1cs_gadgets_tpu.gadgets.poseidon import (
        Poseidon_hash_2,
        PoseidonParams,
        SboxType,
        allocate_statics_for_prover,
        allocate_statics_for_verifier,
    )
    from bulletproofs_r1cs_gadgets_tpu.models.compiled import (
        CompiledPoseidon2,
    )

    params = PoseidonParams(6, 4, 4, 140)
    xl, xr = Scalar(31), Scalar(59)
    expected = Poseidon_hash_2(xl, xr, params, SboxType.Inverse)
    pc_gens = PedersenGens.default()
    bp_gens = BulletproofGens(2048)
    comp = CompiledPoseidon2(params, SboxType.Inverse)

    t_all = time.time()
    prover = Prover(pc_gens, Transcript(b"PoseidonBench"))
    com_l, _ = prover.commit(xl, Scalar.random())
    com_r, _ = prover.commit(xr, Scalar.random())
    allocate_statics_for_prover(prover, 4)
    aL, aR, aO = comp.witness(xl, xr)
    prover.load_compiled(comp.tape(expected), aL, aR, aO)
    snap = prover.snapshot()
    proof = prover.prove(bp_gens, backend=backend)  # cold

    verifier = Verifier(Transcript(b"PoseidonBench"))
    verifier.commit(com_l)
    verifier.commit(com_r)
    allocate_statics_for_verifier(verifier, 4, pc_gens)
    verifier.load_compiled(comp.tape(expected), comp.num_multipliers)
    verifier.verify(proof, pc_gens, bp_gens, backend=backend)
    total = time.time() - t_all
    log(f"[stage2] cold prove+verify {total:.1f}s (VERIFIED)")

    warm = None
    for i in range(2):
        prover.restore(snap)
        t0 = time.time()
        prover.prove(bp_gens, backend=backend)
        warm = time.time() - t0
    log(f"[stage2] warm prove {warm:.1f}s")
    return warm, total


def stage2_poseidon(backend=None):
    if backend is None:
        from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import (
            PallasBackend,
        )

        backend = PallasBackend()
    return _prove_verify_poseidon2(backend)


def _tree_cache_path(depth: int) -> str:
    d = os.environ.get(
        "BPTPU_GENS_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".gens_cache"),
    )
    return os.path.join(d, f"bench_tree_d{depth}.bin")


def _build_tree(params, depth):
    """Depth-`depth` tree with the reference's 10 updates; disk-cached (the
    tree db is deterministic, SURVEY CS-5)."""
    from bulletproofs_r1cs_gadgets_tpu import Scalar
    from bulletproofs_r1cs_gadgets_tpu.models.vsmt2 import (
        VanillaSparseMerkleTree,
    )

    path = _tree_cache_path(depth)
    if os.path.exists(path):
        with open(path, "rb") as f:
            blob = f.read()
        tree = VanillaSparseMerkleTree.__new__(VanillaSparseMerkleTree)
        tree.depth = depth
        tree.hash_params = params
        n = int.from_bytes(blob[:8], "little")
        db = {}
        off = 8
        for _ in range(n):
            k = blob[off : off + 32]
            l = Scalar(int.from_bytes(blob[off + 32 : off + 64], "little"))
            r = Scalar(int.from_bytes(blob[off + 64 : off + 96], "little"))
            db[k] = (l, r)
            off += 96
        tree.db = db
        m = int.from_bytes(blob[off : off + 8], "little")
        off += 8
        tree.empty_tree_hashes = [
            Scalar(int.from_bytes(blob[off + 32 * i : off + 32 * (i + 1)], "little"))
            for i in range(m)
        ]
        off += 32 * m
        tree.root = Scalar(int.from_bytes(blob[off : off + 32], "little"))
        log(f"[stage3] tree loaded from cache ({n} nodes)")
        return tree

    t0 = time.time()
    tree = VanillaSparseMerkleTree(params, depth=depth)
    for i in range(1, 11):
        tree.update(Scalar(i), Scalar(i))
    log(f"[stage3] tree built+updated in {time.time()-t0:.1f}s")
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        parts = [len(tree.db).to_bytes(8, "little")]
        for k, (l, r) in tree.db.items():
            parts.append(k)
            parts.append(l.to_bytes())
            parts.append(r.to_bytes())
        parts.append(len(tree.empty_tree_hashes).to_bytes(8, "little"))
        for h in tree.empty_tree_hashes:
            parts.append(h.to_bytes())
        parts.append(tree.root.to_bytes())
        with open(path, "wb") as f:
            f.write(b"".join(parts))
    except OSError:
        pass
    return tree


def stage3_vsmt(depth=None, backend=None):
    """Full VSMT-2 proof + verify on one chip."""
    from bulletproofs_r1cs_gadgets_tpu import (
        BulletproofGens,
        PedersenGens,
        Prover,
        Scalar,
        Transcript,
        Verifier,
    )
    from bulletproofs_r1cs_gadgets_tpu.gadgets.poseidon import PoseidonParams
    from bulletproofs_r1cs_gadgets_tpu.models.vsmt2 import (
        leaf_index_bit_scalars,
    )

    if backend is None:
        from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import (
            PallasBackend,
        )

        backend = PallasBackend()
    depth = depth or int(os.environ.get("BENCH_DEPTH", 253))
    params = PoseidonParams(6, 4, 4, 140)
    tree = _build_tree(params, depth)

    k = Scalar(7)
    merkle_proof = []
    assert tree.get(k, merkle_proof) == k
    bits = [b.v for b in leaf_index_bit_scalars(k, depth)]
    nodes = list(reversed(merkle_proof))

    # 564 multipliers per level + 4 select multipliers
    padded = 1 << (depth * 568 - 1).bit_length()
    pc_gens = PedersenGens.default()
    t0 = time.time()
    bp_gens = BulletproofGens(padded)
    log(f"[stage3] gens({padded}) ready in {time.time()-t0:.1f}s")

    from bulletproofs_r1cs_gadgets_tpu.models.compiled import CompiledVSMT2

    t_syn = time.time()
    comp = CompiledVSMT2(params, depth, constrain_index_bits=False)
    tape = comp.tape(tree.root)
    prover = Prover(pc_gens, Transcript(b"VSMT"))
    comms = comp.commit_prover(prover, k, bits, nodes)
    aL, aR, aO = comp.witness(k, bits, nodes)
    prover.load_compiled(tape, aL, aR, aO)
    log(
        f"[stage3] compiled synthesis {time.time()-t_syn:.1f}s, "
        f"{prover.num_multipliers()} multipliers"
    )
    snap = prover.snapshot()

    t0 = time.time()
    proof = prover.prove(bp_gens, backend=backend)  # cold: kernel compiles
    log(f"[stage3] cold prove {time.time()-t0:.1f}s")

    t0 = time.time()
    verifier = Verifier(Transcript(b"VSMT"))
    comp.commit_verifier(verifier, comms, pc_gens)
    verifier.load_compiled(tape, comp.num_multipliers)
    verifier.verify(proof, pc_gens, bp_gens, backend=backend)
    log(f"[stage3] VERIFIED in {time.time()-t0:.1f}s")

    # warm timing: restore the synthesized tape and prove repeatedly; report
    # the steady state (the first warm iteration still carries stragglers)
    dt = None
    for i in range(2):
        prover.restore(snap)
        t0 = time.time()
        prover.prove(bp_gens, backend=backend)
        dt = time.time() - t0
        log(f"[stage3] warm prove {i} {dt:.1f}s")
    ctx = dict(
        pc_gens=pc_gens, bp_gens=bp_gens, comp=comp, tape=tape,
        k=k, bits=bits, nodes=nodes, aL=aL, aR=aR, aO=aO,
    )
    return dt, ctx


def stage3b_vsmt4(backend):
    """VSMT-4 depth-128 proof (BASELINE config 4; gadget_vsmt_4.rs:199-312):
    74,624 multipliers padded to 2^17.  Siblings are synthetic scalars (the
    circuit proves membership wrt the root the witness chain produces —
    identical constraint structure to a real tree's proof).  Returns
    (warm_serial_s, batched_s_or_None, B): with BENCH_VSMT4_BATCH=B > 1
    the serial timing is followed by a B-proof batch (the half-size jobs
    batch even better than VSMT-2 — more fit in HBM)."""
    from bulletproofs_r1cs_gadgets_tpu import (
        BulletproofGens, PedersenGens, Prover, Scalar, Transcript, Verifier,
    )
    from bulletproofs_r1cs_gadgets_tpu.gadgets.poseidon import PoseidonParams
    from bulletproofs_r1cs_gadgets_tpu.models.compiled import CompiledVSMT4

    depth = int(os.environ.get("BENCH_VSMT4_DEPTH", 128))
    params = PoseidonParams(6, 4, 4, 140)
    comp = CompiledVSMT4(params, depth)
    padded = 1 << (comp.num_multipliers - 1).bit_length()
    pc_gens = PedersenGens.default()
    t0 = time.time()
    bp_gens = BulletproofGens(padded)
    log(f"[stage3b] gens({padded}) ready in {time.time()-t0:.1f}s")

    k = Scalar(7)
    nodes = [Scalar(1000 + i) for i in range(3 * depth)]
    t0 = time.time()
    aL, aR, aO = comp.witness(k, k, nodes)
    root = comp._root
    tape = comp.tape(root)
    prover = Prover(pc_gens, Transcript(b"VSMT"))
    comms = comp.commit_prover(prover, k, k, nodes)
    prover.load_compiled(tape, aL, aR, aO)
    log(
        f"[stage3b] compiled synthesis {time.time()-t0:.1f}s, "
        f"{prover.num_multipliers()} multipliers"
    )
    snap = prover.snapshot()
    t0 = time.time()
    proof = prover.prove(bp_gens, backend=backend)
    log(f"[stage3b] cold prove {time.time()-t0:.1f}s")

    t0 = time.time()
    verifier = Verifier(Transcript(b"VSMT"))
    comp.commit_verifier(verifier, comms, pc_gens)
    verifier.load_compiled(tape, comp.num_multipliers)
    verifier.verify(proof, pc_gens, bp_gens, backend=backend)
    log(f"[stage3b] VERIFIED in {time.time()-t0:.1f}s")

    dt = None
    for i in range(2):
        prover.restore(snap)
        t0 = time.time()
        prover.prove(bp_gens, backend=backend)
        dt = time.time() - t0
        log(f"[stage3b] warm prove {i} {dt:.1f}s")

    # default 24: the half-size jobs leave HBM headroom beyond 12 and the
    # measured rate keeps rising (0.452 proofs/s at B=12 -> 0.524 at B=24
    # on-chip, 2026-08-20 session)
    B = int(os.environ.get("BENCH_VSMT4_BATCH", 24))
    if B <= 1:
        return dt, None, B, []
    # the batch portion runs in its own try/except: a batch-only failure
    # (e.g. OOM at a large B) must not discard the already-measured
    # serial VSMT-4 number (advisor finding, round 4)
    passes = []
    try:
        from concurrent.futures import ThreadPoolExecutor

        from bulletproofs_r1cs_gadgets_tpu.parallel.batch import (
            prove_provers,
        )

        def _build(_):
            p = Prover(pc_gens, Transcript(b"VSMT"))
            comp.commit_prover(p, k, k, nodes)
            p.load_compiled(tape, aL, aR, aO)
            return p

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=3) as pool:
            provers = list(pool.map(_build, range(B)))
        snaps = [p.snapshot() for p in provers]
        log(f"[stage3b] built {B} provers in {time.time()-t0:.1f}s")
        for rep in range(int(os.environ.get("BENCH_BATCH_REPS", 5))):
            if rep:
                for p, s in zip(provers, snaps):
                    p.restore(s)
            t0 = time.time()
            prove_provers(
                provers, bp_gens, backend=backend, waves=max(1, B // 4)
            )
            rep_dt = time.time() - t0
            passes.append(round(rep_dt, 2))
            log(f"[stage3b] batch B={B} pass {rep}: {rep_dt:.1f}s "
                f"({B/rep_dt:.3f} proofs/s)")
    except Exception as e:
        log(f"[stage3b] batch portion FAILED (serial result kept): "
            f"{type(e).__name__}: {e}")
        import traceback

        traceback.print_exc(file=sys.stderr)
    bdt = min(passes) if passes else None
    return dt, bdt, B, passes


def stage5_equiv_gate(backend):
    """Path-equivalence gate: the SAME seeded circuit proven through the
    production Pallas path under every kernel-path flag combo
    ({WINMSM, W3H} x {0,1}) AND through the single-core C++ NativeBackend
    must yield BYTE-IDENTICAL proofs (the practical mitigation for the
    missing Rust proof fixture — a wrong-but-verifying kernel regression
    cannot slip through).  Uses a depth-8 VSMT-2 circuit (4,544 multipliers
    padded to 8,192 = 4 chunks) so the grid/combined/frozen-tail layers are
    all exercised."""
    import numpy as np

    from bulletproofs_r1cs_gadgets_tpu import (
        BulletproofGens, PedersenGens, Prover, Transcript, Verifier, Scalar,
    )
    from bulletproofs_r1cs_gadgets_tpu.gadgets.poseidon import PoseidonParams
    from bulletproofs_r1cs_gadgets_tpu.models.compiled import CompiledVSMT2
    from bulletproofs_r1cs_gadgets_tpu.models.vsmt2 import (
        VanillaSparseMerkleTree, leaf_index_bit_scalars,
    )
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pbm

    depth = 8
    params = PoseidonParams(6, 4, 4, 140)
    tree = VanillaSparseMerkleTree(params, depth=depth)
    for i in range(1, 4):
        tree.update(Scalar(i), Scalar(i))
    k = Scalar(2)
    mp = []
    assert tree.get(k, mp) == k
    bits = [b.v for b in leaf_index_bit_scalars(k, depth)]
    nodes = list(reversed(mp))
    comp = CompiledVSMT2(params, depth, constrain_index_bits=False)
    tape = comp.tape(tree.root)
    aLw, aRw, aOw = comp.witness(k, bits, nodes)
    pc_gens = PedersenGens.default()
    bp_gens = BulletproofGens(8192)

    def prove_with(be):
        prover = Prover(
            pc_gens, Transcript(b"VSMT"), rng=np.random.RandomState(42)
        )
        comms = comp.commit_prover(
            prover, k, bits, nodes, rng=np.random.RandomState(7)
        )
        prover.load_compiled(tape, aLw, aRw, aOw)
        return prover.prove(bp_gens, backend=be), comms

    results = {}
    try:
        from bulletproofs_r1cs_gadgets_tpu.ops.native_backend import (
            NativeBackend, native_available,
        )

        if native_available():
            t0 = time.time()
            proof, comms = prove_with(NativeBackend())
            results["native-cpu"] = proof.to_bytes()
            log(f"[stage5] native-cpu proof in {time.time()-t0:.1f}s")
    except Exception as e:
        log(f"[stage5] native path unavailable: {e}")

    # flag combos: every kernel path (WINMSM/W3H) plus the round-4
    # candidates (wrap-around R walk, table tiering, frozen flotilla —
    # flotilla needs a batch, so it is exercised through prove_provers)
    saved = (
        pbm._WINMSM, pbm._W3H, pbm._WRAPMSM, pbm._TBLTIER, pbm._PAIRWALK,
        pbm._W5,
    )
    combos = [
        ("pallas(default)",
         (True, True, pbm._WRAPMSM, pbm._TBLTIER, pbm._PAIRWALK, pbm._W5)),
        ("pallas(W3H=0)", (True, False, False, False, False, True)),
        ("pallas(WINMSM=0)", (False, True, False, False, False, True)),
        ("pallas(WINMSM=0,W3H=0)", (False, False, False, False, False,
                                    True)),
        ("pallas(WRAPMSM=1,TBLTIER=1)", (True, True, True, True, False,
                                         True)),
        ("pallas(PAIRWALK=1)", (True, True, True, True, True, True)),
        # the w4 shared-table walker (W5 off): same proof bytes through
        # the 8-entry tables + 64-step walks
        ("pallas(W5=0)", (True, True, True, True, True, False)),
    ]
    try:
        for tag, flags in combos:
            (pbm._WINMSM, pbm._W3H, pbm._WRAPMSM, pbm._TBLTIER,
             pbm._PAIRWALK, pbm._W5) = flags
            backend.evict_gens()  # shared tables are flag-dependent
            t0 = time.time()
            proof, comms = prove_with(backend)
            results[tag] = proof.to_bytes()
            log(f"[stage5] {tag} proof in {time.time()-t0:.1f}s")
    finally:
        (pbm._WINMSM, pbm._W3H, pbm._WRAPMSM, pbm._TBLTIER,
         pbm._PAIRWALK, pbm._W5) = saved

    # flotilla: batch of 3 frozen-from-round-1 proofs through
    # prove_provers under BPTPU_FLOTILLA — the batch path must match too
    saved_f = pbm._FLOTILLA
    try:
        from bulletproofs_r1cs_gadgets_tpu.parallel.batch import (
            prove_provers,
        )

        for flot, tag in ((False, "batch(FLOTILLA=0)"),
                          (True, "batch(FLOTILLA=1)")):
            pbm._FLOTILLA = flot
            provers = []
            for _ in range(3):
                prover = Prover(
                    pc_gens, Transcript(b"VSMT"),
                    rng=np.random.RandomState(42),
                )
                comms = comp.commit_prover(
                    prover, k, bits, nodes, rng=np.random.RandomState(7)
                )
                prover.load_compiled(tape, aLw, aRw, aOw)
                provers.append(prover)
            t0 = time.time()
            proofs = prove_provers(provers, bp_gens, backend=backend)
            assert len({p.to_bytes() for p in proofs}) == 1
            results[tag] = proofs[0].to_bytes()
            log(f"[stage5] {tag} 3 proofs in {time.time()-t0:.1f}s")
    finally:
        pbm._FLOTILLA = saved_f

    blobs = set(results.values())
    if len(blobs) != 1:
        sizes = {k2: len(v) for k2, v in results.items()}
        raise AssertionError(
            f"PATH DIVERGENCE: {len(blobs)} distinct proof byte-strings "
            f"across {list(results)} (sizes {sizes})"
        )
    # and the common proof verifies
    from bulletproofs_r1cs_gadgets_tpu.core.errors import VerificationError

    try:
        verifier = Verifier(Transcript(b"VSMT"))
        comp.commit_verifier(verifier, comms, pc_gens)
        verifier.load_compiled(tape, comp.num_multipliers)
        verifier.verify(proof, pc_gens, bp_gens, backend=backend)
    except VerificationError as e:
        raise AssertionError(
            f"paths agree but the common proof FAILS verification: {e}"
        )
    log(f"[stage5] EQUIVALENCE OK: {len(results)} paths byte-identical "
        f"({len(proof.to_bytes())} B) and verifying")


def stage4_batch_vsmt(ctx, backend, serial_dt):
    """Batched VSMT-2 proving: B provers driven stage-synchronously with
    fused device syncs (parallel.batch.prove_provers)."""
    from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript, Verifier
    from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_provers

    B = int(os.environ.get("BENCH_BATCH", 12))
    waves = int(os.environ.get("BENCH_WAVES", max(1, B // 4)))
    # max proofs with live device state (HBM cap, PERF_NOTES accounting);
    # waves beyond the cap queue behind retiring ones
    inflight = int(os.environ.get("BENCH_INFLIGHT", 0)) or None
    pc_gens, bp_gens, comp, tape = (
        ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
    )
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()

    def _build(_):
        prover = Prover(pc_gens, Transcript(b"VSMT"))
        comms = comp.commit_prover(prover, ctx["k"], ctx["bits"], ctx["nodes"])
        prover.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
        return prover, comms

    with ThreadPoolExecutor(max_workers=max(1, min((os.cpu_count() or 4) - 1, B))) as pool:
        provers = list(pool.map(_build, range(B)))
    log(f"[stage4] built {B} provers in {time.time()-t0:.1f}s")

    # BENCH_BATCH_REPS (default 5) passes: the first absorbs batch-only
    # one-time costs (fused fetch-stack compiles, straggler allocs) and the
    # allocator keeps settling into pass 2 (measured 30.0 / 24.9 / 20.2 s
    # on 2026-08-20); the min is the steady state, and ALL pass times +
    # the median are carried in the emitted extras so the dispersion is
    # visible in the recorded JSON.  Snapshots let the same synthesized
    # provers prove repeatedly.
    snaps = [p.snapshot() for p, _ in provers]
    passes = []
    import gc
    for rep in range(int(os.environ.get("BENCH_BATCH_REPS", 5))):
        if rep:
            for (p, _), s in zip(provers, snaps):
                p.restore(s)
            gc.collect()  # big buffers hide in ref cycles (see stream.py)
        t0 = time.time()
        proofs = prove_provers(
            [p for p, _ in provers], bp_gens, backend=backend, waves=waves,
            inflight=inflight,
        )
        rep_dt = time.time() - t0
        passes.append(round(rep_dt, 2))
        log(
            f"[stage4] batch prove B={B} waves={waves} "
            f"inflight={inflight or B} pass {rep}: "
            f"{rep_dt:.1f}s total, {rep_dt/B:.2f}s/proof "
            f"({serial_dt/(rep_dt/B):.2f}x serial)"
        )
    dt = min(passes)

    # verify every batched proof — combined into ONE mega-MSM
    from bulletproofs_r1cs_gadgets_tpu import batch_verify

    t0 = time.time()
    verifiers = []
    for _, comms in provers:
        verifier = Verifier(Transcript(b"VSMT"))
        comp.commit_verifier(verifier, comms, pc_gens)
        verifier.load_compiled(tape, comp.num_multipliers)
        verifiers.append(verifier)
    batch_verify(verifiers, proofs, pc_gens, bp_gens, backend=backend)
    log(
        f"[stage4] all {B} proofs VERIFIED (single combined MSM) in "
        f"{time.time()-t0:.1f}s"
    )
    return B, dt, passes


def stage6_stream(ctx, backend, B=None, wave=None, inflight=None,
                  verify_group=None):
    """Streamed VSMT-2 batch at queue scale (the BASELINE 4096-proof
    configuration, BASELINE.md 'Batched proving'): B provers built
    LAZILY in wave groups, at most `inflight` proofs' device state live
    (parallel.stream.prove_stream), every proof verified in combined
    mega-MSM groups.  Returns (report, verify_seconds).

    The driver bench runs a bounded B (BENCH_STREAM_B, default 128 ~ 4
    min) so the recorded metric is measured in-window; the full 4096
    run is the same code path at BENCH_STREAM_B=4096 (scratch/
    mega4096.py writes MEGA4096.json with the full telemetry)."""
    from bulletproofs_r1cs_gadgets_tpu import Prover, Transcript, Verifier
    from bulletproofs_r1cs_gadgets_tpu import batch_verify
    from bulletproofs_r1cs_gadgets_tpu.parallel.stream import prove_stream

    B = B or int(os.environ.get("BENCH_STREAM_B", 128))
    wave = wave or int(os.environ.get("BENCH_STREAM_WAVE", 4))
    inflight = inflight or int(os.environ.get("BENCH_INFLIGHT", 12))
    verify_group = verify_group or int(
        os.environ.get("BENCH_STREAM_VERIFY_GROUP", 64)
    )
    pc_gens, bp_gens, comp, tape = (
        ctx["pc_gens"], ctx["bp_gens"], ctx["comp"], ctx["tape"]
    )
    comms_by_idx = {}
    lk = threading.Lock()

    def make_prover(i: int):
        prover = Prover(pc_gens, Transcript(b"VSMT"))
        comms = comp.commit_prover(
            prover, ctx["k"], ctx["bits"], ctx["nodes"]
        )
        prover.load_compiled(tape, ctx["aL"], ctx["aR"], ctx["aO"])
        with lk:
            comms_by_idx[i] = comms
        return prover

    last_log = [time.time()]

    def progress(done, elapsed):
        now = time.time()
        if now - last_log[0] >= 30 or done == B:
            last_log[0] = now
            log(
                f"[stage6] streamed {done}/{B} proofs in {elapsed:.0f}s "
                f"({done/elapsed:.3f} proofs/s running)"
            )

    proofs, rep = prove_stream(
        make_prover, B, bp_gens, backend=backend, wave=wave,
        inflight=inflight, progress=progress,
    )
    log(
        f"[stage6] stream B={B} wave={wave} inflight={rep.inflight}: "
        f"{rep.wall_s:.1f}s = {rep.proofs_per_s:.3f} proofs/s "
        f"(host build {rep.build_s:.0f}s agg, cpu_util "
        f"{rep.cpu_util:.2f}, hbm_peak "
        f"{(rep.hbm_peak_bytes or 0)/2**30:.2f} GiB)"
    )

    # verify EVERY streamed proof, combined mega-MSM per group
    t0 = time.time()
    for s in range(0, B, verify_group):
        e = min(s + verify_group, B)
        verifiers = []
        for i in range(s, e):
            verifier = Verifier(Transcript(b"VSMT"))
            comp.commit_verifier(verifier, comms_by_idx[i], pc_gens)
            verifier.load_compiled(tape, comp.num_multipliers)
            verifiers.append(verifier)
        batch_verify(
            verifiers, proofs[s:e], pc_gens, bp_gens, backend=backend
        )
    vdt = time.time() - t0
    log(
        f"[stage6] all {B} proofs VERIFIED "
        f"({-(-B // verify_group)} combined MSM groups) in {vdt:.1f}s"
    )
    return rep, vdt


def _load_local_baseline() -> dict:
    """Single-core native baseline (BASELINE_LOCAL.json, produced by
    scratch/measure_native_baseline.py): measured end-to-end timings of the
    C++ NativeBackend — the Rust-engine stand-in (BASELINE.md) — on the
    exact bench circuits.  vs_baseline = TPU rate / single-core native
    rate for the same workload."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_LOCAL.json"
    )
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


_VSMT2_BEST = None  # last VSMT-2 result tuple (re-emitted after stage3b)


def _ratio(baseline_s, measured_s):
    if not baseline_s or not measured_s:
        return None
    return round(baseline_s / measured_s, 2)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return (s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2) if n else 0.0


def main():
    # every stage prints its JSON line immediately, so a harder external
    # timeout still records the best-so-far; the watchdog only guarantees
    # a clean exit 0.  Remote-compile latency varies wildly day to day
    # (stage 1 alone has cost 40 s .. 13 min), hence the generous default.
    deadline = float(os.environ.get("BENCH_DEADLINE_S", 3300))
    threading.Thread(
        target=_watchdog, args=(deadline,), daemon=True
    ).start()
    stop_after = int(os.environ.get("BENCH_STAGE", 4))
    base = _load_local_baseline()

    global _VSMT2_BEST
    msm_rate = None
    try:
        msm_rate, msm_dt = stage1_msm()
        log(f"[stage1] {msm_rate/1e6:.1f} M point-adds/sec")
        result(
            "MSM point-adds/sec (1 chip)", msm_rate, "ops/s",
            vs_baseline=_ratio(base.get("msm_65536_s"), msm_dt),
            extra={"native_single_core_msm_s": base.get("msm_65536_s")}
            if base else None,
        )
    except Exception as e:  # pragma: no cover
        log(f"[stage1] FAILED: {type(e).__name__}: {e}")
        if stop_after == 1:
            raise
    if stop_after == 1:
        return

    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend

    backend = PallasBackend()
    try:
        warm2, total2 = stage2_poseidon(backend)
        result(
            "proofs/sec/chip (Poseidon 2:1 preimage)",
            1.0 / warm2,
            "proofs/s",
            vs_baseline=_ratio(base.get("poseidon2_prove_s"), warm2),
            extra={
                "warm_prove_seconds": round(warm2, 3),
                "msm_point_adds_per_sec": msm_rate,
                "native_single_core_prove_s": base.get("poseidon2_prove_s"),
            },
        )
    except Exception as e:
        log(f"[stage2] FAILED: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc(file=sys.stderr)
        if stop_after == 2:
            raise
    if stop_after == 2:
        return

    # stage2's 2048-gens capacity arrays (~0.9 GB) are dead weight for the
    # VSMT stages; 12 in-flight batch jobs run within ~1.5 GB of the chip
    backend.evict_gens()
    try:
        dt, ctx = stage3_vsmt(backend=backend)
        _VSMT2_BEST = (
            "proofs/sec/chip (VSMT-2 Poseidon gadget)",
            1.0 / dt,
            "proofs/s",
            _ratio(base.get("vsmt2_prove_s"), dt),
            {
                "prove_seconds": round(dt, 2),
                "msm_point_adds_per_sec": msm_rate,
                "native_single_core_prove_s": base.get("vsmt2_prove_s"),
            },
        )
        result(*_VSMT2_BEST)
    except Exception as e:
        log(f"[stage3] FAILED: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc(file=sys.stderr)
        return
    if stop_after == 3:
        return

    try:
        B, bdt, passes = stage4_batch_vsmt(ctx, backend, dt)
        if B / bdt > 1.0 / dt:
            # only report the batched rate when it beats serial (the
            # driver records the LAST line printed)
            _VSMT2_BEST = (
                "proofs/sec/chip (VSMT-2 Poseidon gadget)",
                B / bdt,
                "proofs/s",
                _ratio(base.get("vsmt2_prove_s"), bdt / B),
                {
                    "batch": B,
                    "batch_seconds": round(bdt, 2),
                    "batch_pass_seconds": passes,
                    "batch_median_seconds": round(_median(passes), 2),
                    "serial_prove_seconds": round(dt, 2),
                    "msm_point_adds_per_sec": msm_rate,
                    "native_single_core_prove_s": base.get("vsmt2_prove_s"),
                },
            )
            result(*_VSMT2_BEST)
        else:
            log(
                f"[stage4] batched rate {B/bdt:.4f} <= serial {1/dt:.4f} "
                f"proofs/s; keeping the serial result"
            )
    except Exception as e:
        log(f"[stage4] FAILED: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc(file=sys.stderr)
        if _BEST is None:
            raise

    stream_B = int(os.environ.get("BENCH_STREAM_B", 96))
    if stream_B > 0:
        # deadline guard: predict the stream's wall time from the stage-4
        # per-proof rate and skip honestly if it cannot finish in-window
        _ex = (_VSMT2_BEST[4] or {}) if _VSMT2_BEST else {}
        per = _ex.get("batch_seconds", 0) and (
            _ex["batch_seconds"] / _ex.get("batch", 1)
        ) or dt
        remaining = deadline - (time.time() - T_START)
        want = stream_B * per * 1.25 + 120  # prove + verify + slack
        if want > remaining:
            log(
                f"[stage6] SKIPPED: streamed B={stream_B} needs ~{want:.0f}s"
                f" but only {remaining:.0f}s remain before BENCH_DEADLINE_S"
                f" (run scratch/mega_stream.py for the full-scale batch)"
            )
        else:
            try:
                rep, vdt = stage6_stream(ctx, backend)
                result(
                    f"streamed proofs/sec/chip (VSMT-2 x {rep.count})",
                    rep.proofs_per_s,
                    "proofs/s",
                    vs_baseline=_ratio(
                        base.get("vsmt2_prove_s"), rep.wall_s / rep.count
                    ),
                    extra={
                        "stream_B": rep.count,
                        "wave": rep.wave,
                        "inflight": rep.inflight,
                        "wall_seconds": round(rep.wall_s, 1),
                        "verify_seconds": round(vdt, 1),
                        "hbm_peak_bytes": rep.hbm_peak_bytes,
                        "host_cpu_util": round(rep.cpu_util, 3),
                        "native_single_core_prove_s": base.get(
                            "vsmt2_prove_s"
                        ),
                    },
                )
            except Exception as e:
                log(f"[stage6] FAILED: {type(e).__name__}: {e}")
                import traceback

                traceback.print_exc(file=sys.stderr)


    if os.environ.get("BENCH_VSMT4", "1") != "0":
        backend.evict_gens()  # drop the 2^18 arrays before the 2^17 build
        try:
            dt4, bdt4, B4, passes4 = stage3b_vsmt4(backend)
            rate4, per4 = 1.0 / dt4, dt4
            extra4 = {
                "prove_seconds": round(dt4, 2),
                "native_single_core_prove_s": base.get("vsmt4_prove_s"),
            }
            if bdt4 is not None and B4 / bdt4 > rate4:
                rate4, per4 = B4 / bdt4, bdt4 / B4
                extra4["batch"] = B4
                extra4["batch_seconds"] = round(bdt4, 2)
                extra4["batch_pass_seconds"] = passes4
                extra4["batch_median_seconds"] = round(_median(passes4), 2)
            result(
                "proofs/sec/chip (VSMT-4 Poseidon gadget)",
                rate4,
                "proofs/s",
                vs_baseline=_ratio(base.get("vsmt4_prove_s"), per4),
                extra=extra4,
            )
        except Exception as e:
            log(f"[stage3b] FAILED: {type(e).__name__}: {e}")
            import traceback

            traceback.print_exc(file=sys.stderr)
        # the VSMT-4 line is informational; re-emit the primary VSMT-2
        # metric so the driver records it as the LAST line
        if _VSMT2_BEST is not None:
            result(*_VSMT2_BEST)

    if os.environ.get("BENCH_EQUIV", "1") != "0":
        backend.evict_gens()
        try:
            stage5_equiv_gate(backend)
        except AssertionError as e:
            # an actual byte DIVERGENCE is a correctness emergency: make
            # it the LAST (recorded) line and fail the run loudly
            log(f"[stage5] FAILED: {e}")
            result(
                "PATH DIVERGENCE (stage5 equivalence gate FAILED)",
                0.0, "proofs/s",
            )
            sys.exit(1)
        except Exception as e:
            # an incidental failure (e.g. a flag-combo path failing to
            # compile) is a bug to log, not grounds to void the measured
            # results
            log(f"[stage5] gate errored (non-divergence): "
                f"{type(e).__name__}: {e}")
            import traceback

            traceback.print_exc(file=sys.stderr)

    # the primary VSMT-2 metric must be the LAST line (driver records it)
    if _VSMT2_BEST is not None:
        result(*_VSMT2_BEST)


if __name__ == "__main__":
    main()
