"""Structured metrics registry (SURVEY.md §5 tracing/metrics rows).

The reference only prints ad-hoc timings (``std::time::Instant`` +
``println!``, /root/reference/src/gadget_poseidon.rs:734-749); here the
equivalent signals are machine-readable via ``utils.metrics.METRICS``.
"""

import json

from bulletproofs_r1cs_gadgets_tpu.utils.metrics import METRICS, Metrics


def test_registry_accumulates_and_snapshots(tmp_path):
    m = Metrics()
    m.add_time("prove.ipp", 0.5)
    m.add_time("prove.ipp", 0.25)
    m.add_count("prove.proofs")
    m.add_count("prove.proofs", 2)
    with m.phase("prove.polys"):
        pass
    snap = m.snapshot()
    assert abs(snap["timers_s"]["prove.ipp"] - 0.75) < 1e-9
    assert snap["timer_calls"]["prove.ipp"] == 2
    assert snap["counters"]["prove.proofs"] == 3
    assert "prove.polys" in snap["timers_s"]

    p = tmp_path / "metrics.json"
    m.write_json(str(p))
    on_disk = json.loads(p.read_text())
    assert on_disk == snap

    m.reset()
    assert m.snapshot() == {"timers_s": {}, "timer_calls": {}, "counters": {}}


def test_prove_records_phase_timings():
    """A real prove() run must leave per-phase timers in the global
    registry (phase names from core/prover.py:prove)."""
    from bulletproofs_r1cs_gadgets_tpu import (
        BulletproofGens, PedersenGens, Prover, Scalar, Transcript, Verifier)

    METRICS.reset()
    pc, bp = PedersenGens.default(), BulletproofGens(8)
    pr = Prover(pc, Transcript(b"Factors"))
    cp, vp = pr.commit(Scalar(17), Scalar.random())
    cq, vq = pr.commit(Scalar(19), Scalar.random())
    _, _, o = pr.multiply(vp, vq)
    pr.constrain(o - Scalar(323))
    proof = pr.prove(bp)

    snap = METRICS.snapshot()
    for phase in ("prove.phase1_commitments", "prove.ipp"):
        assert phase in snap["timers_s"], snap
        assert snap["timers_s"][phase] >= 0.0
    assert snap["counters"]["prove.proofs"] == 1

    ve = Verifier(Transcript(b"Factors"))
    _, _, o = ve.multiply(ve.commit(cp), ve.commit(cq))
    ve.constrain(o - Scalar(323))
    ve.verify(proof, pc, bp)
    METRICS.reset()
