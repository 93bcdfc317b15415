"""Proof-engine tests: round trips, padding, phases, serialization,
negative cases.  (The reference has no engine tests in-repo - the engine was
an external dep - so these cover SURVEY.md S2b N5-N7 behaviour directly.)"""

import pytest

from bulletproofs_r1cs_gadgets_tpu import (
    Scalar,
    Transcript,
    Prover,
    Verifier,
    PedersenGens,
    BulletproofGens,
    R1CSProof,
)
from bulletproofs_r1cs_gadgets_tpu.core import errors

PC = PedersenGens.default()
BP = BulletproofGens(128)


def _factors_circuit(cs, var_p, var_q, r):
    _, _, o = cs.multiply(var_p, var_q)
    cs.constrain(o - r)


def _prove_factors(p, q, r, label=b"Factors"):
    prover = Prover(PC, Transcript(label))
    com_p, var_p = prover.commit(p, Scalar.random())
    com_q, var_q = prover.commit(q, Scalar.random())
    _factors_circuit(prover, var_p, var_q, r)
    return prover.prove(BP), (com_p, com_q)


def _verify_factors(proof, coms, r, label=b"Factors"):
    verifier = Verifier(Transcript(label))
    var_p = verifier.commit(coms[0])
    var_q = verifier.commit(coms[1])
    _factors_circuit(verifier, var_p, var_q, r)
    verifier.verify(proof, PC, BP)


def test_single_multiplier_roundtrip():
    proof, coms = _prove_factors(Scalar(17), Scalar(19), Scalar(323))
    _verify_factors(proof, coms, Scalar(323))


def test_wrong_public_input_fails():
    proof, coms = _prove_factors(Scalar(17), Scalar(19), Scalar(323))
    with pytest.raises(errors.VerificationError):
        _verify_factors(proof, coms, Scalar(324))


def test_wrong_label_fails():
    proof, coms = _prove_factors(Scalar(17), Scalar(19), Scalar(323))
    with pytest.raises(errors.VerificationError):
        _verify_factors(proof, coms, Scalar(323), label=b"Other")


def test_bad_witness_fails():
    # prover uses inconsistent witness: constraint is violated
    prover = Prover(PC, Transcript(b"Factors"))
    com_p, var_p = prover.commit(Scalar(17), Scalar.random())
    com_q, var_q = prover.commit(Scalar(19), Scalar.random())
    _factors_circuit(prover, var_p, var_q, Scalar(999))  # 17*19 != 999
    proof = prover.prove(BP)
    with pytest.raises(errors.VerificationError):
        _verify_factors(proof, (com_p, com_q), Scalar(999))


def test_proof_serialization_roundtrip():
    proof, coms = _prove_factors(Scalar(17), Scalar(19), Scalar(323))
    raw = proof.to_bytes()
    assert raw[0] == 0  # one-phase tag
    proof2 = R1CSProof.from_bytes(raw)
    assert proof2 == proof
    _verify_factors(proof2, coms, Scalar(323))


def test_proof_tamper_detected():
    proof, coms = _prove_factors(Scalar(17), Scalar(19), Scalar(323))
    raw = bytearray(proof.to_bytes())
    raw[50] ^= 0x40
    with pytest.raises((errors.VerificationError, errors.FormatError)):
        _verify_factors(R1CSProof.from_bytes(bytes(raw)), coms, Scalar(323))


def test_non_power_of_two_padding():
    # 3 multipliers -> padded to 4
    prover = Prover(PC, Transcript(b"Pad"))
    com, var = prover.commit(Scalar(3), Scalar.random())
    _, _, o1 = prover.multiply(var, var)  # 9
    _, _, o2 = prover.multiply(o1, var)  # 27
    _, _, o3 = prover.multiply(o2, var)  # 81
    prover.constrain(o3 - Scalar(81))
    proof = prover.prove(BP)

    verifier = Verifier(Transcript(b"Pad"))
    v = verifier.commit(com)
    _, _, o1 = verifier.multiply(v, v)
    _, _, o2 = verifier.multiply(o1, v)
    _, _, o3 = verifier.multiply(o2, v)
    verifier.constrain(o3 - Scalar(81))
    verifier.verify(proof, PC, BP)


def test_allocate_single_pairing():
    # two allocate_single calls share one multiplier; out wire = product
    prover = Prover(PC, Transcript(b"Alloc"))
    com, var = prover.commit(Scalar(6), Scalar.random())
    v1, out1 = prover.allocate_single(Scalar(6))
    assert out1 is None
    v2, out2 = prover.allocate_single(Scalar(7))
    assert out2 is not None
    prover.constrain(v1 - var)
    prover.constrain(out2 - Scalar(42))
    assert prover.num_multipliers() == 1
    proof = prover.prove(BP)

    verifier = Verifier(Transcript(b"Alloc"))
    v = verifier.commit(com)
    v1, _ = verifier.allocate_single()
    v2, out2 = verifier.allocate_single()
    verifier.constrain(v1 - v)
    verifier.constrain(out2 - Scalar(42))
    verifier.verify(proof, PC, BP)


def test_evaluate_lc():
    prover = Prover(PC, Transcript(b"Eval"))
    _, var = prover.commit(Scalar(5), Scalar.random())
    lc = var + Scalar(3)
    assert prover.evaluate_lc(lc) == Scalar(8)
    verifier = Verifier(Transcript(b"Eval"))
    vv = verifier.commit(b"\x00" * 32)
    assert verifier.evaluate_lc(vv + Scalar(3)) is None


def test_randomized_constraints_two_phase():
    # gadget with a deferred (phase-2) constraint using a challenge scalar
    def build(cs, var, value):
        _, _, o = cs.multiply(var, var)

        def deferred(rcs):
            ch = rcs.challenge_scalar(b"rand")
            # allocate a phase-2 multiplier: (v*ch) * 1 == v*ch
            if value is not None:
                prod = value * ch
                a, b, out = rcs.allocate_multiplier((prod, Scalar.one()))
            else:
                a, b, out = rcs.allocate_multiplier(None)
            rcs.constrain(a - var * ch)
            rcs.constrain(b - Scalar.one())

        cs.specify_randomized_constraints(deferred)
        return o

    val = Scalar(9)
    prover = Prover(PC, Transcript(b"TwoPhase"))
    com, var = prover.commit(val, Scalar.random())
    o = build(prover, var, val)
    prover.constrain(o - Scalar(81))
    proof = prover.prove(BP)
    assert proof.to_bytes()[0] == 1  # two-phase tag

    verifier = Verifier(Transcript(b"TwoPhase"))
    v = verifier.commit(com)
    o = build(verifier, v, None)
    verifier.constrain(o - Scalar(81))
    verifier.verify(proof, PC, BP)

    # serialization roundtrip keeps phase-2 commitments
    p2 = R1CSProof.from_bytes(proof.to_bytes())
    verifier = Verifier(Transcript(b"TwoPhase"))
    v = verifier.commit(com)
    o = build(verifier, v, None)
    verifier.constrain(o - Scalar(81))
    verifier.verify(p2, PC, BP)


def test_gens_capacity_error():
    prover = Prover(PC, Transcript(b"Big"))
    _, var = prover.commit(Scalar(2), Scalar.random())
    for _ in range(129):
        prover.multiply(var, var)
    with pytest.raises(errors.InvalidGeneratorsLength):
        prover.prove(BP)


def test_missing_assignment():
    prover = Prover(PC, Transcript(b"Missing"))
    with pytest.raises(errors.MissingAssignment):
        prover.allocate_multiplier(None)
    with pytest.raises(errors.MissingAssignment):
        prover.allocate(None)


def test_circuit_stats():
    prover = Prover(PC, Transcript(b"Stats"))
    _, var = prover.commit(Scalar(2), Scalar.random())
    for _ in range(3):
        prover.multiply(var, var)
    st = prover.stats()
    assert st.multipliers == 3
    assert st.padded_multipliers == 4
    assert st.commitments == 1
    assert st.constraints == 6  # 2 wire constraints per multiply


def test_prover_snapshot_restore():
    # snapshot after synthesis; two proofs from one tape, both verify
    prover = Prover(PC, Transcript(b"Snap"))
    com, var = prover.commit(Scalar(6), Scalar.random())
    _, _, o = prover.multiply(var, var)
    prover.constrain(o - Scalar(36))
    snap = prover.snapshot()
    p1 = prover.prove(BP)
    prover.restore(snap)
    p2 = prover.prove(BP)
    for proof in (p1, p2):
        verifier = Verifier(Transcript(b"Snap"))
        v = verifier.commit(com)
        _, _, o = verifier.multiply(v, v)
        verifier.constrain(o - Scalar(36))
        verifier.verify(proof, PC, BP)
    # the two proofs use fresh blinding randomness
    assert p1.to_bytes() != p2.to_bytes()
