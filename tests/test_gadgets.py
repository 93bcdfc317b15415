"""Gadget-zoo round-trip tests, mirroring the reference's in-file tests
(SURVEY.md S4: 22 prove->verify round trips) plus the negative tests the
reference lacks.  Reference test sites cited per test.
"""

import pytest

from bulletproofs_r1cs_gadgets_tpu import (
    Scalar,
    Transcript,
    Prover,
    Verifier,
    PedersenGens,
    BulletproofGens,
)
from bulletproofs_r1cs_gadgets_tpu.core import errors
from bulletproofs_r1cs_gadgets_tpu.gadgets.r1cs_utils import (
    AllocatedScalar,
    AllocatedQuantity,
    positive_no_gadget,
    constrain_lc_with_scalar,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.factors import (
    gen_proof_of_factors,
    verify_proof_of_factors,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.bound_check import (
    gen_proof_of_bounded_num,
    verify_proof_of_bounded_num,
    count_bits,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.range_proof import (
    gen_range_proof,
    verify_range_proof,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.zero_nonzero import (
    is_zero_gadget,
    is_nonzero_gadget,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.not_equals import (
    gen_proof_of_not_equals,
    verify_proof_of_not_equals,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.set_membership import (
    gen_proof_of_set_membership,
    verify_proof_of_set_membership,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.set_membership_1 import (
    gen_proof_of_set_membership_1,
    verify_proof_of_set_membership_1,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.set_non_membership import (
    gen_proof_of_set_non_membership,
    verify_proof_of_set_non_membership,
)

PC = PedersenGens.default()
BP = BulletproofGens(128)

SET = [2, 3, 5, 6, 8, 20, 25]  # reference's test set


def test_factor_r1cs():
    # factors.rs:47-103
    proof, coms, r = gen_proof_of_factors(Scalar(17), Scalar(19), b"Factors", PC, BP)
    assert r == Scalar(323)
    verify_proof_of_factors(r, proof, coms, b"Factors", PC, BP)
    with pytest.raises(errors.VerificationError):
        verify_proof_of_factors(Scalar(322), proof, coms, b"Factors", PC, BP)


def test_bound_check_gadget_small_value():
    # gadget_bound_check.rs:146-154
    mn, mx = 10, 100
    bit_size = count_bits(mx)
    proof, coms = gen_proof_of_bounded_num(
        57, Scalar.random(), mn, mx, bit_size, b"BoundsTest", PC, BP
    )
    verify_proof_of_bounded_num(mn, mx, bit_size, proof, coms, b"BoundsTest", PC, BP)


def test_bound_check_gadget_large_value():
    # gadget_bound_check.rs:157-170
    mx = (2**64 - 1) // 100000
    mn = (2**64 - 1) // 100001
    bit_size = count_bits(mx)
    v = (mn + mx) // 2
    proof, coms = gen_proof_of_bounded_num(
        v, None, mn, mx, bit_size, b"BoundsTest", PC, BP
    )
    verify_proof_of_bounded_num(mn, mx, bit_size, proof, coms, b"BoundsTest", PC, BP)
    mn2 = (2**64 - 1) // 100009
    v2 = (mn2 + mx) // 2
    proof, coms = gen_proof_of_bounded_num(
        v2, None, mn2, mx, bit_size, b"BoundsTest", PC, BP
    )
    verify_proof_of_bounded_num(mn2, mx, bit_size, proof, coms, b"BoundsTest", PC, BP)


def test_bound_check_out_of_range_unprovable():
    # negative: a = v - lower underflows the field; bit decomposition of the
    # huge field element cannot satisfy the n-bit constraint -> proof invalid
    v, mn, mx = 5, 10, 100
    a = (v - mn) % (2**64)  # what a buggy/malicious prover might use
    prover = Prover(PC, Transcript(b"BoundsTest"))
    com_v, var_v = prover.commit(Scalar(v), Scalar.random())
    com_a, var_a = prover.commit(Scalar(a), Scalar.random())
    com_b, var_b = prover.commit(Scalar(mx - v), Scalar.random())
    from bulletproofs_r1cs_gadgets_tpu.gadgets.bound_check import bound_check_gadget

    bound_check_gadget(
        prover,
        AllocatedQuantity(var_v, v),
        AllocatedQuantity(var_a, a),
        AllocatedQuantity(var_b, mx - v),
        mx,
        mn,
        count_bits(mx),
    )
    proof = prover.prove(BP)
    with pytest.raises(errors.VerificationError):
        verify_proof_of_bounded_num(
            mn, mx, count_bits(mx), proof, [com_v, com_a, com_b], b"BoundsTest", PC, BP
        )


def test_range_proof_gadget():
    # gadget_range_proof.rs:113-125
    proof, coms = gen_range_proof(57, 10, 100, b"BoundsTest", PC, BP)
    verify_range_proof(10, 100, proof, coms, b"BoundsTest", PC, BP)


def test_is_zero_non_zero():
    # gadget_zero_nonzero.rs:73-161
    # zero branch
    prover = Prover(PC, Transcript(b"ZeroTest"))
    com, var = prover.commit(Scalar.zero(), Scalar.random())
    is_zero_gadget(prover, AllocatedScalar(var, Scalar.zero()))
    proof = prover.prove(BP)
    verifier = Verifier(Transcript(b"ZeroTest"))
    is_zero_gadget(verifier, AllocatedScalar(verifier.commit(com)))
    verifier.verify(proof, PC, BP)

    # nonzero branch
    value = Scalar.random()
    inv = value.invert()
    prover = Prover(PC, Transcript(b"NonZeroTest"))
    com_v, var_v = prover.commit(value, Scalar.random())
    com_i, var_i = prover.commit(inv, Scalar.random())
    is_nonzero_gadget(
        prover, AllocatedScalar(var_v, value), AllocatedScalar(var_i, inv)
    )
    proof = prover.prove(BP)
    verifier = Verifier(Transcript(b"NonZeroTest"))
    is_nonzero_gadget(
        verifier,
        AllocatedScalar(verifier.commit(com_v)),
        AllocatedScalar(verifier.commit(com_i)),
    )
    verifier.verify(proof, PC, BP)


def test_is_zero_rejects_nonzero_value():
    prover = Prover(PC, Transcript(b"ZeroTest"))
    com, var = prover.commit(Scalar(5), Scalar.random())
    is_zero_gadget(prover, AllocatedScalar(var, Scalar(5)))
    proof = prover.prove(BP)
    verifier = Verifier(Transcript(b"ZeroTest"))
    is_zero_gadget(verifier, AllocatedScalar(verifier.commit(com)))
    with pytest.raises(errors.VerificationError):
        verifier.verify(proof, PC, BP)


def test_not_equals_gadget():
    # gadget_not_equals.rs:34-41
    proof, coms = gen_proof_of_not_equals(10, 5, b"NotEqualsTest", PC, BP)
    verify_proof_of_not_equals(5, proof, coms, b"NotEqualsTest", PC, BP)


def test_set_membership_check_gadget():
    # gadget_set_membership.rs:178-190
    proof, coms = gen_proof_of_set_membership(
        3, Scalar.random(), SET, b"SetMemebershipTest", PC, BP
    )
    verify_proof_of_set_membership(SET, proof, coms, b"SetMemebershipTest", PC, BP)


def test_set_membership_non_member_unprovable():
    # 4 is not in the set: the one-hot bitmap is all-zero, sum != 1
    proof, coms = gen_proof_of_set_membership(
        4, None, SET, b"SetMemebershipTest", PC, BP
    )
    with pytest.raises(errors.VerificationError):
        verify_proof_of_set_membership(SET, proof, coms, b"SetMemebershipTest", PC, BP)


def test_set_membership_1_check_gadget():
    # gadget_set_membership_1.rs:118-130
    proof, coms = gen_proof_of_set_membership_1(
        20, Scalar.random(), SET, b"SetMemebership1Test", PC, BP
    )
    verify_proof_of_set_membership_1(SET, proof, coms, b"SetMemebership1Test", PC, BP)


def test_set_non_membership_check_gadget():
    # gadget_set_non_membership.rs:132-144
    proof, coms = gen_proof_of_set_non_membership(
        10, Scalar.random(), SET, b"SetNonMemebershipTest", PC, BP
    )
    verify_proof_of_set_non_membership(
        SET, proof, coms, b"SetNonMemebershipTest", PC, BP
    )


def test_set_non_membership_member_unprovable():
    # 20 IS in the set: diff = 0 has no inverse; proof cannot verify
    proof, coms = gen_proof_of_set_non_membership(
        20, None, SET, b"SetNonMemebershipTest", PC, BP
    )
    with pytest.raises(errors.VerificationError):
        verify_proof_of_set_non_membership(
            SET, proof, coms, b"SetNonMemebershipTest", PC, BP
        )


def test_positive_no_gadget_bit_width():
    # value exactly at 2^n - 1 passes; 2^n fails
    n = 6
    for val, ok in [(63, True), (64, False)]:
        prover = Prover(PC, Transcript(b"Pos"))
        com, var = prover.commit(Scalar(val), Scalar.random())
        positive_no_gadget(prover, AllocatedQuantity(var, val), n)
        proof = prover.prove(BP)
        verifier = Verifier(Transcript(b"Pos"))
        positive_no_gadget(verifier, AllocatedQuantity(verifier.commit(com)), n)
        if ok:
            verifier.verify(proof, PC, BP)
        else:
            with pytest.raises(errors.VerificationError):
                verifier.verify(proof, PC, BP)
