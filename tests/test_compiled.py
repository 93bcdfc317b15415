"""Template-compiled circuits vs. the generic gadget path.

The compiled path (models/compiled.py) must produce the *exact* tape and
witness of the generic gadget synthesis — any divergence breaks
Fiat-Shamir symmetry with the reference circuit.  The strongest check here
is cross-verification: a proof from a compiled prover verified by a
generic (gadget-synthesizing) verifier, and vice versa.
"""

import numpy as np
import pytest

from bulletproofs_r1cs_gadgets_tpu import (
    BulletproofGens,
    PedersenGens,
    Prover,
    Scalar,
    Transcript,
    Verifier,
)
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.core.tape import TapeArrays
from bulletproofs_r1cs_gadgets_tpu.gadgets.poseidon import (
    Poseidon_hash_2,
    Poseidon_hash_2_gadget,
    PoseidonParams,
    SboxType,
    allocate_statics_for_prover,
    allocate_statics_for_verifier,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.r1cs_utils import AllocatedScalar
from bulletproofs_r1cs_gadgets_tpu.models.compiled import (
    CompiledPoseidon2,
    CompiledVSMT2,
)
from bulletproofs_r1cs_gadgets_tpu.models.vsmt2 import (
    VanillaSparseMerkleTree,
    leaf_index_bit_scalars,
    vanilla_merkle_tree_verif_gadget,
)

DEPTH = 4


@pytest.fixture(scope="module")
def params():
    return PoseidonParams(6, 4, 4, 140)


@pytest.fixture(scope="module")
def tree(params):
    t = VanillaSparseMerkleTree(params, depth=DEPTH)
    for i in range(1, 6):
        t.update(Scalar(i), Scalar(i))
    return t


def _tape_key(tape: TapeArrays):
    """Canonical comparable form of a tape: sorted term tuples per kind."""
    out = {}
    for kind in ("lc", "rc", "oc", "vc", "onec"):
        cidx, widx, coeff = getattr(tape, kind)
        rows = sorted(
            zip(
                cidx.tolist(),
                widx.tolist(),
                [tuple(r) for r in coeff.tolist()],
            )
        )
        out[kind] = rows
    return out


def _generic_prover_tape(params, tree, k):
    mp = []
    assert tree.get(k, mp) == k
    pc = PedersenGens.default()
    prover = Prover(pc, Transcript(b"VSMT"))
    _, var = prover.commit(k, Scalar.random())
    leaf = AllocatedScalar(var, k)
    li = []
    for b in leaf_index_bit_scalars(k, DEPTH):
        _, v = prover.commit(b, Scalar.random())
        li.append(AllocatedScalar(v, b))
    pf = []
    for p in reversed(mp):
        _, v = prover.commit(p, Scalar.random())
        pf.append(AllocatedScalar(v, p))
    statics = allocate_statics_for_prover(prover, 4)
    vanilla_merkle_tree_verif_gadget(
        prover, DEPTH, tree.root, leaf, li, pf, statics, params,
        constrain_index_bits=False,
    )
    return prover, mp


def test_vsmt_tape_and_witness_match_generic(params, tree):
    k = Scalar(3)
    prover, mp = _generic_prover_tape(params, tree, k)
    generic_tape = TapeArrays(prover.constraints)
    gen_aL, gen_aR, gen_aO = (
        scvec.from_scalars(prover.a_L),
        scvec.from_scalars(prover.a_R),
        scvec.from_scalars(prover.a_O),
    )

    comp = CompiledVSMT2(params, DEPTH, constrain_index_bits=False)
    assert comp.num_multipliers == prover.num_multipliers()
    assert comp.num_constraints == prover.num_constraints()
    tape = comp.tape(tree.root)

    assert _tape_key(tape) == _tape_key(generic_tape)

    bits = [b.v for b in leaf_index_bit_scalars(k, DEPTH)]
    aL, aR, aO = comp.witness(k, bits, list(reversed(mp)))
    assert np.array_equal(aL, gen_aL)
    assert np.array_equal(aR, gen_aR)
    assert np.array_equal(aO, gen_aO)
    assert comp._root == tree.root


def test_vsmt_compiled_prover_generic_verifier(params, tree):
    k = Scalar(2)
    mp = []
    assert tree.get(k, mp) == k
    bits = [b.v for b in leaf_index_bit_scalars(k, DEPTH)]
    nodes = list(reversed(mp))

    pc = PedersenGens.default()
    bp = BulletproofGens(4096)
    comp = CompiledVSMT2(params, DEPTH, constrain_index_bits=False)

    prover = Prover(pc, Transcript(b"VSMT"))
    comms = comp.commit_prover(prover, k, bits, nodes)
    aL, aR, aO = comp.witness(k, bits, nodes)
    prover.load_compiled(comp.tape(tree.root), aL, aR, aO)
    proof = prover.prove(bp)

    # generic verifier re-synthesizes the circuit the reference way
    verifier = Verifier(Transcript(b"VSMT"))
    it = iter(comms)
    leaf = AllocatedScalar(verifier.commit(next(it)))
    li = [AllocatedScalar(verifier.commit(next(it))) for _ in range(DEPTH)]
    pf = [AllocatedScalar(verifier.commit(next(it))) for _ in range(DEPTH)]
    vstatics = allocate_statics_for_verifier(verifier, 4, pc)
    vanilla_merkle_tree_verif_gadget(
        verifier, DEPTH, tree.root, leaf, li, pf, vstatics, params,
        constrain_index_bits=False,
    )
    verifier.verify(proof, pc, bp)  # raises on failure


@pytest.mark.slow
def test_vsmt_generic_prover_compiled_verifier(params, tree):
    k = Scalar(5)
    prover, mp = _generic_prover_tape(params, tree, k)
    pc = PedersenGens.default()
    bp = BulletproofGens(4096)
    proof = prover.prove(bp)

    comp = CompiledVSMT2(params, DEPTH, constrain_index_bits=False)
    verifier = Verifier(Transcript(b"VSMT"))
    # re-issue the same commitments in bench order
    comms = [c for c in _commitments_of(prover)]
    comp.commit_verifier(verifier, comms, pc)
    verifier.load_compiled(comp.tape(tree.root), comp.num_multipliers)
    verifier.verify(proof, pc, bp)


def _commitments_of(prover):
    """Recompute the prover's compressed commitments from its stored
    witness (same order as commit calls)."""
    pc = prover.pc_gens
    return [
        pc.commit(v, b).compress()
        for v, b in zip(prover.v, prover.v_blinding)
    ][: 2 * DEPTH + 1]  # leaf + bits + nodes; statics re-derived


def test_vsmt_constrained_bits_variant(params, tree):
    k = Scalar(1)
    mp = []
    assert tree.get(k, mp) == k
    bits = [b.v for b in leaf_index_bit_scalars(k, DEPTH)]
    nodes = list(reversed(mp))
    pc = PedersenGens.default()
    bp = BulletproofGens(4096)
    comp = CompiledVSMT2(params, DEPTH, constrain_index_bits=True)

    prover = Prover(pc, Transcript(b"VSMT"))
    comms = comp.commit_prover(prover, k, bits, nodes)
    aL, aR, aO = comp.witness(k, bits, nodes)
    prover.load_compiled(comp.tape(tree.root), aL, aR, aO)
    proof = prover.prove(bp)

    verifier = Verifier(Transcript(b"VSMT"))
    comp.commit_verifier(verifier, comms, pc)
    verifier.load_compiled(comp.tape(tree.root), comp.num_multipliers)
    verifier.verify(proof, pc, bp)


def test_poseidon2_compiled_matches_generic(params):
    xl, xr = Scalar(31), Scalar(59)
    expected = Poseidon_hash_2(xl, xr, params, SboxType.Inverse)
    pc = PedersenGens.default()

    prover = Prover(pc, Transcript(b"PoseidonBench"))
    _, v_l = prover.commit(xl, Scalar.random())
    _, v_r = prover.commit(xr, Scalar.random())
    statics = allocate_statics_for_prover(prover, 4)
    Poseidon_hash_2_gadget(
        prover, AllocatedScalar(v_l, xl), AllocatedScalar(v_r, xr),
        statics, params, SboxType.Inverse, expected,
    )
    generic_tape = TapeArrays(prover.constraints)

    comp = CompiledPoseidon2(params, SboxType.Inverse)
    assert comp.num_multipliers == prover.num_multipliers()
    assert comp.num_constraints == prover.num_constraints()
    assert _tape_key(comp.tape(expected)) == _tape_key(generic_tape)

    aL, aR, aO = comp.witness(xl, xr)
    assert np.array_equal(aL, scvec.from_scalars(prover.a_L))
    assert np.array_equal(aR, scvec.from_scalars(prover.a_R))
    assert np.array_equal(aO, scvec.from_scalars(prover.a_O))
    assert comp._hash == expected


def test_poseidon2_compiled_roundtrip(params):
    xl, xr = Scalar(123), Scalar(456)
    expected = Poseidon_hash_2(xl, xr, params, SboxType.Inverse)
    pc = PedersenGens.default()
    bp = BulletproofGens(2048)
    comp = CompiledPoseidon2(params, SboxType.Inverse)

    prover = Prover(pc, Transcript(b"PoseidonBench"))
    c_l, _ = prover.commit(xl, Scalar.random())
    c_r, _ = prover.commit(xr, Scalar.random())
    allocate_statics_for_prover(prover, 4)
    aL, aR, aO = comp.witness(xl, xr)
    prover.load_compiled(comp.tape(expected), aL, aR, aO)
    proof = prover.prove(bp)

    verifier = Verifier(Transcript(b"PoseidonBench"))
    verifier.commit(c_l)
    verifier.commit(c_r)
    allocate_statics_for_verifier(verifier, 4, pc)
    verifier.load_compiled(comp.tape(expected), comp.num_multipliers)
    verifier.verify(proof, pc, bp)


# ------------------------------------------------------------------ VSMT-4
from bulletproofs_r1cs_gadgets_tpu.models.compiled import CompiledVSMT4
from bulletproofs_r1cs_gadgets_tpu.models.vsmt4 import (
    VanillaSparseMerkleTree4,
    vanilla_merkle_tree_4_verif_gadget,
)


@pytest.fixture(scope="module")
def tree4(params):
    t = VanillaSparseMerkleTree4(params, depth=4)
    for i in range(1, 6):
        t.update(Scalar(i), Scalar(i))
    return t


def _generic_vsmt4_prover(params, tree4, k):
    """Prover synthesized the reference way (tests/test_trees.py order)."""
    depth = tree4.depth
    mp = []
    assert tree4.get(k, mp) == k
    pc = PedersenGens.default()
    prover = Prover(pc, Transcript(b"VSMT"))
    _, var = prover.commit(k, Scalar.random())
    leaf = AllocatedScalar(var, k)
    _, var = prover.commit(k, Scalar.random())
    idx = AllocatedScalar(var, k)
    pf = []
    nodes_flat = []
    for level in mp:  # root level first, 3 siblings in child order
        for elem in level:
            _, v = prover.commit(elem, Scalar.random())
            pf.append(AllocatedScalar(v, elem))
            nodes_flat.append(elem)
    statics = allocate_statics_for_prover(prover, 2)
    vanilla_merkle_tree_4_verif_gadget(
        prover, depth, tree4.root, leaf, idx, pf, statics, params,
    )
    return prover, nodes_flat


def test_vsmt4_tape_and_witness_match_generic(params, tree4):
    k = Scalar(3)
    prover, nodes_flat = _generic_vsmt4_prover(params, tree4, k)
    generic_tape = TapeArrays(prover.constraints)

    comp = CompiledVSMT4(params, tree4.depth)
    assert comp.num_multipliers == prover.num_multipliers()
    assert comp.num_constraints == prover.num_constraints()
    assert _tape_key(comp.tape(tree4.root)) == _tape_key(generic_tape)

    aL, aR, aO = comp.witness(k, k, nodes_flat)
    assert np.array_equal(aL, scvec.from_scalars(prover.a_L))
    assert np.array_equal(aR, scvec.from_scalars(prover.a_R))
    assert np.array_equal(aO, scvec.from_scalars(prover.a_O))
    assert comp._root == tree4.root


def test_vsmt4_compiled_prover_generic_verifier(params, tree4):
    depth = tree4.depth
    k = Scalar(2)
    mp = []
    assert tree4.get(k, mp) == k
    nodes_flat = [elem for level in mp for elem in level]

    pc = PedersenGens.default()
    bp = BulletproofGens(8192)
    comp = CompiledVSMT4(params, depth)

    prover = Prover(pc, Transcript(b"VSMT"))
    comms = comp.commit_prover(prover, k, k, nodes_flat)
    aL, aR, aO = comp.witness(k, k, nodes_flat)
    prover.load_compiled(comp.tape(tree4.root), aL, aR, aO)
    proof = prover.prove(bp)

    # generic verifier re-synthesizes the circuit the reference way
    verifier = Verifier(Transcript(b"VSMT"))
    it = iter(comms)
    leaf = AllocatedScalar(verifier.commit(next(it)))
    idx = AllocatedScalar(verifier.commit(next(it)))
    pf = [AllocatedScalar(verifier.commit(next(it)))
          for _ in range(3 * depth)]
    vstatics = allocate_statics_for_verifier(verifier, 2, pc)
    vanilla_merkle_tree_4_verif_gadget(
        verifier, depth, tree4.root, leaf, idx, pf, vstatics, params,
    )
    verifier.verify(proof, pc, bp)


@pytest.mark.slow
def test_vsmt4_generic_prover_compiled_verifier(params, tree4):
    depth = tree4.depth
    k = Scalar(5)
    prover, _ = _generic_vsmt4_prover(params, tree4, k)
    pc = PedersenGens.default()
    bp = BulletproofGens(8192)
    proof = prover.prove(bp)

    comp = CompiledVSMT4(params, depth)
    verifier = Verifier(Transcript(b"VSMT"))
    comms = [
        pc.commit(v, b).compress()
        for v, b in zip(prover.v, prover.v_blinding)
    ][: 2 + 3 * depth]
    comp.commit_verifier(verifier, comms, pc)
    verifier.load_compiled(comp.tape(tree4.root), comp.num_multipliers)
    verifier.verify(proof, pc, bp)
