"""Batch proving + mesh utilities (CPU)."""

from bulletproofs_r1cs_gadgets_tpu import (
    Scalar,
    PedersenGens,
    BulletproofGens,
)
from bulletproofs_r1cs_gadgets_tpu.gadgets.r1cs_utils import constrain_lc_with_scalar
from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_batch, verify_batch
from bulletproofs_r1cs_gadgets_tpu.parallel.mesh import make_mesh

PC = PedersenGens.default()
BP = BulletproofGens(128)


def test_prove_batch_factors():
    def build(cs, w):
        if isinstance(w, tuple):  # prover side: witness
            p, q = w
            com_p, var_p = cs.commit(p, Scalar.random())
            com_q, var_q = cs.commit(q, Scalar.random())
            _, _, o = cs.multiply(var_p, var_q)
            constrain_lc_with_scalar(cs, o, p * q)
            return [com_p, com_q, (p * q).to_bytes()]
        # verifier side: commitments
        com_p, com_q, r_bytes = w
        var_p = cs.commit(com_p)
        var_q = cs.commit(com_q)
        _, _, o = cs.multiply(var_p, var_q)
        constrain_lc_with_scalar(
            cs, o, Scalar.from_bytes_mod_order(r_bytes)
        )
        return w

    witnesses = [(Scalar(3), Scalar(5)), (Scalar(7), Scalar(11)), (Scalar(13), Scalar(17))]
    result = prove_batch(PC, BP, b"BatchFactors", witnesses, build)
    assert len(result.proofs) == 3
    verify_batch(PC, BP, b"BatchFactors", result, build)


def test_make_mesh_shapes():
    mesh = make_mesh()  # whatever devices exist
    assert set(mesh.axis_names) == {"batch", "points"}
    assert mesh.size >= 1
