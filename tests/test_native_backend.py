"""Single-core C++ backend (ops/native_backend.py) vs the host oracle.

The NativeBackend is the measured single-core baseline proxy (BASELINE.md):
its MSM/fold primitives must match the Python Pippenger exactly, and with a
deterministic rng it must produce BYTE-IDENTICAL proofs to the host path
(same Fiat-Shamir schedule — the property that makes its timing a faithful
stand-in for the reference engine's single-core cost).
"""

import random

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
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import multiscalar_mul
from bulletproofs_r1cs_gadgets_tpu.ops.native_backend import (
    NativeBackend,
    native_available,
    _pts_to_raw,
    _raw_to_pt,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def backend():
    return NativeBackend()


def _rand_points(n, seed=7):
    B = PedersenGens.default().B
    rnd = random.Random(seed)
    return [B.scalar_mul(Scalar(rnd.randrange(1, 1 << 252))) for _ in range(n)]


def test_native_msm_matches_host(backend):
    rnd = random.Random(3)
    for n in (1, 2, 31, 33, 100, 600, 900):
        pts = _rand_points(n, seed=n)
        scalars = [Scalar(rnd.randrange(1 << 253)) for _ in range(n)]
        assert backend.msm(scalars, pts) == multiscalar_mul(scalars, pts)


def test_native_msm_zero_and_order_scalars(backend):
    pts = _rand_points(8)
    scalars = [Scalar.zero()] * 4 + [Scalar(1), Scalar(2), Scalar(3), Scalar(0)]
    assert backend.msm(scalars, pts) == multiscalar_mul(scalars, pts)


def test_native_fold_matches_host(backend):
    from bulletproofs_r1cs_gadgets_tpu.native import _native

    n = 16
    L = _rand_points(n, seed=1)
    R = _rand_points(n, seed=2)
    cL, cR = Scalar(123456789), Scalar(987654321).invert()
    Lr = np.ascontiguousarray(_pts_to_raw(L))
    Rr = np.ascontiguousarray(_pts_to_raw(R))
    out = np.empty_like(Lr)
    from bulletproofs_r1cs_gadgets_tpu.ops.native_backend import _ptr

    _native._lib.ge_fold_vec(
        _ptr(Lr), _ptr(Rr),
        scvec._ptr(scvec.from_scalars([cL])),
        scvec._ptr(scvec.from_scalars([cR])),
        _ptr(out), n,
    )
    for i in range(n):
        want = multiscalar_mul([cL, cR], [L[i], R[i]])
        assert _raw_to_pt(out[i]) == want


def test_native_fold_var_matches_host(backend):
    from bulletproofs_r1cs_gadgets_tpu.native import _native
    from bulletproofs_r1cs_gadgets_tpu.ops.native_backend import _ptr

    rnd = random.Random(9)
    n = 8
    L = _rand_points(n, seed=4)
    R = _rand_points(n, seed=5)
    sL = [Scalar(rnd.randrange(1 << 253)) for _ in range(n)]
    sR = [Scalar(rnd.randrange(1 << 253)) for _ in range(n)]
    Lr = np.ascontiguousarray(_pts_to_raw(L))
    Rr = np.ascontiguousarray(_pts_to_raw(R))
    out = np.empty_like(Lr)
    _native._lib.ge_fold_vec_var(
        _ptr(Lr), _ptr(Rr),
        scvec._ptr(scvec.from_scalars(sL)),
        scvec._ptr(scvec.from_scalars(sR)),
        _ptr(out), n,
    )
    for i in range(n):
        want = multiscalar_mul([sL[i], sR[i]], [L[i], R[i]])
        assert _raw_to_pt(out[i]) == want


def _bound_check_prover(backend, rng):
    from bulletproofs_r1cs_gadgets_tpu.gadgets.bound_check import (
        bound_check_gadget,
    )
    from bulletproofs_r1cs_gadgets_tpu.gadgets.r1cs_utils import (
        AllocatedQuantity,
    )

    pc = PedersenGens.default()
    bp = BulletproofGens(256)
    prover = Prover(pc, Transcript(b"NativeBounds"), rng=rng)
    val, lower, upper, bits = 42, 10, 100, 32
    a, b = val - lower, upper - val
    com_v, var_v = prover.commit(Scalar(val), Scalar.random(rng))
    com_a, var_a = prover.commit(Scalar(a), Scalar.random(rng))
    com_b, var_b = prover.commit(Scalar(b), Scalar.random(rng))
    bound_check_gadget(
        prover,
        AllocatedQuantity(var_v, val),
        AllocatedQuantity(var_a, a),
        AllocatedQuantity(var_b, b),
        upper, lower, bits,
    )
    return prover, bp, pc, (com_v, com_a, com_b)


def test_native_backend_proof_bytes_match_host():
    """Byte-identical proofs host vs native backend (same rng seed)."""
    import numpy as _np

    backend = NativeBackend()
    pr1, bp, pc, comms = _bound_check_prover(
        backend, _np.random.RandomState(1234)
    )
    proof_native = pr1.prove(bp, backend=backend)
    pr2, _, _, _ = _bound_check_prover(backend, _np.random.RandomState(1234))
    proof_host = pr2.prove(bp, backend=None)
    assert proof_native.to_bytes() == proof_host.to_bytes()

    # and it verifies — through the native verifier MSM path too
    from bulletproofs_r1cs_gadgets_tpu.gadgets.bound_check import (
        bound_check_gadget,
    )
    from bulletproofs_r1cs_gadgets_tpu.gadgets.r1cs_utils import (
        AllocatedQuantity,
    )

    verifier = Verifier(Transcript(b"NativeBounds"))
    qs = [AllocatedQuantity(verifier.commit(c)) for c in comms]
    bound_check_gadget(verifier, *qs, 100, 10, 32)
    verifier.verify(proof_native, pc, bp, backend=backend)
