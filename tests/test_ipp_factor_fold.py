"""Exact CPU equivalence of the factor-tracked device IPP.

The PallasBackend IPP folds generators as D' = D_L + c * D_R with host-
tracked factor vectors multiplied into the MSM scalars
(ops/pallas_backend._IppJob, ops/pallas_curve._emit_fold_c).  Proof bytes
must be IDENTICAL to the plain host engine's (dalek wire format,
/root/reference/Cargo.toml:22-26 semantics): any error in the factor
bookkeeping (breakpoint evolution, c constants, y^-m geometry) diverges
the L/R points and breaks Fiat-Shamir.

Strategy: replace the two TPU pallas kernels the tail/chunk path uses
(msm_chunk_acc_w4, fold_chunk) with EXACT host implementations over the
real chunk layouts, seed all prover randomness, and assert byte equality
between `prove(backend=PallasBackend())` and `prove(backend=None)`, plus
a real verification.  padded_n = 64 with n1 = 33 puts the factor
breakpoint strictly inside the vector, exercising the piecewise-c path
every round.
"""

import hashlib

import numpy as np
import jax.numpy as jnp

from bulletproofs_r1cs_gadgets_tpu import (
    BulletproofGens,
    PedersenGens,
    Prover,
    Scalar,
    Transcript,
    Verifier,
)
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import RistrettoPoint
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc
from bulletproofs_r1cs_gadgets_tpu.ops.field import STORE, limbs_to_int
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L, P


# ------------------------------------------------------- layout codecs
def _lane_point(rows: np.ndarray, i: int) -> RistrettoPoint:
    c = rows[:, i].reshape(4, STORE)
    return RistrettoPoint(
        limbs_to_int(c[0]) % P,
        limbs_to_int(c[1]) % P,
        limbs_to_int(c[2]) % P,
        limbs_to_int(c[3]) % P,
    )


def _flat(chunk) -> np.ndarray:
    a = np.asarray(chunk)
    return a.reshape(pc.ROWS, a.shape[1] * a.shape[2])


def _decode_w4_lane(words: np.ndarray, i: int) -> int:
    """Packed signed-nibble words for point i -> scalar (mod L)."""
    total = 0
    w = words[:, i // pc.LAN_BLOCK, i % pc.LAN_BLOCK].view(np.uint32)
    for j in range(8):
        word = int(w[j])
        for t in range(8):
            nib = (word >> (4 * t)) & 15
            d = nib - 16 if nib >= 8 else nib
            total += d << (4 * (8 * j + t))
    return total % L


def _decode_bits_lane(words: np.ndarray, i: int) -> int:
    w = words[:, i // pc.LAN_BLOCK, i % pc.LAN_BLOCK].view(np.uint32)
    return sum(int(v) << (32 * j) for j, v in enumerate(w)) % L


def _encode_broadcast(pt: RistrettoPoint) -> jnp.ndarray:
    from bulletproofs_r1cs_gadgets_tpu.ops.curve import _ints_to_limbs_vec

    col = _ints_to_limbs_vec([pt.X, pt.Y, pt.Z, pt.T]).reshape(pc.ROWS, 1)
    return jnp.asarray(
        np.broadcast_to(col, (pc.ROWS, pc.SUB * pc.LAN_BLOCK)).reshape(
            pc.ROWS, pc.SUB, pc.LAN_BLOCK
        )
    )


_IDENT_COL = np.zeros(pc.ROWS, np.int32)
_IDENT_COL[STORE] = 1
_IDENT_COL[2 * STORE] = 1


def _smul(pt: RistrettoPoint, k: int) -> RistrettoPoint:
    if k == 0:
        return RistrettoPoint.identity()
    if k == 1:
        return pt
    return pt.scalar_mul(Scalar(k))


def sim_msm_chunk_acc_w4(points, words, acc):
    """Exact host mirror of the w4 MSM chunk kernel: block total over all
    lanes (signed-digit scalars) + accumulator, broadcast to every
    position."""
    w = np.asarray(words)
    rows = _flat(points)
    nz = np.nonzero(w.any(axis=0).reshape(-1))[0]
    total = RistrettoPoint.identity()
    for i in nz:
        total = total + _smul(_lane_point(rows, i), _decode_w4_lane(w, i))
    prev = _lane_point(_flat(acc), 0)
    return _encode_broadcast(total + prev)


def sim_fold_chunk(left, right, words_l, words_r):
    """Exact host mirror of the dual bit-serial fold kernel: per lane
    wl_i * L_i + wr_i * R_i (identity where both scalars are zero)."""
    wl, wr = np.asarray(words_l), np.asarray(words_r)
    lrows, rrows = _flat(left), _flat(right)
    out = np.broadcast_to(
        _IDENT_COL[:, None], (pc.ROWS, lrows.shape[1])
    ).copy()
    nz = np.nonzero((wl.any(axis=0) | wr.any(axis=0)).reshape(-1))[0]
    from bulletproofs_r1cs_gadgets_tpu.ops.curve import _ints_to_limbs_vec

    for i in nz:
        p = _smul(_lane_point(lrows, i), _decode_bits_lane(wl, i)) + _smul(
            _lane_point(rrows, i), _decode_bits_lane(wr, i)
        )
        out[:, i] = _ints_to_limbs_vec([p.X, p.Y, p.Z, p.T]).reshape(pc.ROWS)
    return jnp.asarray(
        out.reshape(pc.ROWS, pc.SUB, out.shape[1] // pc.SUB)
    )


# ------------------------------------------------------- deterministic rng
class _DetRng:
    def __init__(self, seed: bytes):
        self._seed = seed
        self._ctr = 0

    def bytes(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            out += hashlib.sha256(
                self._seed + self._ctr.to_bytes(8, "little")
            ).digest()
            self._ctr += 1
        return out[:n]


def _det_scvec_random(seed: bytes):
    rng = _DetRng(seed)

    def random(n: int) -> np.ndarray:
        return scvec.from_wide_bytes(rng.bytes(64 * n))

    return random


def _prove(gens, backend, monkeypatch):
    """One deterministic prove: 33 multipliers (padded 64, so the factor
    breakpoint n1=33 sits inside the padded vector)."""
    import bulletproofs_r1cs_gadgets_tpu.core.prover as prover_mod

    monkeypatch.setattr(
        prover_mod.scvec, "random", _det_scvec_random(b"ffold-svr")
    )
    pc_gens, bp_gens = gens
    prover = Prover(
        pc_gens, Transcript(b"ffold"), rng=_DetRng(b"ffold-rng")
    )
    com, v = prover.commit(Scalar(41), Scalar(97))
    com2, v2 = prover.commit(Scalar(5), Scalar(13))
    _, _, o = prover.multiply(v + v2, v - v2)
    for _ in range(32):
        _, _, o = prover.multiply(o + Scalar(1), o + Scalar(2))
    assert prover.num_multipliers() == 33
    return com, com2, o, prover.prove(bp_gens, backend=backend)


def sim_msm_grid_pair(points, words, acc2, info):
    """Exact host mirror of the pair grid MSM kernel: chunks [0, v) sum
    into the low output block, [v, 2v) into the high one (w4 scalars),
    each block-reduced and chained through its accumulator."""
    v, lo_limit, hi_limit = int(info[0]), int(info[1]), int(info[2])
    w = np.asarray(words)
    p = np.asarray(points)
    a2 = np.asarray(acc2)
    outs = []
    for half, limit in ((0, lo_limit), (1, hi_limit)):
        total = RistrettoPoint.identity()
        for c in range(half * v, half * v + min(v, limit)):
            sl = slice(c * pc.LAN_BLOCK, (c + 1) * pc.LAN_BLOCK)
            wc = w[:, :, sl]
            prows = _flat(p[:, :, sl])
            nz = np.nonzero(wc.any(axis=0).reshape(-1))[0]
            for i in nz:
                total = total + _smul(
                    _lane_point(prows, i), _decode_w4_lane(wc, i)
                )
        hsl = slice(half * pc.LAN_BLOCK, (half + 1) * pc.LAN_BLOCK)
        prev = _lane_point(_flat(a2[:, :, hsl]), 0)
        outs.append(total + prev)
    from bulletproofs_r1cs_gadgets_tpu.ops.curve import _ints_to_limbs_vec

    out = np.empty((pc.ROWS, pc.SUB, 2 * pc.LAN_BLOCK), np.int32)
    for half, ptx in enumerate(outs):
        col = _ints_to_limbs_vec(
            [ptx.X, ptx.Y, ptx.Z, ptx.T]
        ).reshape(pc.ROWS, 1, 1)
        out[:, :, half * pc.LAN_BLOCK : (half + 1) * pc.LAN_BLOCK] = col
    return jnp.asarray(out)


def test_factor_fold_ipp_byte_exact(monkeypatch):
    """Legacy (pre-frozen-tail) device IPP path: per-round device folds +
    packed tail rounds, byte-exact vs the host engine."""
    import bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend as pb

    monkeypatch.setattr(pb, "FROZEN_MAX_SIDE", 0)  # disable frozen tail
    gens = (PedersenGens.default(), BulletproofGens(64))
    com, com2, _, ref = _prove(gens, None, monkeypatch)

    monkeypatch.setattr(pc, "msm_chunk_acc_w4", sim_msm_chunk_acc_w4)
    monkeypatch.setattr(pc, "fold_chunk", sim_fold_chunk)
    backend = PallasBackend()
    com_b, com2_b, _, got = _prove(gens, backend, monkeypatch)

    assert (com, com2) == (com_b, com2_b)
    assert got.to_bytes() == ref.to_bytes()

    # and the device-path proof verifies against a fresh host verifier
    verifier = Verifier(Transcript(b"ffold"))
    v = verifier.commit(com)
    v2 = verifier.commit(com2)
    _, _, o = verifier.multiply(v + v2, v - v2)
    for _ in range(32):
        _, _, o = verifier.multiply(o + Scalar(1), o + Scalar(2))
    verifier.verify(got, *gens)


def test_frozen_tail_ipp_byte_exact(monkeypatch):
    """Frozen-tail device IPP (padded 64 <= FROZEN_MAX_SIDE freezes from
    round 1): every round one pair dispatch over the packed [G|H|Q]
    array; proof bytes must be identical to the host engine's."""
    gens = (PedersenGens.default(), BulletproofGens(64))
    com, com2, _, ref = _prove(gens, None, monkeypatch)

    monkeypatch.setattr(pc, "msm_chunk_acc_w4", sim_msm_chunk_acc_w4)
    monkeypatch.setattr(pc, "msm_grid_pair", sim_msm_grid_pair)
    backend = PallasBackend()
    com_b, com2_b, _, got = _prove(gens, backend, monkeypatch)

    assert (com, com2) == (com_b, com2_b)
    assert got.to_bytes() == ref.to_bytes()

    verifier = Verifier(Transcript(b"ffold"))
    v = verifier.commit(com)
    v2 = verifier.commit(com2)
    _, _, o = verifier.multiply(v + v2, v - v2)
    for _ in range(32):
        _, _, o = verifier.multiply(o + Scalar(1), o + Scalar(2))
    verifier.verify(got, *gens)
