"""Tests for the crypto core: keccak/strobe/transcript, scalar field,
ristretto group, generators.

Mirrors the reference's pure unit tests for scalar utilities
(``scalar_utils.rs:239-309``) and adds golden-vector checks for the
primitives the reference gets from its Rust dependencies.
"""

import hashlib
import secrets

import pytest

from bulletproofs_r1cs_gadgets_tpu.core.keccak import f1600, f1600_bytes
from bulletproofs_r1cs_gadgets_tpu.core.strobe import Strobe128
from bulletproofs_r1cs_gadgets_tpu.core.transcript import Transcript
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar, batch_invert
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import RistrettoPoint, multiscalar_mul
from bulletproofs_r1cs_gadgets_tpu.core.pedersen import PedersenGens, BulletproofGens
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L, P


# --------------------------------------------------------------------- keccak
def _sha3_256_via_f1600(data: bytes) -> bytes:
    """SHA3-256 built on our permutation, checked against hashlib."""
    rate = 136
    padded = bytearray(data)
    padded.append(0x06)
    while len(padded) % rate != 0:
        padded.append(0)
    padded[-1] |= 0x80
    state = bytearray(200)
    for off in range(0, len(padded), rate):
        for i in range(rate):
            state[i] ^= padded[off + i]
        f1600_bytes(state)
    return bytes(state[:32])


def test_keccak_f1600_via_sha3():
    for msg in [b"", b"abc", b"x" * 200, secrets.token_bytes(500)]:
        assert _sha3_256_via_f1600(msg) == hashlib.sha3_256(msg).digest()


def test_keccak_f1600_known_lane():
    # permutation of the zero state: first lane of Keccak-f[1600](0)
    lanes = f1600([0] * 25)
    assert lanes[0] == 0xF1258F7940E1DDE7


# --------------------------------------------------------------------- strobe
def test_strobe_deterministic_and_order_sensitive():
    s1 = Strobe128(b"test")
    s1.meta_ad(b"label", False)
    s1.ad(b"data", False)
    out1 = s1.prf(32, False)

    s2 = Strobe128(b"test")
    s2.meta_ad(b"label", False)
    s2.ad(b"data", False)
    assert s2.prf(32, False) == out1

    s3 = Strobe128(b"test")
    s3.meta_ad(b"label", False)
    s3.ad(b"datb", False)
    assert s3.prf(32, False) != out1


def test_transcript_merlin_schedule():
    t1 = Transcript(b"proto")
    t1.append_message(b"lbl", b"msg")
    c1 = t1.challenge_bytes(b"ch", 32)
    # identical transcript -> identical challenge
    t2 = Transcript(b"proto")
    t2.append_message(b"lbl", b"msg")
    assert t2.challenge_bytes(b"ch", 32) == c1
    # label change -> different challenge
    t3 = Transcript(b"proto")
    t3.append_message(b"lbl2", b"msg")
    assert t3.challenge_bytes(b"ch", 32) != c1
    # message split differently -> different challenge (length framing)
    t4 = Transcript(b"proto")
    t4.append_message(b"lbl", b"ms")
    t4.append_message(b"lbl", b"g")
    assert t4.challenge_bytes(b"ch", 32) != c1


def test_transcript_challenge_scalar_reduced():
    t = Transcript(b"x")
    s = t.challenge_scalar(b"c")
    assert 0 <= s.v < L


# --------------------------------------------------------------------- scalar
def test_scalar_roundtrips():
    for _ in range(20):
        s = Scalar.random()
        assert Scalar.from_bytes_mod_order(s.to_bytes()) == s
    # invert(0) == 0, matching dalek (probed by reference scalar_utils.rs:304)
    assert Scalar.zero().invert() == Scalar.zero()
    assert Scalar(7).invert() * Scalar(7) == Scalar.one()
    # wide reduction
    wide = (L + 5).to_bytes(64, "little")
    assert Scalar.from_bytes_mod_order_wide(wide) == Scalar(5)


def test_batch_invert_with_zeros():
    xs = [Scalar(3), Scalar.zero(), Scalar(7), Scalar.random()]
    inv = batch_invert(xs)
    assert inv[0] * xs[0] == Scalar.one()
    assert inv[1] == Scalar.zero()
    assert inv[2] * xs[2] == Scalar.one()
    assert inv[3] * xs[3] == Scalar.one()


# ------------------------------------------------------------------ ristretto
RFC9496_B_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
    "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
]


def test_ristretto_basepoint_multiples():
    B = RistrettoPoint.basepoint()
    acc = RistrettoPoint.identity()
    for i, expected in enumerate(RFC9496_B_MULTIPLES):
        assert acc.compress().hex() == expected, f"multiple {i}"
        assert acc == B.scalar_mul(Scalar(i))
        acc = acc + B


def test_ristretto_decompress_rejects_bad():
    with pytest.raises(ValueError):
        RistrettoPoint.decompress(P.to_bytes(32, "little"))  # non-canonical
    with pytest.raises(ValueError):
        RistrettoPoint.decompress(bytes([1] + [0] * 31))  # negative s
    # valid roundtrip
    pt = RistrettoPoint.basepoint().scalar_mul(Scalar(12345))
    assert RistrettoPoint.decompress(pt.compress()) == pt


def test_ristretto_scalar_mul_matches_add():
    B = RistrettoPoint.basepoint()
    k = Scalar(77)
    acc = RistrettoPoint.identity()
    for _ in range(77):
        acc = acc + B
    assert B.scalar_mul(k) == acc
    assert B.scalar_mul(Scalar.zero()).is_identity()


def test_ristretto_order():
    B = RistrettoPoint.basepoint()
    assert B.scalar_mul(Scalar(L - 1)) + B == RistrettoPoint.identity()


def test_elligator_produces_valid_points():
    from bulletproofs_r1cs_gadgets_tpu.utils.constants import D

    for _ in range(10):
        pt = RistrettoPoint.from_uniform_bytes(secrets.token_bytes(64))
        X, Y, Z, T = pt.X, pt.Y, pt.Z, pt.T
        assert (-X * X + Y * Y) % P == (Z * Z + D * T * T) % P
        assert (X * Y - Z * T) % P == 0
        # decompression of its encoding round-trips
        assert RistrettoPoint.decompress(pt.compress()) == pt


def test_msm_matches_naive():
    pts = [
        RistrettoPoint.basepoint().scalar_mul(Scalar(i + 1)) for i in range(20)
    ]
    scalars = [Scalar.random() for _ in range(20)]
    naive = RistrettoPoint.identity()
    for s, p in zip(scalars, pts):
        naive = naive + p.scalar_mul(s)
    assert multiscalar_mul(scalars, pts) == naive
    assert multiscalar_mul([], []).is_identity()


# ----------------------------------------------------------------- generators
def test_pedersen_gens():
    pc = PedersenGens.default()
    assert pc.B.compress().hex() == RFC9496_B_MULTIPLES[1]
    # commit(v, 0) == v*B
    assert pc.commit(Scalar(5), Scalar.zero()) == pc.B.scalar_mul(Scalar(5))
    # hiding: different blinding -> different commitment
    assert pc.commit(Scalar(5), Scalar(1)) != pc.commit(Scalar(5), Scalar(2))


def test_bulletproof_gens_deterministic_and_distinct():
    g1 = BulletproofGens(8)
    g2 = BulletproofGens(8)
    for a, b in zip(g1.G(8), g2.G(8)):
        assert a == b
    # G and H chains differ
    assert g1.G(8)[0] != g1.H(8)[0]
    # all distinct
    enc = {p.compress() for p in g1.G(8) + g1.H(8)}
    assert len(enc) == 16


def test_native_elligator_batch_matches_python():
    """C++ ge_from_uniform_batch (generator derivation fast path) agrees
    with the Python RFC 9496 one-way map point-for-point."""
    import numpy as np

    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import (
        GeneratorsChain,
        _points_from_array,
    )
    from bulletproofs_r1cs_gadgets_tpu.native.loader import load_native

    native = load_native()
    if native is None:
        import pytest

        pytest.skip("native library unavailable")
    n = 96
    ref = GeneratorsChain(b"G\x00\x00\x00\x00").take(n)
    seeds = b"".join(GeneratorsChain(b"G\x00\x00\x00\x00").uniform_bytes(n))
    raw = native.ge_from_uniform_batch(seeds)
    got = _points_from_array(
        np.frombuffer(raw, dtype="<u2").reshape(n, 4, 16).copy()
    )
    assert [p.compress() for p in ref] == [p.compress() for p in got]
