"""External golden vectors for the ristretto255 hash-to-group path and the
dalek-bulletproofs generator derivation.

Three independent oracles pin the Elligator one-way map (the seam every
generator flows through — ``PedersenGens.B_blinding`` and all
``BulletproofGens`` chain points, SURVEY.md S2b N2-N4):

1. RFC 9496 Appendix A.3 one-way-map vectors (inputs are SHA-512 of the
   listed strings).
2. libsodium's ``crypto_core_ristretto255_from_hash`` (randomized
   cross-check, skipped when libsodium is absent).
3. dalek-bulletproofs' published ``B_blinding`` value plus the first G/H
   chain points, captured from libsodium applied to our SHAKE-256 seeds.

Round-1 history: our map used the even root of sqrt(a*d-1); dalek's
``SQRT_AD_MINUS_ONE`` is the odd root, so every mapped point came out
negated and every generator diverged from dalek's.  These vectors make that
class of bug impossible to reintroduce silently.
"""

import ctypes
import hashlib

import pytest

from bulletproofs_r1cs_gadgets_tpu.core.pedersen import (
    GeneratorsChain,
    PedersenGens,
)
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import RistrettoPoint
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar


def _sodium():
    try:
        lib = ctypes.CDLL("libsodium.so.23")
    except OSError:
        try:
            lib = ctypes.CDLL("libsodium.so")
        except OSError:
            return None
    lib.sodium_init()
    return lib


# RFC 9496 A.3: SHA-512(label) -> one-way map -> encoded element.
RFC9496_ONE_WAY_MAP = [
    (
        b"Ristretto is traditionally a short shot of espresso coffee",
        "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46",
    ),
    (
        b"made with the normal amount of ground coffee but extracted with",
        "f26e5b6f7d362d2d2a94c5d0e7602cb4773c95a2e5c31a64f133189fa76ed61b",
    ),
    (
        b"about half the amount of water in the same amount of time",
        "006ccd2a9e6867e6a2c5cea83d3302cc9de128dd2a9a57dd8ee7b9d7ffe02826",
    ),
]


def test_rfc9496_one_way_map():
    for label, expected in RFC9496_ONE_WAY_MAP:
        h = hashlib.sha512(label).digest()
        assert RistrettoPoint.from_uniform_bytes(h).compress().hex() == expected


def test_pedersen_b_blinding_matches_dalek():
    """dalek-bulletproofs PedersenGens::default().B_blinding (SHA3-512
    hash-to-group of the compressed basepoint)."""
    pc = PedersenGens.default()
    assert pc.B.compress().hex() == (
        "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"
    )
    assert pc.B_blinding.compress().hex() == (
        "8c9240b456a9e6dc65c377a1048d745f94a08cdb7f44cbcd7b46f34048871134"
    )


# First points of the dalek BulletproofGens SHAKE-256 chains (party 0),
# computed by libsodium from_hash over our chain seeds — the chains the
# reference sizes as 128/2048/819200 (/root/reference/src/gadget_vsmt_2.rs:290).
GOLDEN_G0 = [
    "fc3b25801422672a6a8d3adb5d8457d4301fe92324b4fc56ae934c8713ddfe2d",
    "ae817fdef62f713dd169dc8a26406f68be0bd3cd53652614636b0801567c4264",
    "5ab2b9a44c915a25c82474c60a01c1b9f714dbcca25d93e99d16743ee8afe155",
    "52b6cd0ce3946dbcf7738a69fbdf4e941bf2310ef913636676b4d8e074128b7a",
]
GOLDEN_H0 = [
    "ba698f6dd08c501e32b55d2ee7259f6019d629fa2ba4d7039c5de157cba4df73",
    "acf2d2b95428fac99b12da3bab92edf8ea3788c2fd16769e586397eede7b5052",
]


def test_bulletproof_gens_chain_heads():
    g = GeneratorsChain(b"G" + (0).to_bytes(4, "little")).take(4)
    h = GeneratorsChain(b"H" + (0).to_bytes(4, "little")).take(2)
    assert [p.compress().hex() for p in g] == GOLDEN_G0
    assert [p.compress().hex() for p in h] == GOLDEN_H0


def test_from_hash_matches_libsodium_randomized():
    lib = _sodium()
    if lib is None:
        pytest.skip("libsodium not available")

    def sodium_from_hash(h: bytes) -> bytes:
        out = ctypes.create_string_buffer(32)
        assert lib.crypto_core_ristretto255_from_hash(out, h) == 0
        return out.raw

    for i in range(64):
        h = hashlib.sha512(b"golden fuzz %d" % i).digest()
        assert (
            RistrettoPoint.from_uniform_bytes(h).compress()
            == sodium_from_hash(h)
        )


def test_group_ops_match_libsodium():
    lib = _sodium()
    if lib is None:
        pytest.skip("libsodium not available")
    B = RistrettoPoint.basepoint()
    for k in (1, 2, 12345, 2**200 + 7, 2**252):
        s = Scalar(k)
        out = ctypes.create_string_buffer(32)
        assert (
            lib.crypto_scalarmult_ristretto255(out, s.to_bytes(), B.compress())
            == 0
        )
        assert out.raw == B.scalar_mul(s).compress()
    # group add
    p = B.scalar_mul(Scalar(3)).compress()
    q = B.scalar_mul(Scalar(9)).compress()
    out = ctypes.create_string_buffer(32)
    assert lib.crypto_core_ristretto255_add(out, p, q) == 0
    assert out.raw == B.scalar_mul(Scalar(12)).compress()
