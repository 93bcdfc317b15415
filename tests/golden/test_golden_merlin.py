"""External golden vectors for the Merlin/STROBE-128 transcript rebuild.

The reference's entire Fiat-Shamir layer rides on ``merlin::Transcript``
(``/root/reference/Cargo.toml:18``; every proof opens one, e.g.
``/root/reference/src/factors.rs:57``).  Byte equality with merlin is the
proof-parity linchpin (SURVEY.md S2b N8): any transcript divergence makes
every challenge, and therefore every proof, incompatible.

The two vectors below are the published test vectors from the merlin crate
itself (``merlin/src/transcript.rs``, tests ``equivalence_simple`` and
``equivalence_complex``) — produced by the exact Rust implementation the
reference links.  They exercise Keccak-f[1600], the STROBE-128 framing
(BEGIN/MORE flags, ``meta-AD``/``AD``/``PRF`` operations, position
bookkeeping across block boundaries via the 1 KiB appends) and merlin's
length-prefixed data encoding.
"""

from bulletproofs_r1cs_gadgets_tpu.core.transcript import Transcript


def test_merlin_equivalence_simple():
    """merlin crate test `equivalence_simple` (transcript.rs)."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    c = t.challenge_bytes(b"challenge", 32)
    assert c.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_equivalence_complex():
    """merlin crate test `equivalence_complex` (transcript.rs): 32
    interleaved challenge/append rounds with 1 KiB data blocks, crossing
    many STROBE block boundaries."""
    t = Transcript(b"test protocol")
    t.append_message(b"step1", b"some data")
    data = bytes([99] * 1024)
    chl = b""
    for _ in range(32):
        chl = t.challenge_bytes(b"challenge", 32)
        t.append_message(b"bigdata", data)
        t.append_message(b"challengedata", chl)
    assert chl.hex() == (
        "a8c933f54fae76e3f9bea93648c1308e7dfa2152dd51674ff3ca438351cf003c"
    )


def test_merlin_64_byte_challenge_deterministic():
    """challenge_scalar draws a 64-byte PRF frame; pin its determinism and
    its dependence on every appended byte (framing regressions show here
    before they scramble a whole proof)."""
    def run(data: bytes) -> bytes:
        t = Transcript(b"test protocol")
        t.append_message(b"some label", data)
        return t.challenge_bytes(b"challenge", 64)

    assert run(b"some data") == run(b"some data")
    assert run(b"some data") != run(b"some datb")
