"""Port of the reference's scalar-utility unit tests
(``/root/reference/src/scalar_utils.rs:239-309``)."""

from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
from bulletproofs_r1cs_gadgets_tpu.gadgets.scalar_utils import (
    ScalarBits,
    get_bits,
    scalar_to_u64_array,
    u64_array_to_scalar,
    get_base_4_repr,
    get_scalar_from_hex,
    decode_hex,
)
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L

TREE_DEPTH = 253


def test_shl_shr_roundtrip():
    # reference test_shl_shr: bit-array round trip over random scalars
    for _ in range(100):
        r = Scalar.random()
        b_arr = ScalarBits.from_scalar(r, TREE_DEPTH)
        assert b_arr.to_scalar() == r


def test_shifts():
    b = ScalarBits.from_scalar(Scalar(1), 8)
    assert b.is_lsb_set() and not b.is_msb_set()
    b.shl()
    assert b.to_scalar() == Scalar(2)
    b.shr()
    assert b.to_scalar() == Scalar(1)
    left = b.new_left_shifted()
    assert left.to_scalar() == Scalar(2)
    right = left.new_right_shifted()
    assert right.to_scalar() == Scalar(1)
    top = ScalarBits.from_scalar(Scalar(1 << 7), 8)
    assert top.is_msb_set()
    top.shl()  # bit falls off
    assert top.to_scalar() == Scalar.zero()


def test_scalar_to_u64_array():
    # reference test_scalar_to_u64_array
    for n in [32, 255, 127, 488, 256, 257]:
        s = Scalar(n)
        assert u64_array_to_scalar(scalar_to_u64_array(s)) == s
    o = Scalar(L - 1)
    assert u64_array_to_scalar(scalar_to_u64_array(o)) == o
    # the reference's probe value (non-canonical high u64)
    s = u64_array_to_scalar([0, 0, 0, 1762596304162127872])
    b = ScalarBits.from_scalar(s, TREE_DEPTH)
    assert b.to_scalar() == s


def test_base_4_repr():
    # big-endian digits; 18 = 0b10010 -> ...0102 in base 4
    d = get_base_4_repr(Scalar(18), 32)
    assert len(d) == 128
    assert d[-3:] == [1, 0, 2]
    assert get_base_4_repr(Scalar(0), 32) == [0] * 128
    for val, last in [(1, 1), (2, 2), (3, 3), (4, 10), (5, 11), (6, 12)]:
        dd = get_base_4_repr(Scalar(val), 32)
        assert dd[-2] * 10 + dd[-1] == last


def test_get_bits():
    bits = get_bits(Scalar(0b1011), 8)
    assert bits == [1, 1, 0, 1, 0, 0, 0, 0]


def test_hex_loading_matches_reference_quirk():
    # get_scalar_from_hex passes decoded bytes straight to the little-endian
    # from_bytes_mod_order (scalar_utils.rs:232-237): value is byte-reversed.
    h = "0x" + "01" + "00" * 31
    s = get_scalar_from_hex(h)
    assert s == Scalar(1)  # first byte is the LSB
    h2 = "0x" + "00" * 31 + "02"
    s2 = get_scalar_from_hex(h2)
    assert s2 == Scalar(2 << (8 * 31)) if (2 << (8 * 31)) < L else True
    assert decode_hex("0xff00") == b"\xff\x00"
