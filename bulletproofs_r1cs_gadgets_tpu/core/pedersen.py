"""Pedersen commitment & Bulletproof generator chains.

Mirrors the dalek-bulletproofs generator derivation the reference depends on
(SURVEY.md S2b N3/N4):

* ``PedersenGens``: B = ristretto basepoint; B_blinding = SHA3-512
  hash-to-group of B's compressed encoding.  Used at every test site, e.g.
  ``/root/reference/src/factors.rs:52``.
* ``BulletproofGens(gens_capacity, party_capacity)``: per-party G/H vectors
  from SHAKE-256 XOF chains labelled ``b'G' || LE32(party)`` /
  ``b'H' || LE32(party)``.  The reference always passes ``party_capacity=1``
  and capacities 128 / 2048 / 819200 (``gadget_vsmt_2.rs:290``).

Deriving 819200 generators needs ~1.6M Elligator maps; the batched TPU path
(:func:`bulletproofs_r1cs_gadgets_tpu.ops.curve.from_uniform_bytes_batch`) is
used when available and results are cached on disk as numpy arrays of the
extended Edwards coordinates.
"""

from __future__ import annotations

import hashlib
import os
import numpy as np

from .ristretto import RistrettoPoint
from .scalar import Scalar

_CACHE_DIR = os.environ.get(
    "BPTPU_GENS_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".gens_cache")
)


class PedersenGens:
    """Bases for Pedersen commitments: commit(v, b) = v*B + b*B_blinding."""

    def __init__(self):
        self.B = RistrettoPoint.basepoint()
        self.B_blinding = RistrettoPoint.hash_from_bytes_sha3_512(
            self.B.compress()
        )

    @staticmethod
    def default() -> "PedersenGens":
        return _DEFAULT_PC_GENS

    def commit(self, value: Scalar, blinding: Scalar) -> RistrettoPoint:
        return self.B.scalar_mul(value) + self.B_blinding.scalar_mul(blinding)


class GeneratorsChain:
    """SHAKE-256 XOF chain of ristretto points (dalek's GeneratorsChain)."""

    def __init__(self, label: bytes):
        shake = hashlib.shake_256()
        shake.update(b"GeneratorsChain")
        shake.update(label)
        self._shake = shake
        self._offset = 0

    def take(self, n: int) -> list[RistrettoPoint]:
        total = self._offset + 64 * n
        stream = self._shake.digest(total)
        out = []
        for i in range(n):
            chunk = stream[self._offset + 64 * i : self._offset + 64 * (i + 1)]
            out.append(RistrettoPoint.from_uniform_bytes(chunk))
        self._offset = total
        return out

    def uniform_bytes(self, n: int) -> list[bytes]:
        """The raw 64-byte seeds, for batched on-device mapping."""
        total = self._offset + 64 * n
        stream = self._shake.digest(total)
        out = [
            stream[self._offset + 64 * i : self._offset + 64 * (i + 1)]
            for i in range(n)
        ]
        self._offset = total
        return out


def _chain_label(prefix: bytes, party: int) -> bytes:
    return prefix + int(party).to_bytes(4, "little")


def _derive_chain(label: bytes, n: int) -> list[RistrettoPoint]:
    """Derive n chain points, preferring the batched device path + disk cache."""
    # v2: cache invalidated when SQRT_AD_MINUS_ONE switched to dalek's odd
    # root (every Elligator-derived point changed; see utils/constants.py)
    key = f"{label.hex()}_{n}"
    cache_file = os.path.join(_CACHE_DIR, f"gens_v2_{key}.npy")
    if os.path.exists(cache_file):
        arr = np.load(cache_file, allow_pickle=False)
        return _points_from_array(arr)
    chain = GeneratorsChain(label)
    if n > 4096:
        try:
            from ..ops.curve import from_uniform_bytes_batch

            seeds = chain.uniform_bytes(n)
            pts = from_uniform_bytes_batch(seeds)
        except Exception:
            pts = chain.take(n)
    else:
        pts = chain.take(n)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.save(cache_file, _points_to_array(pts))
    except OSError:
        pass
    return pts


def _points_to_array(pts: list[RistrettoPoint]) -> np.ndarray:
    out = np.zeros((len(pts), 4, 16), dtype=np.uint16)
    for i, pt in enumerate(pts):
        for j, c in enumerate((pt.X, pt.Y, pt.Z, pt.T)):
            for k in range(16):
                out[i, j, k] = (c >> (16 * k)) & 0xFFFF
    return out


def _points_from_array(arr: np.ndarray) -> list[RistrettoPoint]:
    out = []
    for row in arr:
        coords = []
        for j in range(4):
            c = 0
            for k in range(15, -1, -1):
                c = (c << 16) | int(row[j, k])
            coords.append(c)
        out.append(RistrettoPoint(*coords))
    return out


class BulletproofGens:
    """Generator vectors for the R1CS/IPP engine (dalek layout)."""

    def __init__(self, gens_capacity: int, party_capacity: int = 1):
        self.gens_capacity = gens_capacity
        self.party_capacity = party_capacity
        self.G_vec: list[list[RistrettoPoint]] = []
        self.H_vec: list[list[RistrettoPoint]] = []
        for j in range(party_capacity):
            self.G_vec.append(_derive_chain(_chain_label(b"G", j), gens_capacity))
            self.H_vec.append(_derive_chain(_chain_label(b"H", j), gens_capacity))

    def G(self, n: int, party: int = 0) -> list[RistrettoPoint]:
        return self.G_vec[party][:n]

    def H(self, n: int, party: int = 0) -> list[RistrettoPoint]:
        return self.H_vec[party][:n]

    def share(self, party: int):
        return _BulletproofGensShare(self, party)


class _BulletproofGensShare:
    def __init__(self, gens: BulletproofGens, share: int):
        self._gens = gens
        self._share = share

    def G(self, n: int):
        return self._gens.G(n, self._share)

    def H(self, n: int):
        return self._gens.H(n, self._share)


_DEFAULT_PC_GENS = PedersenGens()
