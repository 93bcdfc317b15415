"""Device (TPU) backend for the proof engine.

The Prover/Verifier/IPP accept an optional ``backend`` whose methods route
the MSM-heavy steps to the TPU kernels in :mod:`.curve` / :mod:`.msm`:

* ``phase_commitments`` - the prover's A_I1/A_O1/S1 vector commitments.
* ``ipp_create`` - the inner-product argument: L/R MSMs and the generator
  folds run on device; only the 64-byte transcript exchange (append L, R;
  draw u) round-trips to the host, mirroring how production GPU provers
  split transcript and compute.
* ``msm`` - the verifier's single mega-MSM.

Scalar-side folds (sizes n, n/2, ...) stay host-side: they are O(n) modmuls
against the device's O(n * 253) point work, and keeping them on host avoids
canonicalisation round trips.  Small circuits fall back to the host path
entirely (device dispatch overhead dominates below ~2^9 points).

Generator vectors are uploaded once per (gens, capacity) and cached.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

from ..core.scalar import Scalar, inner_product
from ..core import scvec
from ..core.ristretto import RistrettoPoint
from ..core.ipp import InnerProductProof, _skip_domain_sep
from ..utils.constants import L
from .curve import (
    point_add,
    point_double,
    point_select,
    identity_points,
    points_to_device,
    points_from_device,
)
from .msm import msm_device, MsmEngine

from ..utils.config import DEFAULT_CONFIG

MIN_DEVICE_N = DEFAULT_CONFIG.engine.min_device_n


def _bits_arr(x: int, nbits: int = 253) -> np.ndarray:
    return np.asarray([(x >> i) & 1 for i in range(nbits)], dtype=np.int32)


@jax.jit
def fold_points(
    left: jnp.ndarray,
    right: jnp.ndarray,
    u_inv_bits: jnp.ndarray,
    u_bits: jnp.ndarray,
) -> jnp.ndarray:
    """Strauss-style joint fold: u_inv * left + u * right, one shared
    doubling chain for both scalars (bits LSB-first, shape (253,))."""
    both = point_add(left, right)
    nbits = u_bits.shape[0]

    def body(acc, i):
        bit_l = u_inv_bits[nbits - 1 - i]
        bit_r = u_bits[nbits - 1 - i]
        acc = point_double(acc)
        ident = jnp.broadcast_to(identity_points(()), left.shape)
        addend = point_select(
            (bit_l > 0) & (bit_r > 0),
            both,
            point_select(
                bit_l > 0, left, point_select(bit_r > 0, right, ident)
            ),
        )
        return point_add(acc, addend), None

    ident = jnp.broadcast_to(identity_points(()), left.shape)
    acc, _ = lax.scan(body, ident, jnp.arange(nbits))
    return acc


class DeviceBackend:
    """Routes the engine's heavy vector math to TPU kernels."""

    def __init__(self, min_device_n: int = MIN_DEVICE_N):
        self.engine = MsmEngine()
        self.min_device_n = min_device_n
        self._gens_cache: dict = {}

    # ------------------------------------------------------------- helpers
    def _gens_device(self, gens_share, n: int, which: str) -> jnp.ndarray:
        key = (id(gens_share._gens), which)
        cached = self._gens_cache.get(key)
        if cached is None or cached.shape[0] < n:
            limbs = (
                gens_share.G_limbs(n) if which == "G"
                else gens_share.H_limbs(n)
            )
            cached = jnp.asarray(limbs)
            self._gens_cache[key] = cached
        return cached[:n]

    def _msm_dev(self, scalars, dev: jnp.ndarray) -> jnp.ndarray:
        """Device MSM hook; ShardedMsmBackend overrides this to partition
        the point axis over a mesh (parallel/sharded_backend.py)."""
        return msm_device(scalars, dev)

    def msm(self, scalars, points: list[RistrettoPoint]) -> RistrettoPoint:
        if isinstance(scalars, np.ndarray):
            if len(scalars) < self.min_device_n:
                from ..core.ristretto import multiscalar_mul

                return multiscalar_mul(scvec.to_scalars(scalars), points)
            return points_from_device(
                self._msm_dev(scalars, points_to_device(points))
            )[0]
        if len(scalars) < self.min_device_n:
            from ..core.ristretto import multiscalar_mul

            return multiscalar_mul(scalars, points)
        dev = points_to_device(points)
        return points_from_device(self._msm_dev([s.v for s in scalars], dev))[0]

    # ------------------------------------------------------ batched variants
    # Loop fallbacks so any backend accepts batch jobs; PallasBackend
    # overrides these with fused single-sync dispatch (the TPU fast path).
    def phase_commitments_batch(self, jobs: list[tuple]) -> list[tuple]:
        return [self.phase_commitments(*job) for job in jobs]

    def ipp_create_batch(self, jobs: list[tuple]) -> list:
        return [self.ipp_create(*job) for job in jobs]

    def msm_gens(
        self, scalars, head_points, gens_share, padded_n, tail_points
    ) -> RistrettoPoint:
        """Verifier mega-MSM with the generator segment read from the
        device cache (see PallasBackend.msm_gens)."""
        nh, nt = len(head_points), len(tail_points)
        total = nh + 2 * padded_n + nt
        if total < self.min_device_n:
            pts = (
                head_points
                + gens_share.G(padded_n)
                + gens_share.H(padded_n)
                + tail_points
            )
            if isinstance(scalars, np.ndarray):
                scalars = scvec.to_scalars(scalars)
            from ..core.ristretto import multiscalar_mul

            return multiscalar_mul(scalars, pts)
        dev = jnp.concatenate(
            [
                points_to_device(head_points),
                self._gens_device(gens_share, padded_n, "G"),
                self._gens_device(gens_share, padded_n, "H"),
                points_to_device(tail_points),
            ],
            axis=0,
        )
        return points_from_device(self._msm_dev(scalars, dev))[0]

    # -------------------------------------------------- prover commitments
    def phase_commitments(
        self, gens_share, a_L, a_R, a_O, s_L, s_R,
        i_blinding, o_blinding, s_blinding, B_blinding, offset,
    ):
        # accept (n, 4) u64 arrays (the engine's native layout) or lists
        if isinstance(a_L, np.ndarray):
            a_L = scvec.to_scalars(a_L)
            a_R = scvec.to_scalars(a_R)
            a_O = scvec.to_scalars(a_O)
            s_L = scvec.to_scalars(s_L)
            s_R = scvec.to_scalars(s_R)
        n = len(a_L)
        if n < self.min_device_n:
            from ..core.ristretto import multiscalar_mul

            G = gens_share.G(offset + n)[offset:]
            H = gens_share.H(offset + n)[offset:]
            A_I = multiscalar_mul(
                [i_blinding] + a_L + a_R, [B_blinding] + G + H
            ).compress()
            A_O = multiscalar_mul([o_blinding] + a_O, [B_blinding] + G).compress()
            S = multiscalar_mul(
                [s_blinding] + s_L + s_R, [B_blinding] + G + H
            ).compress()
            return A_I, A_O, S

        G_dev = self._gens_device(gens_share, offset + n, "G")[offset:]
        H_dev = self._gens_device(gens_share, offset + n, "H")[offset:]
        B_dev = points_to_device([B_blinding])
        GH = jnp.concatenate([B_dev, G_dev, H_dev], axis=0)
        A_I = self._msm_dev(
            [i_blinding.v] + [s.v for s in a_L] + [s.v for s in a_R], GH
        )
        A_O = self._msm_dev(
            [o_blinding.v] + [s.v for s in a_O],
            jnp.concatenate([B_dev, G_dev], axis=0),
        )
        S = self._msm_dev(
            [s_blinding.v] + [s.v for s in s_L] + [s.v for s in s_R], GH
        )
        pts = points_from_device(jnp.stack([A_I, A_O, S], axis=0))
        return pts[0].compress(), pts[1].compress(), pts[2].compress()

    # ------------------------------------------------------------------ IPP
    def ipp_create(
        self, transcript, Q, G_factors, H_factors, gens_share, padded_n,
        a, b, meta=None,
    ) -> InnerProductProof:
        # `meta` (factor-vector structure, core/prover.py ipp_meta) is only
        # exploited by PallasBackend; this oracle folds explicitly.
        # accept (n, 4) u64 arrays or Scalar lists; this backend is the
        # CPU-testable oracle, so it normalizes to lists and keeps the
        # straightforward flow
        if isinstance(a, np.ndarray):
            G_factors = scvec.to_scalars(G_factors)
            H_factors = scvec.to_scalars(H_factors)
            a = scvec.to_scalars(a)
            b = scvec.to_scalars(b)
        n = padded_n
        if n < self.min_device_n:
            return InnerProductProof.create(
                _skip_domain_sep(transcript), Q, G_factors, H_factors,
                gens_share.G(n), gens_share.H(n), a, b,
            )

        G_dev = self._gens_device(gens_share, n, "G")
        H_dev = self._gens_device(gens_share, n, "H")
        Q_dev = points_to_device([Q])
        a = list(a)
        b = list(b)
        L_vec: list[bytes] = []
        R_vec: list[bytes] = []
        first = True
        while n != 1:
            n //= 2
            a_L, a_R = a[:n], a[n:]
            b_L, b_R = b[:n], b[n:]
            c_L = inner_product(a_L, b_R)
            c_R = inner_product(a_R, b_L)
            if first:
                sc_L = (
                    [(a_L[i] * G_factors[n + i]).v for i in range(n)]
                    + [(b_R[i] * H_factors[i]).v for i in range(n)]
                    + [c_L.v]
                )
                sc_R = (
                    [(a_R[i] * G_factors[i]).v for i in range(n)]
                    + [(b_L[i] * H_factors[n + i]).v for i in range(n)]
                    + [c_R.v]
                )
            else:
                sc_L = [s.v for s in a_L] + [s.v for s in b_R] + [c_L.v]
                sc_R = [s.v for s in a_R] + [s.v for s in b_L] + [c_R.v]
            pts_L = jnp.concatenate([G_dev[n:], H_dev[:n], Q_dev], axis=0)
            pts_R = jnp.concatenate([G_dev[:n], H_dev[n:], Q_dev], axis=0)
            L_pt = self._msm_dev(sc_L, pts_L)
            R_pt = self._msm_dev(sc_R, pts_R)
            L_c, R_c = (
                p.compress() for p in points_from_device(jnp.stack([L_pt, R_pt]))
            )
            L_vec.append(L_c)
            R_vec.append(R_c)
            transcript.append_point(b"L", L_c)
            transcript.append_point(b"R", R_c)
            u = transcript.challenge_scalar(b"u")
            u_inv = u.invert()
            a = [a_L[i] * u + u_inv * a_R[i] for i in range(n)]
            b = [b_L[i] * u_inv + u * b_R[i] for i in range(n)]
            u_bits = jnp.asarray(_bits_arr(u.v))
            u_inv_bits = jnp.asarray(_bits_arr(u_inv.v))
            if first:
                # fold the outer G/H factors in (one-off scaling)
                gf = [s.v for s in G_factors]
                hf = [s.v for s in H_factors]
                ub = [(u_inv.v * gf[i]) % L for i in range(n)]
                # apply combined scalars directly: G'_i = (u_inv*gf_i)G_L + (u*gf_{n+i})G_R
                G_dev = _fold_with_scalars(
                    G_dev[:n], G_dev[n:], [ (u_inv.v * gf[i]) % L for i in range(n)],
                    [(u.v * gf[n + i]) % L for i in range(n)],
                )
                H_dev = _fold_with_scalars(
                    H_dev[:n], H_dev[n:], [(u.v * hf[i]) % L for i in range(n)],
                    [(u_inv.v * hf[n + i]) % L for i in range(n)],
                )
                first = False
            else:
                G_dev = _run_fold(
                    fold_points, G_dev[:n], G_dev[n:], u_inv_bits, u_bits
                )
                H_dev = _run_fold(
                    fold_points, H_dev[:n], H_dev[n:], u_bits, u_inv_bits
                )
        return InnerProductProof(L_vec, R_vec, a[0], b[0])


FOLD_CHUNK = 1 << 10


def _pad_points_to(arr: jnp.ndarray, size: int) -> jnp.ndarray:
    n = arr.shape[0]
    if n == size:
        return arr
    pad = jnp.broadcast_to(identity_points(()), (size - n, 4, arr.shape[-1]))
    return jnp.concatenate([arr, pad], axis=0)


def _run_fold(jit_fn, left, right, *bit_args):
    """Apply a per-element fold in FOLD_CHUNK-shaped pieces."""
    n = left.shape[0]
    outs = []
    for off in range(0, n, FOLD_CHUNK):
        hi = min(off + FOLD_CHUNK, n)
        l_c = _pad_points_to(left[off:hi], FOLD_CHUNK)
        r_c = _pad_points_to(right[off:hi], FOLD_CHUNK)
        bits = []
        for b in bit_args:
            if b.ndim == 1:  # shared scalar bits
                bits.append(b)
            else:
                pad = jnp.zeros((FOLD_CHUNK - (hi - off), b.shape[1]), b.dtype)
                bits.append(jnp.concatenate([b[off:hi], pad], axis=0))
        outs.append(jit_fn(l_c, r_c, *bits)[: hi - off])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _fold_with_scalars(left, right, s_left: list[int], s_right: list[int]):
    """Per-element double-scalar fold with distinct scalars (first IPP round
    folds in the outer G/H factors)."""
    bits_l = jnp.asarray(np.stack([_bits_arr(s) for s in s_left]))
    bits_r = jnp.asarray(np.stack([_bits_arr(s) for s in s_right]))
    return _run_fold(_fold_with_scalars_jit, left, right, bits_l, bits_r)


@jax.jit
def _fold_with_scalars_jit(left, right, bits_l, bits_r):
    nbits = bits_l.shape[-1]

    def body(acc, i):
        acc = point_double(acc)
        ident = jnp.broadcast_to(identity_points(()), left.shape)
        add_l = point_select(bits_l[:, nbits - 1 - i] > 0, left, ident)
        add_r = point_select(bits_r[:, nbits - 1 - i] > 0, right, ident)
        return point_add(point_add(acc, add_l), add_r), None

    ident = jnp.broadcast_to(identity_points(()), left.shape)
    acc, _ = lax.scan(body, ident, jnp.arange(nbits))
    return acc


# moved to core.ipp (shared by all backends); kept as an alias
from ..core.ipp import _SkipDomainSep  # noqa: E402,F401
