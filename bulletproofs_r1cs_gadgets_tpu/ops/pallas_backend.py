"""Prover/verifier device backend built on the Pallas kernels.

Same interface as :class:`.backend.DeviceBackend` (phase_commitments /
ipp_create / msm) but every MSM is one ``msm_lanes`` dispatch (signed 4-bit
windows) + a ``reduce_lanes`` halving chain, and the IPP generator folds are
``fold_chunk`` dispatches.  Only transcripts and O(n) scalar folds stay on
host.  This is the production TPU path; :class:`.backend.DeviceBackend`
remains the XLA-composed variant (used as a CPU-testable oracle).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.scalar import Scalar, inner_product
from ..core.ristretto import RistrettoPoint, multiscalar_mul
from ..core.ipp import InnerProductProof
from ..utils.constants import L
from .curve import points_to_device, points_from_device
from . import pallas_curve as pcurve

MIN_DEVICE_N = 1024


_bits_matrix = pcurve.bits_matrix


def _pad_pts(rows: jnp.ndarray, n: int, target: int) -> jnp.ndarray:
    """Pad a rows array (whose real lane count may exceed n by identity
    padding already) out to `target` lanes."""
    flat = rows.reshape(pcurve.ROWS, -1)
    have = flat.shape[-1]
    assert have >= n
    if have == target:
        return rows.reshape(pcurve.ROWS, pcurve.SUB, target // pcurve.SUB)
    assert have < target
    flat = jnp.concatenate([flat, pcurve._ident_flat(target - have)], axis=1)
    return flat.reshape(pcurve.ROWS, pcurve.SUB, target // pcurve.SUB)


class PallasBackend:
    """Routes the engine's heavy vector math to the Pallas TPU kernels."""

    def __init__(self, min_device_n: int = MIN_DEVICE_N):
        self.min_device_n = min_device_n
        self._gens_cache: dict = {}

    # ------------------------------------------------------------- MSM core
    # Bit-serial per-lane ladders (smul_lanes) + halving reduction: on this
    # backend small loop bodies run at hardware speed while the windowed
    # table kernel (msm_lanes) hits a scratch/dynamic-store pathology --
    # see ops/pallas_curve.py; revisit when that is fixed.
    def _msm_rows(self, scalars: list[int], rows: jnp.ndarray, n: int):
        """MSM over the first n lanes of a (92, 8, LAN) rows array."""
        target = -(-n // pcurve.BLOCK_PTS) * pcurve.BLOCK_PTS
        rows = _pad_pts(rows, n, target)
        bits = pcurve.bits_matrix(scalars + [0] * (target - len(scalars)))
        lanes = pcurve.smul_lanes(rows, pcurve.bits_to_rows(bits))
        red = pcurve.reduce_lanes(lanes)
        return red

    def _msm_to_point(self, scalars, rows, n) -> RistrettoPoint:
        red = self._msm_rows(scalars, rows, n)
        pts = pcurve.rows_to_points(red)[:1]
        return points_from_device(pts)[0]

    def msm(
        self, scalars: list[Scalar], points: list[RistrettoPoint]
    ) -> RistrettoPoint:
        if len(scalars) < self.min_device_n:
            return multiscalar_mul(scalars, points)
        rows = pcurve.points_to_rows(_padded_points_dev(points))
        return self._msm_to_point(
            [s.v for s in scalars], rows, _pad8(len(points))
        )

    # -------------------------------------------------- generator caching
    def _gens_rows(self, gens_share, n: int, which: str):
        key = (id(gens_share._gens), which)
        cached = self._gens_cache.get(key)
        npts = _pad8(n)
        if cached is None or cached[1] < npts:
            pts = gens_share.G(n) if which == "G" else gens_share.H(n)
            rows = pcurve.points_to_rows(_padded_points_dev(pts))
            self._gens_cache[key] = (rows, npts)
            return rows, npts
        return cached

    # -------------------------------------------------- prover commitments
    def phase_commitments(
        self, gens_share, a_L, a_R, a_O, s_L, s_R,
        i_blinding, o_blinding, s_blinding, B_blinding, offset,
    ):
        n = len(a_L)
        if n < self.min_device_n:
            G = gens_share.G(offset + n)[offset:]
            H = gens_share.H(offset + n)[offset:]
            A_I = multiscalar_mul(
                [i_blinding] + a_L + a_R, [B_blinding] + G + H
            ).compress()
            A_O = multiscalar_mul(
                [o_blinding] + a_O, [B_blinding] + G
            ).compress()
            S = multiscalar_mul(
                [s_blinding] + s_L + s_R, [B_blinding] + G + H
            ).compress()
            return A_I, A_O, S
        assert offset == 0, "phase-2 device commitments not yet routed"
        # build one rows array [B_blinding, G(n), H(n)]
        G_rows, _ = self._gens_rows(gens_share, n, "G")
        H_rows, _ = self._gens_rows(gens_share, n, "H")
        B_rows = pcurve.points_to_rows(
            _padded_points_dev([B_blinding] * 8)
        )
        gflat = G_rows.reshape(pcurve.ROWS, -1)[:, :n]
        hflat = H_rows.reshape(pcurve.ROWS, -1)[:, :n]
        bflat = B_rows.reshape(pcurve.ROWS, -1)[:, :1]
        combined = jnp.concatenate([bflat, gflat, hflat], axis=1)
        m = 1 + 2 * n
        mp = _pad8(m)
        combined = jnp.concatenate(
            [combined, pcurve._ident_flat(mp - m)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, mp // pcurve.SUB)
        sc_AI = [i_blinding.v] + [s.v for s in a_L] + [s.v for s in a_R]
        A_I = self._msm_to_point(sc_AI, combined, m)
        sc_S = [s_blinding.v] + [s.v for s in s_L] + [s.v for s in s_R]
        S = self._msm_to_point(sc_S, combined, m)
        combined_G = jnp.concatenate([bflat, gflat], axis=1)
        mg = 1 + n
        mgp = _pad8(mg)
        combined_G = jnp.concatenate(
            [combined_G, pcurve._ident_flat(mgp - mg)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, mgp // pcurve.SUB)
        A_O = self._msm_to_point(
            [o_blinding.v] + [s.v for s in a_O], combined_G, mg
        )
        return A_I.compress(), A_O.compress(), S.compress()

    # ------------------------------------------------------------------ IPP
    def ipp_create(
        self, transcript, Q, G_factors, H_factors, G, H, a, b
    ) -> InnerProductProof:
        n = len(G)
        if n < self.min_device_n:
            from .backend import _SkipDomainSep

            return InnerProductProof.create(
                _SkipDomainSep(transcript), Q, G_factors, H_factors, G, H, a, b
            )

        G_flat = pcurve.points_to_rows(
            _padded_points_dev(G)
        ).reshape(pcurve.ROWS, -1)[:, :n]
        H_flat = pcurve.points_to_rows(
            _padded_points_dev(H)
        ).reshape(pcurve.ROWS, -1)[:, :n]
        Q_flat = pcurve.points_to_rows(
            _padded_points_dev([Q] * 8)
        ).reshape(pcurve.ROWS, -1)[:, :1]
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
            pts_L = jnp.concatenate(
                [G_flat[:, n:], H_flat[:, :n], Q_flat], axis=1
            )
            pts_R = jnp.concatenate(
                [G_flat[:, :n], H_flat[:, n:], Q_flat], axis=1
            )
            m = 2 * n + 1
            mp = _pad8(m)
            def to_rows(flat):
                return jnp.concatenate(
                    [flat, pcurve._ident_flat(mp - m)], axis=1
                ).reshape(pcurve.ROWS, pcurve.SUB, mp // pcurve.SUB)
            L_pt = self._msm_to_point(sc_L, to_rows(pts_L), m)
            R_pt = self._msm_to_point(sc_R, to_rows(pts_R), m)
            L_c = L_pt.compress()
            R_c = R_pt.compress()
            L_vec.append(L_c)
            R_vec.append(R_c)
            transcript.append_point(b"L", L_c)
            transcript.append_point(b"R", R_c)
            u = transcript.challenge_scalar(b"u")
            u_inv = u.invert()
            a = [a_L[i] * u + u_inv * a_R[i] for i in range(n)]
            b = [b_L[i] * u_inv + u * b_R[i] for i in range(n)]
            if first:
                gl = [(u_inv.v * G_factors[i].v) % L for i in range(n)]
                gr = [(u.v * G_factors[n + i].v) % L for i in range(n)]
                hl = [(u.v * H_factors[i].v) % L for i in range(n)]
                hr = [(u_inv.v * H_factors[n + i].v) % L for i in range(n)]
                first = False
            else:
                gl = [u_inv.v] * n
                gr = [u.v] * n
                hl = [u.v] * n
                hr = [u_inv.v] * n
            G_flat = self._fold(G_flat, n, gl, gr)
            H_flat = self._fold(H_flat, n, hl, hr)
        return InnerProductProof(L_vec, R_vec, a[0], b[0])

    def _fold(self, flat, n, s_left, s_right):
        """flat (92, 2n) -> (92, n): out_i = s_left_i*P_i + s_right_i*P_{n+i}."""
        np_ = _pad_to_block(n)
        left = jnp.concatenate(
            [flat[:, :n], pcurve._ident_flat(np_ - n)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, np_ // pcurve.SUB)
        right = jnp.concatenate(
            [flat[:, n : 2 * n], pcurve._ident_flat(np_ - n)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, np_ // pcurve.SUB)
        bl = pcurve.bits_to_rows(
            np.concatenate(
                [_bits_matrix(s_left), np.zeros((np_ - n, 256), np.int32)]
            )
        )
        br = pcurve.bits_to_rows(
            np.concatenate(
                [_bits_matrix(s_right), np.zeros((np_ - n, 256), np.int32)]
            )
        )
        folded = pcurve.fold_chunk(left, right, bl, br)
        return folded.reshape(pcurve.ROWS, np_)[:, :n]


def _pad8(n: int) -> int:
    return -(-n // pcurve.SUB) * pcurve.SUB


def _pad_to_block(n: int) -> int:
    return -(-n // pcurve.BLOCK_PTS) * pcurve.BLOCK_PTS


def _padded_points_dev(points: list[RistrettoPoint]):
    """Upload points padded to a multiple of 8 (identity padding)."""
    n = len(points)
    npad = _pad8(n)
    if npad != n:
        points = points + [RistrettoPoint.identity()] * (npad - n)
    return points_to_device(points)
