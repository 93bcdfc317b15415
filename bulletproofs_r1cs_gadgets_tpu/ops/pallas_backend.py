"""Prover/verifier device backend built on the Pallas kernels.

Same interface as :class:`.backend.DeviceBackend` (phase_commitments /
ipp_create / msm), with every MSM a single ``msm_block_totals`` dispatch
(bit-serial per-lane ladders + in-kernel block reduction; per-block totals
are combined on host - at most a few hundred adds).  The IPP fuses the two
L/R MSMs per round into one dispatch (block-aligned lane packing) and folds
both generator vectors in one ``fold_chunk`` dispatch.

Scalar vectors arrive as ``(n, 4) uint64`` numpy arrays (``core.scvec``
layout): the packed 32-bit words the kernels consume are a zero-copy view
of that layout, and all host-side scalar folds/inner products run in the
C++ vector layer — only transcripts stay in Python.  This is the
production TPU path; :class:`.backend.DeviceBackend` remains the
XLA-composed variant (the CPU-testable oracle).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax.numpy as jnp

_TIMING = os.environ.get("BPTPU_TIMING", "") not in ("", "0")


class _Timer:
    """Accumulates per-phase wall time when BPTPU_TIMING=1."""

    def __init__(self):
        self.acc: dict[str, float] = {}

    def add(self, name: str, dt: float):
        self.acc[name] = self.acc.get(name, 0.0) + dt

    def dump(self, label: str):
        if self.acc:
            import sys

            total = sum(self.acc.values())
            parts = ", ".join(
                f"{k}={v:.2f}s" for k, v in sorted(self.acc.items())
            )
            print(f"[timing:{label}] total={total:.2f}s {parts}",
                  file=sys.stderr, flush=True)
        self.acc = {}


TIMER = _Timer()

from ..core.scalar import Scalar
from ..core import scvec
from ..core.ristretto import RistrettoPoint, multiscalar_mul
from ..core.ipp import InnerProductProof, _skip_domain_sep
from ..utils.constants import L
from .curve import points_to_device, points_from_device
from . import pallas_curve as pcurve

MIN_DEVICE_N = 64


def _as_array(scalars) -> np.ndarray:
    """list[Scalar] | (n,4) u64 array -> (n,4) u64 array."""
    if isinstance(scalars, np.ndarray):
        return scalars
    return scvec.from_scalars(list(scalars))


def _words_rows(arr: np.ndarray, target: int) -> jnp.ndarray:
    """(m, 4) u64 scalars -> (8, SUB, target/SUB) packed-word rows, zero-
    padded to `target` lanes (zero-copy u64->u32 word view)."""
    m = arr.shape[0]
    if m < target:
        arr = np.concatenate(
            [arr, np.zeros((target - m, 4), dtype=np.uint64)]
        )
    return pcurve.words_to_rows(scvec.words_u32(arr).view(np.int32))


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
    # table kernel (msm_lanes) hit a scratch/dynamic-store pathology --
    # see ops/pallas_curve.py; revisit when that is fixed.
    def _msm_to_point(self, arr: np.ndarray, rows, n) -> RistrettoPoint:
        """One-dispatch MSM (in-kernel block reduction) + tiny host combine
        of the per-block totals."""
        t0 = time.time() if _TIMING else 0
        target = -(-n // pcurve.BLOCK_PTS) * pcurve.BLOCK_PTS
        rows = _pad_pts(rows, n, target)
        wr = _words_rows(arr, target)
        if _TIMING:
            TIMER.add("msm_prep", time.time() - t0)
            t0 = time.time()
        totals = pcurve.msm_block_totals(rows, wr)
        totals.block_until_ready()
        if _TIMING:
            TIMER.add("msm_device", time.time() - t0)
            t0 = time.time()
        pts = points_from_device(totals)
        if _TIMING:
            TIMER.add("msm_post", time.time() - t0)
        acc = pts[0]
        for p in pts[1:]:
            acc = acc + p
        return acc

    def _msm_pair(self, sc_a: np.ndarray, flat_a, sc_b: np.ndarray, flat_b, m):
        """Two same-sized MSMs fused into one dispatch: each occupies whole
        blocks, so per-block totals attribute cleanly to one MSM."""
        target = -(-m // pcurve.BLOCK_PTS) * pcurve.BLOCK_PTS
        ka = target // pcurve.BLOCK_PTS

        def prep(flat):
            # flat (92, m-ish) -> (92, SUB, target/SUB); the flat->3D reshape
            # is sublane-major, so whole-array reshape keeps this MSM's
            # points inside its own lane range after axis-2 concatenation.
            padded = jnp.concatenate(
                [flat, pcurve._ident_flat(target - flat.shape[-1])], axis=1
            )
            return padded.reshape(
                pcurve.ROWS, pcurve.SUB, target // pcurve.SUB
            )

        t0 = time.time() if _TIMING else 0
        rows = jnp.concatenate([prep(flat_a), prep(flat_b)], axis=2)
        words = jnp.concatenate(
            [_words_rows(sc_a, target), _words_rows(sc_b, target)], axis=2
        )
        if _TIMING:
            TIMER.add("pair_prep", time.time() - t0)
            t0 = time.time()
        totals = pcurve.msm_block_totals(rows, words)
        totals.block_until_ready()
        if _TIMING:
            TIMER.add("pair_device", time.time() - t0)
            t0 = time.time()
        pts = points_from_device(totals)
        if _TIMING:
            TIMER.add("pair_post", time.time() - t0)

        def comb(group):
            acc = group[0]
            for p in group[1:]:
                acc = acc + p
            return acc

        return comb(pts[:ka]), comb(pts[ka:])

    def msm(self, scalars, points: list[RistrettoPoint]) -> RistrettoPoint:
        if len(scalars) < self.min_device_n:
            if isinstance(scalars, np.ndarray):
                scalars = scvec.to_scalars(scalars)
            return multiscalar_mul(scalars, points)
        rows = pcurve.points_to_rows(_padded_points_dev(points))
        return self._msm_to_point(
            _as_array(scalars), rows, _pad8(len(points))
        )

    def msm_gens(
        self, scalars, head_points, gens_share, padded_n, tail_points
    ) -> RistrettoPoint:
        """Verifier mega-MSM over [head, G(padded_n), H(padded_n), tail]:
        the generator segment comes from the per-gens upload cache instead
        of host point objects (the dominant verify-side host cost)."""
        nh, nt = len(head_points), len(tail_points)
        total = nh + 2 * padded_n + nt
        if total < self.min_device_n:
            pts = (
                head_points
                + gens_share.G(padded_n)
                + gens_share.H(padded_n)
                + tail_points
            )
            return multiscalar_mul(scvec.to_scalars(_as_array(scalars)), pts)
        G_rows, _ = self._gens_rows(gens_share, padded_n, "G")
        H_rows, _ = self._gens_rows(gens_share, padded_n, "H")
        head_flat = pcurve.points_to_rows(
            _padded_points_dev(head_points)
        ).reshape(pcurve.ROWS, -1)[:, :nh]
        tail_flat = pcurve.points_to_rows(
            _padded_points_dev(tail_points)
        ).reshape(pcurve.ROWS, -1)[:, :nt]
        flat = jnp.concatenate(
            [
                head_flat,
                G_rows.reshape(pcurve.ROWS, -1)[:, :padded_n],
                H_rows.reshape(pcurve.ROWS, -1)[:, :padded_n],
                tail_flat,
            ],
            axis=1,
        )
        mp = _pad8(total)
        flat = jnp.concatenate(
            [flat, pcurve._ident_flat(mp - total)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, mp // pcurve.SUB)
        return self._msm_to_point(_as_array(scalars), flat, total)

    # -------------------------------------------------- generator caching
    def _gens_rows(self, gens_share, n: int, which: str):
        key = (id(gens_share._gens), which)
        cached = self._gens_cache.get(key)
        npts = _pad8(n)
        if cached is None or cached[1] < npts:
            # limb arrays come straight from the gens cache (no Python
            # point objects on this path)
            limbs = (
                gens_share.G_limbs(n) if which == "G"
                else gens_share.H_limbs(n)
            )
            if npts != n:
                ident = np.zeros((npts - n, 4, limbs.shape[-1]), np.int32)
                ident[:, 1, 0] = 1
                ident[:, 2, 0] = 1
                limbs = np.concatenate([limbs, ident])
            rows = pcurve.points_to_rows(jnp.asarray(limbs))
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
            a_Ls = scvec.to_scalars(_as_array(a_L))
            a_Rs = scvec.to_scalars(_as_array(a_R))
            a_Os = scvec.to_scalars(_as_array(a_O))
            s_Ls = scvec.to_scalars(_as_array(s_L))
            s_Rs = scvec.to_scalars(_as_array(s_R))
            A_I = multiscalar_mul(
                [i_blinding] + a_Ls + a_Rs, [B_blinding] + G + H
            ).compress()
            A_O = multiscalar_mul(
                [o_blinding] + a_Os, [B_blinding] + G
            ).compress()
            S = multiscalar_mul(
                [s_blinding] + s_Ls + s_Rs, [B_blinding] + G + H
            ).compress()
            return A_I, A_O, S
        assert offset == 0, "phase-2 device commitments not yet routed"
        a_L, a_R, a_O = _as_array(a_L), _as_array(a_R), _as_array(a_O)
        s_L, s_R = _as_array(s_L), _as_array(s_R)
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
        row = scvec.scalar_to_row
        sc_AI = np.concatenate([row(i_blinding)[None], a_L, a_R])
        A_I = self._msm_to_point(sc_AI, combined, m)
        sc_S = np.concatenate([row(s_blinding)[None], s_L, s_R])
        S = self._msm_to_point(sc_S, combined, m)
        combined_G = jnp.concatenate([bflat, gflat], axis=1)
        mg = 1 + n
        mgp = _pad8(mg)
        combined_G = jnp.concatenate(
            [combined_G, pcurve._ident_flat(mgp - mg)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, mgp // pcurve.SUB)
        A_O = self._msm_to_point(
            np.concatenate([row(o_blinding)[None], a_O]), combined_G, mg
        )
        return A_I.compress(), A_O.compress(), S.compress()

    # ------------------------------------------------------------------ IPP
    def ipp_create(
        self, transcript, Q, G_factors, H_factors, gens_share, padded_n, a, b
    ) -> InnerProductProof:
        """Caller has already appended the ``ipp v1`` domain separator;
        G_factors/H_factors/a/b are (n, 4) u64 arrays; generators are read
        from the per-gens upload cache (no host point objects)."""
        n = padded_n
        if n < self.min_device_n:
            return InnerProductProof.create(
                _skip_domain_sep(transcript), Q,
                scvec.to_scalars(_as_array(G_factors)),
                scvec.to_scalars(_as_array(H_factors)),
                gens_share.G(n), gens_share.H(n),
                scvec.to_scalars(_as_array(a)),
                scvec.to_scalars(_as_array(b)),
            )

        t0 = time.time() if _TIMING else 0
        G_factors = _as_array(G_factors)
        H_factors = _as_array(H_factors)
        a = _as_array(a)
        b = _as_array(b)
        G_rows, _ = self._gens_rows(gens_share, n, "G")
        H_rows, _ = self._gens_rows(gens_share, n, "H")
        G_flat = G_rows.reshape(pcurve.ROWS, -1)[:, :n]
        H_flat = H_rows.reshape(pcurve.ROWS, -1)[:, :n]
        Q_flat = pcurve.points_to_rows(
            _padded_points_dev([Q] * 8)
        ).reshape(pcurve.ROWS, -1)[:, :1]
        if _TIMING:
            TIMER.add("ipp_upload", time.time() - t0)
        L_vec: list[bytes] = []
        R_vec: list[bytes] = []
        first = True
        while n != 1:
            n //= 2
            t0 = time.time() if _TIMING else 0
            a_L, a_R = a[:n], a[n:]
            b_L, b_R = b[:n], b[n:]
            c_L = scvec.inner(a_L, b_R)
            c_R = scvec.inner(a_R, b_L)
            row_cL = scvec.scalar_to_row(c_L)[None]
            row_cR = scvec.scalar_to_row(c_R)[None]
            if first:
                sc_L = np.concatenate([
                    scvec.mul(a_L, G_factors[n : 2 * n]),
                    scvec.mul(b_R, H_factors[:n]),
                    row_cL,
                ])
                sc_R = np.concatenate([
                    scvec.mul(a_R, G_factors[:n]),
                    scvec.mul(b_L, H_factors[n : 2 * n]),
                    row_cR,
                ])
            else:
                sc_L = np.concatenate([a_L, b_R, row_cL])
                sc_R = np.concatenate([a_R, b_L, row_cR])
            pts_L = jnp.concatenate(
                [G_flat[:, n:], H_flat[:, :n], Q_flat], axis=1
            )
            pts_R = jnp.concatenate(
                [G_flat[:, :n], H_flat[:, n:], Q_flat], axis=1
            )
            m = 2 * n + 1
            if _TIMING:
                TIMER.add("ipp_host_scalars", time.time() - t0)
            L_pt, R_pt = self._msm_pair(sc_L, pts_L, sc_R, pts_R, m)
            L_c = L_pt.compress()
            R_c = R_pt.compress()
            L_vec.append(L_c)
            R_vec.append(R_c)
            transcript.append_point(b"L", L_c)
            transcript.append_point(b"R", R_c)
            u = transcript.challenge_scalar(b"u")
            u_inv = u.invert()
            t0 = time.time() if _TIMING else 0
            a = scvec.axpby(a_L, u, a_R, u_inv)
            b = scvec.axpby(b_L, u_inv, b_R, u)
            if _TIMING:
                TIMER.add("ipp_host_folds", time.time() - t0)
            if first:
                gl = scvec.scale(G_factors[:n], u_inv)
                gr = scvec.scale(G_factors[n : 2 * n], u)
                hl = scvec.scale(H_factors[:n], u)
                hr = scvec.scale(H_factors[n : 2 * n], u_inv)
                first = False
            else:
                gl = np.tile(scvec.scalar_to_row(u_inv), (n, 1))
                gr = np.tile(scvec.scalar_to_row(u), (n, 1))
                hl = gr
                hr = gl
            t0 = time.time() if _TIMING else 0
            G_flat, H_flat = self._fold_pair(
                G_flat, H_flat, n, gl, gr, hl, hr
            )
            G_flat.block_until_ready()
            if _TIMING:
                TIMER.add("fold", time.time() - t0)
        TIMER.dump("ipp")
        return InnerProductProof(
            L_vec, R_vec, scvec.row_to_scalar(a[0]), scvec.row_to_scalar(b[0])
        )

    def _fold_pair(self, g_flat, h_flat, n, gl, gr, hl, hr):
        """Fold both generator vectors in ONE fold_chunk dispatch (lane-axis
        concatenation keeps each vector in its own block range)."""
        np_ = _pad_to_block(n)

        def prep(flat, lo, hi):
            part = jnp.concatenate(
                [flat[:, lo:hi], pcurve._ident_flat(np_ - (hi - lo))], axis=1
            )
            return part.reshape(pcurve.ROWS, pcurve.SUB, np_ // pcurve.SUB)

        left = jnp.concatenate(
            [prep(g_flat, 0, n), prep(h_flat, 0, n)], axis=2
        )
        right = jnp.concatenate(
            [prep(g_flat, n, 2 * n), prep(h_flat, n, 2 * n)], axis=2
        )

        bl = jnp.concatenate(
            [_words_rows(gl, np_), _words_rows(hl, np_)], axis=2
        )
        br = jnp.concatenate(
            [_words_rows(gr, np_), _words_rows(hr, np_)], axis=2
        )
        folded = pcurve.fold_chunk(left, right, bl, br)
        lanes = np_ // pcurve.SUB
        g_out = folded[:, :, :lanes].reshape(pcurve.ROWS, np_)[:, :n]
        h_out = folded[:, :, lanes:].reshape(pcurve.ROWS, np_)[:, :n]
        return g_out, h_out

    def _fold(self, flat, n, s_left: np.ndarray, s_right: np.ndarray):
        """flat (92, 2n) -> (92, n): out_i = s_left_i*P_i + s_right_i*P_{n+i}."""
        np_ = _pad_to_block(n)
        left = jnp.concatenate(
            [flat[:, :n], pcurve._ident_flat(np_ - n)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, np_ // pcurve.SUB)
        right = jnp.concatenate(
            [flat[:, n : 2 * n], pcurve._ident_flat(np_ - n)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, np_ // pcurve.SUB)
        folded = pcurve.fold_chunk(
            left, right, _words_rows(s_left, np_), _words_rows(s_right, np_)
        )
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
