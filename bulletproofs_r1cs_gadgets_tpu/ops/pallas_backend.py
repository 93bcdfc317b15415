"""Prover/verifier device backend built on the Pallas kernels.

Same interface as :class:`.backend.DeviceBackend` (phase_commitments /
ipp_create / msm), with every MSM a single ``msm_block_totals`` dispatch
(bit-serial per-lane ladders + in-kernel block reduction; per-block totals
are combined on host - at most a few hundred adds).  The IPP fuses the two
L/R MSMs per round into one dispatch (block-aligned lane packing) and folds
both generator vectors in one ``fold_chunk`` dispatch.  Only transcripts
and O(n) scalar folds stay on host.  This is the production TPU path;
:class:`.backend.DeviceBackend` remains the XLA-composed variant (the
CPU-testable oracle).
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

from ..core.scalar import Scalar, inner_product
from ..core.ristretto import RistrettoPoint, multiscalar_mul
from ..core.ipp import InnerProductProof
from ..utils.constants import L
from .curve import points_to_device, points_from_device
from . import pallas_curve as pcurve

MIN_DEVICE_N = 64


_words_matrix = pcurve.words_matrix


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
    def _msm_to_point(self, scalars, rows, n) -> RistrettoPoint:
        """One-dispatch MSM (in-kernel block reduction) + tiny host combine
        of the per-block totals."""
        t0 = time.time() if _TIMING else 0
        target = -(-n // pcurve.BLOCK_PTS) * pcurve.BLOCK_PTS
        rows = _pad_pts(rows, n, target)
        words = pcurve.words_matrix(scalars + [0] * (target - len(scalars)))
        wr = pcurve.words_to_rows(words)
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

    def _msm_pair(self, sc_a, flat_a, sc_b, flat_b, m):
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
        pad = [0] * (target - m)
        words = jnp.concatenate(
            [
                pcurve.words_to_rows(pcurve.words_matrix(sc_a + pad)),
                pcurve.words_to_rows(pcurve.words_matrix(sc_b + pad)),
            ],
            axis=2,
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
    def stage_ipp_gens(self, gens_share, padded_n: int) -> None:
        """Pre-stage the generator device arrays for the next ipp_create
        (reuses the per-gens upload cache instead of re-converting the host
        point lists - the conversion used to dominate warm proving)."""
        G_rows, _ = self._gens_rows(gens_share, padded_n, "G")
        H_rows, _ = self._gens_rows(gens_share, padded_n, "H")
        self._staged_ipp = (
            padded_n,
            G_rows.reshape(pcurve.ROWS, -1)[:, :padded_n],
            H_rows.reshape(pcurve.ROWS, -1)[:, :padded_n],
        )

    def ipp_create(
        self, transcript, Q, G_factors, H_factors, G, H, a, b
    ) -> InnerProductProof:
        n = len(G)
        if n < self.min_device_n:
            from .backend import _SkipDomainSep

            return InnerProductProof.create(
                _SkipDomainSep(transcript), Q, G_factors, H_factors, G, H, a, b
            )

        t0 = time.time() if _TIMING else 0
        staged = getattr(self, "_staged_ipp", None)
        if staged is not None and staged[0] == n:
            _, G_flat, H_flat = staged
            self._staged_ipp = None
        else:
            G_flat = pcurve.points_to_rows(
                _padded_points_dev(G)
            ).reshape(pcurve.ROWS, -1)[:, :n]
            H_flat = pcurve.points_to_rows(
                _padded_points_dev(H)
            ).reshape(pcurve.ROWS, -1)[:, :n]
        Q_flat = pcurve.points_to_rows(
            _padded_points_dev([Q] * 8)
        ).reshape(pcurve.ROWS, -1)[:, :1]
        if _TIMING:
            TIMER.add("ipp_upload", time.time() - t0)
        a = list(a)
        b = list(b)
        L_vec: list[bytes] = []
        R_vec: list[bytes] = []
        first = True
        while n != 1:
            n //= 2
            t0 = time.time() if _TIMING else 0
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
            a = [a_L[i] * u + u_inv * a_R[i] for i in range(n)]
            b = [b_L[i] * u_inv + u * b_R[i] for i in range(n)]
            if _TIMING:
                TIMER.add("ipp_host_folds", time.time() - t0)
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
            t0 = time.time() if _TIMING else 0
            G_flat, H_flat = self._fold_pair(
                G_flat, H_flat, n, gl, gr, hl, hr
            )
            G_flat.block_until_ready()
            if _TIMING:
                TIMER.add("fold", time.time() - t0)
        TIMER.dump("ipp")
        return InnerProductProof(L_vec, R_vec, a[0], b[0])

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

        def prep_words(sc):
            mat = np.concatenate(
                [_words_matrix(sc), np.zeros((np_ - n, 8), np.int32)]
            )
            return pcurve.words_to_rows(mat)

        bl = jnp.concatenate([prep_words(gl), prep_words(hl)], axis=2)
        br = jnp.concatenate([prep_words(gr), prep_words(hr)], axis=2)
        folded = pcurve.fold_chunk(left, right, bl, br)
        lanes = np_ // pcurve.SUB
        g_out = folded[:, :, :lanes].reshape(pcurve.ROWS, np_)[:, :n]
        h_out = folded[:, :, lanes:].reshape(pcurve.ROWS, np_)[:, :n]
        return g_out, h_out

    def _fold(self, flat, n, s_left, s_right):
        """flat (92, 2n) -> (92, n): out_i = s_left_i*P_i + s_right_i*P_{n+i}."""
        np_ = _pad_to_block(n)
        left = jnp.concatenate(
            [flat[:, :n], pcurve._ident_flat(np_ - n)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, np_ // pcurve.SUB)
        right = jnp.concatenate(
            [flat[:, n : 2 * n], pcurve._ident_flat(np_ - n)], axis=1
        ).reshape(pcurve.ROWS, pcurve.SUB, np_ // pcurve.SUB)
        bl = pcurve.words_to_rows(
            np.concatenate(
                [_words_matrix(s_left), np.zeros((np_ - n, 8), np.int32)]
            )
        )
        br = pcurve.words_to_rows(
            np.concatenate(
                [_words_matrix(s_right), np.zeros((np_ - n, 8), np.int32)]
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
