"""Prover/verifier device backend built on the Pallas kernels.

Same interface as :class:`.backend.DeviceBackend` (phase_commitments /
ipp_create / msm / msm_gens), but every device MSM and generator fold is
dispatched through the fixed-shape chunked layer (:mod:`.chunks`): exactly
two compiled kernel shapes serve the whole proof engine, dispatches queue
asynchronously, and each MSM (or fused L/R pair) costs ONE host sync.
Measured motivation in PERF_NOTES.md: ~70 s Mosaic compile per NEW kernel
shape and ~55-60 ms per sync on this remote backend - round 1 compiled ~25
shapes per process (~15 min cold), this design compiles 2.

Scalar vectors arrive as ``(n, 4) uint64`` numpy arrays (``core.scvec``
layout): the packed 32-bit words the kernels consume are zero-copy views
chunked host-side, and all host-side scalar folds/inner products run in
the C++ vector layer - only transcripts stay in Python.  This is the
production TPU path; :class:`.backend.DeviceBackend` remains the
XLA-composed variant (the CPU-testable oracle).
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..utils.metrics import METRICS

_TIMING = (
    os.environ.get("BPTPU_TIMING", "") not in ("", "0")
    or bool(os.environ.get("BPTPU_METRICS", ""))
)


class _Timer:
    """Per-phase wall time, recorded into the structured registry
    (``utils.metrics.METRICS``) under the ``pallas.`` prefix; ``dump``
    prints the stderr line when BPTPU_TIMING=1 and clears the group."""

    def add(self, name: str, dt: float):
        METRICS.add_time(f"pallas.{name}", dt)

    def dump(self, label: str):
        METRICS.dump_group("pallas", label)


TIMER = _Timer()

from ..core.scalar import Scalar
from ..core import scvec
from ..core.ristretto import RistrettoPoint, multiscalar_mul
from ..core.ipp import InnerProductProof, _skip_domain_sep
from ..utils.constants import L as _L
from . import chunks as ck

from ..utils.config import DEFAULT_CONFIG

MIN_DEVICE_N = DEFAULT_CONFIG.engine.pallas_min_device_n
CHUNK = ck.CHUNK

# window-accumulator MSM walker (pallas_curve.msm_win_*): ~4x fewer
# point-ops than the per-lane w4 ladder; BPTPU_WINMSM=0 falls back to the
# ladder grid kernels (msm_grid_acc / msm_grid_pair)
_WINMSM = os.environ.get("BPTPU_WINMSM", "1") != "0"
# half-width dual-ladder generator folds (~230 point-ops/lane vs ~330);
# BPTPU_W3H=0 falls back to the full-width w4 constant fold
_W3H = os.environ.get("BPTPU_W3H", "1") != "0"
# wrap-around index map: the combined-layout R walk's two table segments
# in ONE msm_win dispatch.  Validated on hardware (4 true-wrap kernel
# geometries byte-equal + stage-5 equivalence gate green); default ON.
_WRAPMSM = os.environ.get("BPTPU_WRAPMSM", "1") != "0"
# table tiering: drop to the half-capacity multiple-table shape once the
# combined layout's valid span fits (386 MB instead of 772 MB per job from
# round 3 on — lifts the batched-HBM ceiling); costs one extra Mosaic
# compile pair per process.  Validated on hardware (stage-5 gate); ~
# neutral on its own (the tier-boundary table rebuild loses donation) but
# positive combined with the flotilla and required for inflight-capped
# B > 12 batches; default ON.
_TBLTIER = os.environ.get("BPTPU_TBLTIER", "1") != "0"
# paired window walk: a combined round's L and R MSMs in ONE msm_win_pair
# dispatch (side grid dimension running the unchanged single-walker step
# body; the second dispatch's launch+ramp fixed cost disappears).
# Validated on hardware 2026-08-20: 9-path stage-5 gate byte-identical,
# batch B=12 w=3 best-pass 25.9 s vs 38.6 s with it off in the same
# session (noisy session, but every on pass beat every off pass);
# default ON.
_PAIRWALK = os.environ.get("BPTPU_PAIRWALK", "1") != "0"
# frozen-tail flotilla: once every active job of a batch is frozen, pack
# the wave's [G|H] chunks into ONE capacity array and compute all 2B
# L/R points per round in ONE msm_lane dispatch instead of B pair
# dispatches (~19 ms each).  Validated on hardware (stage-5 gate,
# batched path byte-equal); ~9% batch throughput; default ON.
_FLOTILLA = os.environ.get("BPTPU_FLOTILLA", "1") != "0"
# w5 walker for the SHARED generator tables (phase-1, IPP round-1,
# verifier mega-MSM): 51 window steps instead of 64 on the mul-bound
# walks for 2x shared-table HBM (+1.5 GB, NOT per-job).  PERF_NOTES
# roadmap candidate #3; validated via the stage-5 byte-equivalence gate.
_W5 = os.environ.get("BPTPU_W5", "1") != "0"


def _as_array(scalars) -> np.ndarray:
    """list[Scalar] | (n,4) u64 array -> (n,4) u64 array."""
    if isinstance(scalars, np.ndarray):
        return scalars
    return scvec.from_scalars(list(scalars))


def _shared_grid_words(arr: np.ndarray, k: int):
    """Word encode matching the SHARED-gens-table walker (w5 or w4)."""
    return ck.grid_words5(arr, k) if _W5 else ck.grid_words(arr, k)


def _shared_win(tbl, words, valid: int, **kw):
    """Window walk over a SHARED gens table (w5 or w4 per BPTPU_W5)."""
    return (ck.msm_win5 if _W5 else ck.msm_win)(tbl, words, valid, **kw)


def _nchunks(n: int) -> int:
    return max(1, -(-n // CHUNK))


class PallasBackend:
    """Routes the engine's heavy vector math to the Pallas TPU kernels."""

    def __init__(self, min_device_n: int = MIN_DEVICE_N):
        self.min_device_n = min_device_n
        self._gens_cache: dict = {}
        self._point_chunk_cache: dict = {}

    def evict_gens(self) -> None:
        """Free every cached generator capacity array and multiple table.

        The cache is keyed by ``id(gens_share._gens)``, so entries for
        dead gens objects can never be hit again yet still pin their
        device buffers (a full-capacity big+table pair is ~0.9 GB HBM).
        Call between workloads that use different ``BulletproofGens``
        (bench does, between stages): the next proof on the live gens
        rebuilds its arrays once (~15 s for 2^18) and the batch sweep
        regains the headroom — 12 in-flight VSMT-2 jobs sit within
        ~1.5 GB of the 16 GB chip (PERF_NOTES 'HBM accounting'), so a
        stale pair is the difference between steady state and paging."""
        self._gens_cache.clear()
        self._point_chunk_cache.clear()

    # -------------------------------------------------- generator caching
    def _gens_chunks(self, gens_share, n: int, which: str):
        """Device chunk list covering >= n generator points (cached per
        underlying gens object; a larger cached list serves smaller n)."""
        key = (id(gens_share._gens), which)
        cached = self._gens_cache.get(key)
        k = _nchunks(n)
        if cached is None or len(cached) < k:
            limbs = (
                gens_share.G_limbs(n) if which == "G"
                else gens_share.H_limbs(n)
            )
            cached = ck.limbs_to_chunks(limbs)
            self._gens_cache[key] = cached
        return cached[:k]

    def _gens_big(self, gens_share, n: int, which: str):
        """Capacity-shaped (92, 8, GRID_LANES) generator array for the
        grid MSM/fold kernels (cached per gens object); None when n needs
        more than GRID_CHUNKS chunks."""
        k = _nchunks(n)
        if k > ck.GRID_CHUNKS:
            return None
        key = (id(gens_share._gens), which, "big")
        got = self._gens_cache.get(key)
        if got is None or got[1] < k:
            chunks = self._gens_chunks(gens_share, n, which)
            got = (ck.chunks_to_big(chunks), len(chunks))
            self._gens_cache[key] = got
        return got[0]

    def _gens_table(self, gens_share, n: int, which: str):
        """Capacity-shaped multiple table over the generator vector for
        the window-accumulator MSM walker — built ONCE per gens object
        (fixed-base MSM: every proof and every IPP round 1 reuses it).
        Under ``BPTPU_W5`` (default) this is the 16-entry w5 table walked
        by :func:`ck.msm_win5`; otherwise the 8-entry w4 table."""
        k = _nchunks(n)
        if k > ck.GRID_CHUNKS:
            return None
        key = (id(gens_share._gens), which, "tbl5" if _W5 else "tbl")
        got = self._gens_cache.get(key)
        if got is None or got[1] < k:
            big = self._gens_big(gens_share, n, which)
            nc = self._gens_cache[(id(gens_share._gens), which, "big")][1]
            tbl = ck.table_big5(big, nc) if _W5 else ck.table_big(big, nc)
            got = (tbl, nc)
            self._gens_cache[key] = got
        return got[0]

    def _cached_point_chunk(self, tag: str, point: RistrettoPoint):
        """One-point chunk (point at lane 0), cached by compressed bytes."""
        key = (tag, point.compress())
        got = self._point_chunk_cache.get(key)
        if got is None:
            got = ck.points_to_chunks([point])[0]
            self._point_chunk_cache[key] = got
        return got

    # ------------------------------------------------------------- MSM API
    def msm(self, scalars, points: list[RistrettoPoint]) -> RistrettoPoint:
        if len(scalars) < self.min_device_n:
            if isinstance(scalars, np.ndarray):
                scalars = scvec.to_scalars(scalars)
            return multiscalar_mul(scalars, points)
        arr = _as_array(scalars)
        pts = ck.points_to_chunks(points)
        acc = ck.msm_chain(pts, ck.words_chunks(arr, len(pts), encode="w4"))
        return ck.fetch_points([acc])[0]

    def msm_gens(
        self, scalars, head_points, gens_share, padded_n, tail_points
    ) -> RistrettoPoint:
        """Verifier mega-MSM over [head, G(padded_n), H(padded_n), tail];
        the generator segments ride the per-gens chunk cache."""
        nh, nt = len(head_points), len(tail_points)
        total = nh + 2 * padded_n + nt
        arr = _as_array(scalars)
        if total < self.min_device_n:
            pts = (
                head_points
                + gens_share.G(padded_n)
                + gens_share.H(padded_n)
                + tail_points
            )
            return multiscalar_mul(scvec.to_scalars(arr), pts)
        t0 = time.time() if _TIMING else 0
        k = _nchunks(padded_n)
        head = ck.points_to_chunks(head_points)
        tail = ck.points_to_chunks(tail_points)
        G_big = self._gens_big(gens_share, padded_n, "G") if k >= 2 else None
        if G_big is not None:
            H_big = self._gens_big(gens_share, padded_n, "H")
            enc = _shared_grid_words if _WINMSM else ck.grid_words
            sc_G = enc(arr[nh : nh + padded_n], k)
            sc_H = enc(arr[nh + padded_n : nh + 2 * padded_n], k)
            head_w = ck.words_chunks(arr[:nh], len(head), encode="w4")
            tail_w = ck.words_chunks(
                arr[nh + 2 * padded_n :], len(tail), encode="w4"
            )
            if _TIMING:
                TIMER.add("msm_prep", time.time() - t0)
                t0 = time.time()
            acc = ck.msm_chain(head, head_w)
            if _WINMSM:
                tG = self._gens_table(gens_share, padded_n, "G")
                tH = self._gens_table(gens_share, padded_n, "H")
                acc = _shared_win(tG, sc_G, k, chain=acc)
                acc = _shared_win(tH, sc_H, k, chain=acc)
            else:
                acc = ck.msm_grid(G_big, sc_G, k, acc=acc)
                acc = ck.msm_grid(H_big, sc_H, k, acc=acc)
            acc = ck.msm_chain(tail, tail_w, acc=acc)
            out = ck.fetch_points([acc])[0]
            if _TIMING:
                TIMER.add("msm_device", time.time() - t0)
            return out
        G = self._gens_chunks(gens_share, padded_n, "G")
        H = self._gens_chunks(gens_share, padded_n, "H")
        words = ck.segment_words([
            (arr[:nh], len(head)),
            (arr[nh : nh + padded_n], len(G)),
            (arr[nh + padded_n : nh + 2 * padded_n], len(H)),
            (arr[nh + 2 * padded_n :], len(tail)),
        ])
        if _TIMING:
            TIMER.add("msm_prep", time.time() - t0)
            t0 = time.time()
        acc = ck.msm_chain(head + G + H + tail, words)
        out = ck.fetch_points([acc])[0]
        if _TIMING:
            TIMER.add("msm_device", time.time() - t0)
        return out

    # -------------------------------------------------- prover commitments
    def _phase_host(
        self, gens_share, a_L, a_R, a_O, s_L, s_R,
        i_blinding, o_blinding, s_blinding, B_blinding, offset,
    ):
        n = len(a_L)
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

    def _phase_begin(
        self, gens_share, a_L, a_R, a_O, s_L, s_R,
        i_blinding, o_blinding, s_blinding, B_blinding, offset,
    ):
        """Dispatch the three phase-1 MSM chains; returns
        ``((acc_AI, acc_AO, acc_S), heads_or_None)`` — device accumulators
        (NO sync) for a later fused :func:`ck.fetch_points`, plus the
        host-computed blinding head points on the grid path (added after
        the fetch; see ``phase_commitments_batch``)."""
        n = len(a_L)
        assert offset == 0, "phase-2 device commitments not yet routed"
        t0 = time.time() if _TIMING else 0
        a_L, a_R, a_O = _as_array(a_L), _as_array(a_R), _as_array(a_O)
        s_L, s_R = _as_array(s_L), _as_array(s_R)
        k = _nchunks(n)
        G_big = self._gens_big(gens_share, n, "G") if k >= 2 else None
        if G_big is not None:
            # grid path: 2 dispatches per commitment instead of 2k+1
            H_big = self._gens_big(gens_share, n, "H")
            if _WINMSM:
                tG = self._gens_table(gens_share, n, "G")
                tH = self._gens_table(gens_share, n, "H")
                msm_G = lambda wds, acc: _shared_win(tG, wds, k, chain=acc)
                msm_H = lambda wds, acc: _shared_win(tH, wds, k, chain=acc)
                enc = _shared_grid_words
            else:
                msm_G = lambda wds, acc: ck.msm_grid(G_big, wds, k, acc=acc)
                msm_H = lambda wds, acc: ck.msm_grid(H_big, wds, k, acc=acc)
                enc = ck.grid_words
            # blinding heads i/o/s_blinding * B_blinding: ~2 ms host
            # scalar_muls instead of three single-lane device ladder
            # dispatches per proof (the host-Q-terms pattern of
            # round_dispatch); added to the fetched walk totals — same
            # group elements, identical compressed bytes
            heads = (
                B_blinding.scalar_mul(i_blinding),
                B_blinding.scalar_mul(o_blinding),
                B_blinding.scalar_mul(s_blinding),
            )
            if _TIMING:
                TIMER.add("phase1_prep", time.time() - t0)
                t0 = time.time()
            acc_AI = msm_H(
                enc(a_R, k),
                msm_G(enc(a_L, k), None),
            )
            acc_AO = msm_G(enc(a_O, k), None)
            acc_S = msm_H(
                enc(s_R, k),
                msm_G(enc(s_L, k), None),
            )
            if _TIMING:
                TIMER.add("phase1_dispatch", time.time() - t0)
            return (acc_AI, acc_AO, acc_S), heads
        bb = self._cached_point_chunk("Bb", B_blinding)
        G = self._gens_chunks(gens_share, n, "G")
        H = self._gens_chunks(gens_share, n, "H")
        if _TIMING:
            TIMER.add("phase1_prep", time.time() - t0)
            t0 = time.time()
        acc_AI = ck.msm_chain(
            [bb] + G + H,
            [ck.single_scalar_words(i_blinding)]
            + ck.segment_words([(a_L, k), (a_R, k)]),
        )
        acc_AO = ck.msm_chain(
            [bb] + G,
            [ck.single_scalar_words(o_blinding)]
            + ck.segment_words([(a_O, k)]),
        )
        acc_S = ck.msm_chain(
            [bb] + G + H,
            [ck.single_scalar_words(s_blinding)]
            + ck.segment_words([(s_L, k), (s_R, k)]),
        )
        if _TIMING:
            TIMER.add("phase1_dispatch", time.time() - t0)
        return (acc_AI, acc_AO, acc_S), None

    def phase_commitments(self, *args):
        return self.phase_commitments_batch([args])[0]

    def phase_commitments_batch(self, jobs: list[tuple]) -> list[tuple]:
        """Phase-1 vector commitments for B provers with ONE device sync:
        all 3B MSM chunk chains are queued asynchronously, then fetched
        together.  Each job is the ``phase_commitments`` argument tuple;
        returns [(A_I, A_O, S) compressed] per job."""
        out: list = [None] * len(jobs)
        accs = []
        heads = []
        order = []
        for idx, job in enumerate(jobs):
            if len(job[1]) < self.min_device_n:
                out[idx] = self._phase_host(*job)
            else:
                job_accs, job_heads = self._phase_begin(*job)
                accs.extend(job_accs)
                heads.append(job_heads)
                order.append(idx)
        if accs:
            t0 = time.time() if _TIMING else 0
            pts = ck.fetch_points(accs)
            if _TIMING:
                TIMER.add("phase1_sync", time.time() - t0)
            for j, idx in enumerate(order):
                A_I, A_O, S = pts[3 * j : 3 * j + 3]
                if heads[j] is not None:
                    h_I, h_O, h_S = heads[j]
                    A_I, A_O, S = A_I + h_I, A_O + h_O, S + h_S
                out[idx] = (A_I.compress(), A_O.compress(), S.compress())
        return out

    # ------------------------------------------------------------------ IPP
    def ipp_create(
        self, transcript, Q, G_factors, H_factors, gens_share, padded_n,
        a, b, meta=None,
    ) -> InnerProductProof:
        """Caller has already appended the ``ipp v1`` domain separator;
        G_factors/H_factors/a/b are (n, 4) u64 arrays; generators come
        from the per-gens chunk cache.  `meta` (core/prover.py ipp_meta:
        n1/n_real/u/y_inv) enables the host-tracked factor folds."""
        return self.ipp_create_batch(
            [(transcript, Q, G_factors, H_factors, gens_share, padded_n,
              a, b, meta)]
        )[0]

    def ipp_create_batch(self, jobs: list[tuple]) -> list[InnerProductProof]:
        """Inner-product arguments for B independent proofs driven in
        lockstep: per log-round, all 2B L/R MSM chunk chains dispatch
        asynchronously and are fetched with ONE sync, then each job takes
        its own Fiat-Shamir challenge and queues its generator folds (no
        sync).  The per-round sync cost — the dominant term of a warm
        single-proof IPP — amortises B-fold."""
        out: list = [None] * len(jobs)
        states: list[tuple[int, _IppJob]] = []
        for idx, job in enumerate(jobs):
            (transcript, Q, G_factors, H_factors, gens_share, padded_n,
             a, b) = job[:8]
            if padded_n < self.min_device_n:
                out[idx] = InnerProductProof.create(
                    _skip_domain_sep(transcript), Q,
                    scvec.to_scalars(_as_array(G_factors)),
                    scvec.to_scalars(_as_array(H_factors)),
                    gens_share.G(padded_n), gens_share.H(padded_n),
                    scvec.to_scalars(_as_array(a)),
                    scvec.to_scalars(_as_array(b)),
                )
            else:
                states.append((idx, _IppJob(self, *job)))
        # Per-round host stages (scalar folds, inner products, word
        # encodes) are independent across jobs and the heavy parts release
        # the GIL (C++ scvec, numpy) — a small pool overlaps them.  Device
        # dispatch order changes, proof bytes do not (per-job transcript
        # and rng order is untouched).
        pool = None
        if len(states) > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(
                max_workers=min(len(states), max(1, (os.cpu_count() or 4) - 1))
            )
        flot_pts = None
        flot_ids: tuple = ()
        try:
            while True:
                active = [(idx, s) for idx, s in states if s.n > 1]
                if not active:
                    break
                if (
                    _FLOTILLA and len(active) > 1
                    and all(s.frozen for _, s in active)
                    and 2 * len(active) <= ck.GRID_CHUNKS
                ):
                    # flotilla round: ONE msm_lane dispatch computes every
                    # job's L and R (job j's words at chunks 2j / 2j+1 of
                    # the shared pack) — B pair dispatches become one.
                    ids = tuple(id(s) for _, s in active)
                    if ids != flot_ids:
                        flot_pts = ck.flotilla_pack(
                            [s.fz_chunk for _, s in active]
                        )
                        flot_ids = ids
                    if pool is not None:
                        rows = list(
                            pool.map(lambda a: a[1].frozen_rows(), active)
                        )
                    else:
                        rows = [s.frozen_rows() for _, s in active]
                    block = ck.msm_lane(
                        flot_pts, ck.flotilla_words(rows), 2 * len(active)
                    )
                    t0 = time.time() if _TIMING else 0
                    pts = ck.fetch_lane_points(block, 2 * len(active))
                    if _TIMING:
                        TIMER.add("pair_sync", time.time() - t0)
                    if pool is not None:
                        list(pool.map(
                            lambda a: a[1][1].round_finish(
                                pts[2 * a[0]], pts[2 * a[0] + 1]
                            ),
                            enumerate(active),
                        ))
                    else:
                        for j, (_, s) in enumerate(active):
                            s.round_finish(pts[2 * j], pts[2 * j + 1])
                    continue
                if pool is not None:
                    pairs = list(
                        pool.map(lambda a: a[1].round_dispatch(), active)
                    )
                else:
                    pairs = [s.round_dispatch() for _, s in active]
                accs = [acc for pair in pairs for acc in pair]
                t0 = time.time() if _TIMING else 0
                pts = ck.fetch_points(accs)
                if _TIMING:
                    TIMER.add("pair_sync", time.time() - t0)
                if pool is not None:
                    list(pool.map(
                        lambda a: a[1][1].round_finish(
                            pts[2 * a[0]], pts[2 * a[0] + 1]
                        ),
                        enumerate(active),
                    ))
                else:
                    for j, (_, s) in enumerate(active):
                        s.round_finish(pts[2 * j], pts[2 * j + 1])
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
        for idx, s in states:
            out[idx] = s.result()
        if states:
            TIMER.dump("ipp")
        return out


def _ratio_pieces(bp: int, m: int) -> tuple[int, int, int]:
    """Piecewise shape of r_i = F[i+m]/F[i] for a 2-segment factor vector
    F over [0, 2m) (value A on [0, bp), B on [bp, 2m), rho = B/A):
    r_i = rho^powA for i < rbp else rho^powB.  Returns (powA, powB, rbp).

    The engine's G_factors are [1]*n1 + [u]*rest and H_factors multiply
    in a geometric y^-i (core/prover.py:_prove_middle), and a fold scales
    the surviving half by one constant — so this 2-segment structure (and
    rho == the phase challenge u) is invariant across all IPP rounds."""
    if bp <= m:
        return 1, 0, bp
    return 0, 1, bp - m


def _pw_rows(cA, cB, rbp: int, m: int) -> np.ndarray:
    """(m, 4) u64 array: cA for index < rbp, cB beyond."""
    j = min(max(rbp, 0), m)
    return np.concatenate([
        np.tile(scvec.scalar_to_row(cA), (j, 1)),
        np.tile(scvec.scalar_to_row(cB), (m - j, 1)),
    ])


_ONES_ROWS_CACHE: dict[int, np.ndarray] = {}


def _ones_rows(m: int) -> np.ndarray:
    got = _ONES_ROWS_CACHE.get(m)
    if got is None:
        got = np.tile(scvec.scalar_to_row(Scalar.one()), (m, 1))
        _ONES_ROWS_CACHE[m] = got
    return got


# ------------------------------------------------------------- frozen tail
# Once both generator vectors fit half a chunk (side size S <= 512), the
# per-round device folds and separate L/R/Q dispatches stop paying for
# their fixed costs: each dispatch runs a full 2048-lane block no matter
# how few lanes are live (measured ~10-18 ms each), so a late round cost
# ~63 ms of device time for a handful of real point-ops.
#
# The frozen-tail path instead PINS the generator vectors at size S and
# expresses every remaining round over them with composite scalars: a
# skipped fold D'_i = D_i + c_i * D_{i+mu} is absorbed into per-frozen-
# index factor vectors FF (host, (S, 4) u64), and a round's L and R MSMs
# become ONE `msm_grid_pair` dispatch over a fixed packed array
# [G(S) | H(S) | identity...] duplicated in two capacity chunks (low
# chunk takes the L words, high chunk the R words); the c_L*Q / c_R*Q
# terms are ~2 ms host scalar_muls added in round_finish (the same
# ``_host_q`` pattern as the non-frozen rounds).  Host work is O(S)
# numpy/C++ per round; device work is one two-chunk walk (~19 ms)
# instead of 2 walks + 2 Q chains + 2 folds.  Proof bytes are unchanged
# (the L/R points are mathematically identical).
#
# These helpers are pure (host) so tests/test_ipp_frozen_tail.py can pin
# the math against the host IPP without TPU kernels.
# S: frozen side size cap.  The pack is [G(S) | H(S)] in ONE chunk
# (2*S <= CHUNK) with the Q terms computed on HOST (round_finish
# ``_host_q``), so S reaches CHUNK/2 = 1024: the n=512 round — a ~35 ms
# tail-path round (pack + 2 ladder chains + 2 tail folds) — runs as one
# cheap flotilla walk instead, and padded_n <= 1024 circuits (Poseidon
# preimage CS-3) freeze from round 1.  Round-5 change; L/R bytes
# unchanged (host Q add is the same group element).
FROZEN_MAX_SIDE = 1024


def frozen_fold_update(FF: np.ndarray, mu: int, rbp: int, cA, cB
                       ) -> np.ndarray:
    """Absorb one skipped generator fold (virtual size 2*mu -> mu, fold
    constant cA for output index < rbp else cB) into the frozen factor
    vector: FF'_k = FF_k * c_{(k mod 2mu) - mu} when (k mod 2mu) >= mu."""
    S = FF.shape[0]
    k = np.arange(S)
    v = k % (2 * mu)
    hi = v >= mu
    i = np.where(hi, v - mu, 0)
    c_rows = np.where(
        hi[:, None],
        np.where((i < rbp)[:, None], scvec.scalar_to_row(cA),
                 scvec.scalar_to_row(cB)),
        scvec.scalar_to_row(Scalar.one()),
    ).astype(np.uint64)
    return scvec.mul(FF, np.ascontiguousarray(c_rows))


def frozen_walk_rows(
    S: int, m: int, scG_L, scH_L, scG_R, scH_R, FFG, FFH,
) -> tuple[np.ndarray, np.ndarray]:
    """Composite MSM scalar rows for one frozen round (virtual size
    2m -> m).  Returns (rowsL, rowsR), each (2S, 4) u64 over the packed
    lane layout [G(S) | H(S)]:

      L = <scG_L, G'[m:2m)> + <scH_L, H'[0:m)>     (+ c_L*Q on host)
      R = <scG_R, G'[0:m)>  + <scH_R, H'[m:2m)>    (+ c_R*Q on host)

    where virtual gen j = sum_{k = j mod 2m} FF_k * frozen_k.  The Q
    terms are the caller's (round_finish ``_host_q`` adds them)."""
    k = np.arange(S)
    v = k % (2 * m)
    hi = v >= m
    zero = np.zeros((1, 4), np.uint64)

    def gather(t, idx, mask):
        rows = np.ascontiguousarray(
            np.where(mask[:, None], t[idx], zero).astype(np.uint64)
        )
        return rows

    g_L = scvec.mul(gather(scG_L, np.where(hi, v - m, 0), hi), FFG)
    h_L = scvec.mul(gather(scH_L, np.where(hi, 0, v), ~hi), FFH)
    g_R = scvec.mul(gather(scG_R, np.where(hi, 0, v), ~hi), FFG)
    h_R = scvec.mul(gather(scH_R, np.where(hi, v - m, 0), hi), FFH)
    rowsL = np.concatenate([g_L, h_L])
    rowsR = np.concatenate([g_R, h_R])
    return rowsL, rowsR


class _IppJob:
    """Per-proof state of a device-backed IPP, advanced one log-round at a
    time by :meth:`PallasBackend.ipp_create_batch`.

    Generator folding uses host-tracked factor vectors: the device arrays
    hold D with true folded gens G' = F_i * D_i; each round folds D by
    out = D_L + c * D_R with at most two c values (one breakpoint, see
    :func:`_ratio_pieces`), and F folds by a single scalar on host.  The
    factors multiply into the L/R MSM *scalars* (cheap C++ vector muls),
    so folds need no per-lane scalar words, cost a single shared-table w4
    ladder (~330 point-ops vs ~516 dual w2), and can run in place
    (pallas_curve.fold_grid_c_donate) — proof bytes are unchanged.

    Late rounds (both sides <= FROZEN_MAX_SIDE lanes) switch to the
    frozen-tail mode (module helpers above): one pair dispatch per round
    over a pinned [G|H|Q] packing, folds absorbed into host factor
    vectors.  Q terms of non-frozen rounds are added on host in
    round_finish (cheaper than single-lane device chains)."""

    def __init__(
        self, backend: PallasBackend, transcript, Q, G_factors, H_factors,
        gens_share, padded_n, a, b, meta=None,
    ):
        t0 = time.time() if _TIMING else 0
        self.t = transcript
        self.n = padded_n
        self.a = _as_array(a)
        self.b = _as_array(b)
        # factor vectors (folded on host each round)
        self.GF = _as_array(G_factors)
        self.HF = _as_array(H_factors)
        meta = meta or {}
        self.bp = min(int(meta.get("n1", padded_n)), padded_n)
        # 2-piece factor structure: ratio rho per side (starts at the
        # phase challenge u), breakpoint bp; evolves with half-width folds
        self.rho_G = self.rho_H = meta.get("u", Scalar.one())
        self.y_inv = meta.get("y_inv", Scalar.one())
        self._a_nz = int(meta.get("n_real", padded_n))
        self.Qpt = Q
        self._host_q = False
        # combined G|H capacity array + table (winmsm rounds >= 2)
        self.C_big = None
        self.tC = None
        self._tC_half = False
        # frozen-tail state (False until both sides fit half a chunk)
        self.frozen = False
        self.fz = None  # per-job duplicated capacity array (lazy)
        self.fz_chunk = None  # packed [G|H|Q] chunk (flotilla input)
        self.fzS = 0
        self.FFG = self.FFH = None
        if padded_n <= FROZEN_MAX_SIDE:
            # small proof: frozen from round 1 — ONE pair dispatch per
            # round, no generator folds at all
            Gc = backend._gens_chunks(gens_share, padded_n, "G")[0]
            Hc = backend._gens_chunks(gens_share, padded_n, "H")[0]
            self._freeze(Gc, Hc, padded_n)
            self.G = self.H = None
            self.G_big = self.H_big = None
            self._owns_big = False
            self.L_vec = []
            self.R_vec = []
            if _TIMING:
                TIMER.add("ipp_upload", time.time() - t0)
            return
        k0 = _nchunks(padded_n)
        self.G_big = (
            backend._gens_big(gens_share, padded_n, "G") if k0 >= 2 else None
        )
        if self.G_big is not None:
            # capacity-array mode: grid MSM/fold dispatches while n >= CHUNK
            self.H_big = backend._gens_big(gens_share, padded_n, "H")
            self.G = self.H = None
            if _WINMSM:
                # round 1 walks the UNFOLDED gens: shared cached tables;
                # later rounds prepass the fold outputs into owned
                # half-capacity tables (donated round-over-round)
                self.tG = backend._gens_table(gens_share, padded_n, "G")
                self.tH = backend._gens_table(gens_share, padded_n, "H")
                self._tbl_owned = False
        else:
            # working chunk lists; >= n points valid in lanes [0, n)
            self.G = list(backend._gens_chunks(gens_share, padded_n, "G"))
            self.H = list(backend._gens_chunks(gens_share, padded_n, "H"))
        # first fold reads the shared generator cache arrays -> no donation
        self._owns_big = False
        self.L_vec: list[bytes] = []
        self.R_vec: list[bytes] = []
        if _TIMING:
            TIMER.add("ipp_upload", time.time() - t0)

    def _freeze(self, g_chunk, h_chunk, S: int) -> None:
        """Enter frozen-tail mode with side size S (points packed once;
        factor vectors start at one — callers absorb any skipped fold via
        :func:`frozen_fold_update` afterwards).  The duplicated per-job
        capacity array (`fz`) is built lazily: flotilla rounds
        (`ipp_create_batch`) walk the shared flotilla array instead."""
        self.fz_chunk = ck.frozen_pack_chunk(g_chunk, h_chunk, S)
        self.fz = None
        self.frozen = True
        self.fzS = S
        ones = _ones_rows(S).astype(np.uint64)
        self.FFG = ones.copy()
        self.FFH = ones.copy()

    def frozen_rows(self):
        """One frozen round's host state advance; returns the composite
        (rowsL, rowsR) for this round's walk (flotilla path — the caller
        packs many jobs' rows into one dispatch)."""
        scG_L, scH_L, scG_R, scH_R, _ = self._round_scalars()
        t0 = time.time() if _TIMING else 0
        self._host_q = True
        rows = frozen_walk_rows(
            self.fzS, self.n, scG_L, scH_L, scG_R, scH_R,
            self.FFG, self.FFH,
        )
        if _TIMING:
            TIMER.add("pair_dispatch", time.time() - t0)
        return rows

    def _to_chunks_if_tail(self):
        """Drop from capacity-array mode to the single-chunk tail path
        once n < CHUNK (the unfolded vector then fits one chunk); the
        owned half-capacity tables are released (the remaining rounds
        never walk them — ~770 MB/job of HBM back)."""
        if self.G_big is not None and self.n < CHUNK:
            self.G = [ck.big_chunk0(self.G_big)]
            self.H = [ck.big_chunk0(self.H_big)]
            self.G_big = self.H_big = None
            if _WINMSM and getattr(self, "_tbl_owned", False):
                self.tG = self.tH = None

    def _round_scalars(self):
        """Halve n and compute this round's host scalar operands (shared
        head of :meth:`round_dispatch` / :meth:`frozen_rows`)."""
        self.n //= 2
        n = self.n
        t0 = time.time() if _TIMING else 0
        a_L, a_R = self.a[:n], self.a[n:]
        b_L, b_R = self.b[:n], self.b[n:]
        self._halves = (a_L, a_R, b_L, b_R)
        self.c_L = scvec.inner(a_L, b_R)
        self.c_R = scvec.inner(a_R, b_L)
        # MSM scalars carry the host-tracked generator factors every round
        scG_L = scvec.mul(a_L, self.GF[n : 2 * n])
        scH_L = scvec.mul(b_R, self.HF[:n])
        scG_R = scvec.mul(a_R, self.GF[:n])
        scH_R = scvec.mul(b_L, self.HF[n : 2 * n])
        # round 1 only: a is zero beyond the real multiplier count (l_vec
        # pad is analytic zero), so a_R's MSM can skip whole-zero chunks
        a_nz, self._a_nz = self._a_nz, 2 * n  # dense after the first fold
        nzR = max(0, min(a_nz - n, n))
        if _TIMING:
            TIMER.add("ipp_host_scalars", time.time() - t0)
        return scG_L, scH_L, scG_R, scH_R, nzR

    def round_dispatch(self):
        """Halve n, compute this round's scalar operands on host and queue
        the L/R MSM chunk chains; returns (accL, accR) device accumulators
        (NO sync)."""
        scG_L, scH_L, scG_R, scH_R, nzR = self._round_scalars()
        n = self.n
        t0 = time.time() if _TIMING else 0
        if self.frozen:
            # frozen tail: ONE pair dispatch for L and R (Q on host)
            self._host_q = True
            rowsL, rowsR = frozen_walk_rows(
                self.fzS, n, scG_L, scH_L, scG_R, scH_R,
                self.FFG, self.FFH,
            )
            if self.fz is None:
                self.fz = ck.frozen_pack_dup(self.fz_chunk)
            pair = ck.msm_grid_pair(
                self.fz, ck.frozen_pair_words(rowsL, rowsR), 1
            )
            if _TIMING:
                TIMER.add("pair_dispatch", time.time() - t0)
            return ck.pair_lo(pair), ck.pair_hi(pair)
        self._to_chunks_if_tail()
        G, H = self.G, self.H
        # Q's c_L/c_R terms: a single-lane device chain dispatch costs
        # ~10 ms per side per round; a host scalar_mul costs ~2 ms and
        # overlaps other proofs' device work in the batch — so every
        # non-frozen round defers Q to round_finish (host).
        self._host_q = True
        if n >= CHUNK and self.C_big is not None:
            # combined-layout rounds (>= 2, winmsm): sides are 2k chunks,
            # G at [0, 2k), H at [2k, 4k) of ONE capacity array + table.
            # L's two segments (G high half + H low half) are contiguous:
            # ONE walk; R takes two.
            k = n // CHUNK
            if _PAIRWALK:
                # ONE dispatch for both sides: words laid out in walk
                # order [L: scG_L|scH_L at chunks [k,3k)] then
                # [R: scG_R at [0,k) | scH_R at [3k,4k)]
                wLR = ck.grid_words(
                    np.concatenate([scG_L, scH_L, scG_R, scH_R]), 4 * k
                )
                pair = ck.msm_win_pair(self.tC, wLR, k)
                if _TIMING:
                    TIMER.add("pair_dispatch", time.time() - t0)
                return ck.pair_lo(pair), ck.pair_hi(pair)
            wL = ck.grid_words(np.concatenate([scG_L, scH_L]), 2 * k)
            wR = ck.grid_words(np.concatenate([scG_R, scH_R]), 2 * k)
            accL = ck.msm_win(self.tC, wL, 2 * k, poff=k)
            if _WRAPMSM:
                # R's two table segments (G low [0,k), H high [3k,4k))
                # ride ONE dispatch via the wrap-around index map
                accR = ck.msm_win(self.tC, wR, 2 * k, split=k, poff2=3 * k)
            else:
                accR = ck.msm_win(self.tC, wR, k)
                accR = ck.msm_win(
                    self.tC, wR, k, poff=3 * k, woff=k, chain=accR
                )
            if _TIMING:
                TIMER.add("pair_dispatch", time.time() - t0)
            return accL, accR
        if n >= CHUNK and self.G_big is not None and _WINMSM:
            # window-accumulator walks over the current tables: word
            # layout matches the arrays (G side: scG_R at chunks [0,k),
            # scG_L at [k,2k); H side: scH_L low, scH_R high)
            k = n // CHUNK
            kR = max(1, _nchunks(nzR)) if nzR < n else k
            wG = _shared_grid_words(np.concatenate([scG_R, scG_L]), 2 * k)
            wH = _shared_grid_words(np.concatenate([scH_L, scH_R]), 2 * k)
            accL = _shared_win(self.tG, wG, k, poff=k, woff=k)
            accL = _shared_win(self.tH, wH, k, chain=accL)
            accR = _shared_win(self.tG, wG, kR)
            accR = _shared_win(self.tH, wH, k, poff=k, woff=k, chain=accR)
        elif n >= CHUNK and self.G_big is not None:
            # fused pair walks: G_big chunks [0,k) carry scG_R -> R and
            # [k,2k) carry scG_L -> L; H_big [0,k) carry scH_L -> L and
            # [k,2k) carry scH_R -> R.  2 dispatches/round.
            k = n // CHUNK
            kR = max(1, _nchunks(nzR)) if nzR < n else k
            pG = ck.msm_grid_pair(
                self.G_big,
                ck.grid_words(np.concatenate([scG_R, scG_L]), 2 * k),
                k, lo_limit=kR,
            )
            pH = ck.msm_grid_pair(
                self.H_big,
                ck.grid_words(np.concatenate([scH_L, scH_R]), 2 * k),
                k, acc_lo=ck.pair_hi(pG), acc_hi=ck.pair_lo(pG),
            )
            accL = ck.pair_lo(pH)
            accR = ck.pair_hi(pH)
        elif n >= CHUNK:
            k = n // CHUNK
            accL = ck.msm_chain(
                G[k : 2 * k] + H[:k],
                ck.segment_words([(scG_L, k), (scH_L, k)]),
            )
            accR = ck.msm_chain(
                G[:k] + H[k : 2 * k],
                ck.segment_words([(scG_R, k), (scH_R, k)]),
            )
        else:
            ptsL, ptsR = ck._tail_pack_pair(G[0], H[0], n)
            accL = ck.msm_chain(
                [ptsL], [ck.tail_pair_words(scG_L, scH_L, n)]
            )
            accR = ck.msm_chain(
                [ptsR], [ck.tail_pair_words(scG_R, scH_R, n)]
            )
        if _TIMING:
            TIMER.add("pair_dispatch", time.time() - t0)
        return accL, accR

    def round_finish(self, L_pt, R_pt) -> None:
        """Append L/R, take this proof's challenge, fold a/b and the
        factor vectors on host, and queue the constant-scalar generator
        fold dispatches (NO sync)."""
        n = self.n
        a_L, a_R, b_L, b_R = self._halves
        if self._host_q:
            # Q terms deferred from round_dispatch (cheaper on host than
            # as single-lane device chain dispatches)
            L_pt = L_pt + self.Qpt.scalar_mul(self.c_L)
            R_pt = R_pt + self.Qpt.scalar_mul(self.c_R)
        L_c = L_pt.compress()
        R_c = R_pt.compress()
        self.L_vec.append(L_c)
        self.R_vec.append(R_c)
        self.t.append_point(b"L", L_c)
        self.t.append_point(b"R", R_c)
        u = self.t.challenge_scalar(b"u")
        u_inv = u.invert()
        t0 = time.time() if _TIMING else 0
        self.a = scvec.axpby(a_L, u, a_R, u_inv)
        self.b = scvec.axpby(b_L, u_inv, b_R, u)
        # fold constants: D'_i = D_i + c_i * D_{i+n} with c_i in {cA, cB}
        # split at rbp (G side: true fold u_inv*G'_L + u*G'_R; H side:
        # u*H'_L + u_inv*H'_R with the geometric y^-m ratio).  The
        # piecewise factor ratio rho starts as the phase challenge u_phi
        # and evolves when a half-width fold's beta pieces differ.
        powA, powB, rbp = _ratio_pieces(self.bp, n)
        one = Scalar.one()
        u2 = u * u
        hfac = u_inv * u_inv * Scalar(pow(self.y_inv.v, n, _L))
        cG = (
            u2 * (self.rho_G if powA else one),
            u2 * (self.rho_G if powB else one),
        )
        cH = (
            hfac * (self.rho_H if powA else one),
            hfac * (self.rho_H if powB else one),
        )
        # half-width splits apply on the grid fold paths (combined rounds
        # and the round-1 transition); beta^-1 folds into the factor
        # vectors, so the per-lane factor arrays stay exact
        use_w3h = _W3H and not self.frozen and n >= CHUNK and (
            self.C_big is not None
            or (self.G_big is not None and _WINMSM and n >= 2 * CHUNK)
        )
        if use_w3h:
            sGA = ck.half_gcd_split(cG[0].v, _L)
            sGB = ck.half_gcd_split(cG[1].v, _L)
            sHA = ck.half_gcd_split(cH[0].v, _L)
            sHB = ck.half_gcd_split(cH[1].v, _L)
            bGAi = Scalar(sGA[1] % _L).invert()
            bGBi = Scalar(sGB[1] % _L).invert()
            bHAi = Scalar(sHA[1] % _L).invert()
            bHBi = Scalar(sHB[1] % _L).invert()
            self.GF = scvec.mul(
                self.GF[:n], _pw_rows(u_inv * bGAi, u_inv * bGBi, rbp, n)
            )
            self.HF = scvec.mul(
                self.HF[:n], _pw_rows(u * bHAi, u * bHBi, rbp, n)
            )
            # ratio = beta_A / beta_B (beta inverses already computed)
            ratio_G = Scalar(sGA[1] % _L) * bGBi
            ratio_H = Scalar(sHA[1] % _L) * bHBi
        else:
            self.GF = scvec.scale(self.GF[:n], u_inv)
            self.HF = scvec.scale(self.HF[:n], u)
            ratio_G = ratio_H = one
        # segment bookkeeping: F stays 2-piece with breakpoint bp and
        # ratio rho; a fold multiplies piece A by beta_A^-1 and piece B by
        # beta_B^-1 (1 when not splitting), so
        #   bp <= n: bp' = bp,     rho' = rho * beta_A/beta_B
        #   bp >  n: bp' = bp - n, rho' = beta_A/beta_B
        if self.bp <= n:
            self.rho_G = self.rho_G * ratio_G
            self.rho_H = self.rho_H * ratio_H
        else:
            self.rho_G = ratio_G
            self.rho_H = ratio_H
            self.bp = self.bp - n
        if _TIMING:
            TIMER.add("ipp_host_folds", time.time() - t0)
            t0 = time.time()
        if self.frozen:
            # frozen tail: the fold is absorbed into the factor vectors
            self.FFG = frozen_fold_update(self.FFG, n, rbp, cG[0], cG[1])
            self.FFH = frozen_fold_update(self.FFH, n, rbp, cH[0], cH[1])
            if _TIMING:
                TIMER.add("ipp_host_folds", time.time() - t0)
            return
        if (self.G_big is None and self.G is not None
                and n <= FROZEN_MAX_SIDE // 2):
            # both sides (size 2n) fit half a chunk: freeze pre-fold and
            # absorb THIS round's fold into the fresh factor vectors —
            # every remaining round is one pair dispatch, no device folds
            self._freeze(self.G[0], self.H[0], 2 * n)
            self.FFG = frozen_fold_update(self.FFG, n, rbp, cG[0], cG[1])
            self.FFH = frozen_fold_update(self.FFH, n, rbp, cH[0], cH[1])
            self.G = self.H = None
            if _TIMING:
                TIMER.add("fold_dispatch", time.time() - t0)
            return
        if n >= CHUNK and self.C_big is not None:
            # combined fold: ONE dispatch halves both sides in place, then
            # one full-table prepass for the next round's walks
            k = n // CHUNK
            if use_w3h:
                self.C_big = ck.fold_big_w3h_comb(
                    self.C_big, k, rbp, sGA, sGB, sHA, sHB
                )
            else:
                self.C_big = ck.fold_big_c_comb(self.C_big, k, rbp, cG, cH)
            if k >= 2:
                half = _TBLTIER and 2 * k <= ck.HALF_CHUNKS
                old = self.tC if self._tC_half == half else None
                self.tC = ck.table_big(self.C_big, 2 * k, half=half, old=old)
                self._tC_half = half
            else:
                # sides are single chunks now: drop to the tail path
                self.G = [ck.big_chunk(self.C_big, 0)]
                self.H = [ck.big_chunk(self.C_big, 1)]
                self.C_big = self.tC = None
        elif n >= CHUNK and self.G_big is not None:
            k = n // CHUNK
            if _WINMSM and n >= 2 * CHUNK:
                # round 1 -> combined layout: fold each side into a fresh
                # capacity array, combine to [G'(k) | H'(k)], prepass ONE
                # full-capacity table over both sides
                if use_w3h:
                    gA = ck.fold_big_w3h(self.G_big, k, rbp, sGA, sGB)
                    gB = ck.fold_big_w3h(self.H_big, k, rbp, sHA, sHB)
                else:
                    gA = ck.fold_big_c(
                        self.G_big, k, rbp, cG[0], cG[1], donate=False
                    )
                    gB = ck.fold_big_c(
                        self.H_big, k, rbp, cH[0], cH[1], donate=False
                    )
                self.C_big = ck.combine_big(gA, gB, k)
                self.G_big = self.H_big = None
                self.tG = self.tH = None
                half1 = _TBLTIER and 2 * k <= ck.HALF_CHUNKS
                self.tC = ck.table_big(self.C_big, 2 * k, half=half1)
                self._tC_half = half1
            else:
                self.G_big = ck.fold_big_c(
                    self.G_big, k, rbp, cG[0], cG[1], donate=self._owns_big
                )
                self.H_big = ck.fold_big_c(
                    self.H_big, k, rbp, cH[0], cH[1], donate=self._owns_big
                )
                self._owns_big = True
        elif n >= CHUNK:
            # chunk-list path (circuits beyond the grid capacity): dual
            # bit-serial fold with ones on the left, c_i on the right
            k = n // CHUNK
            wl = [ck.const_words(one, CHUNK)] * k
            wgr = ck.words_chunks(_pw_rows(cG[0], cG[1], rbp, n), k)
            whr = ck.words_chunks(_pw_rows(cH[0], cH[1], rbp, n), k)
            self.G = ck.fold_chunks(self.G[: 2 * k], wl, wgr)
            self.H = ck.fold_chunks(self.H[: 2 * k], wl, whr)
        else:
            ones = _ones_rows(n)
            self.G = [
                ck.tail_fold(self.G[0], n, ones,
                             _pw_rows(cG[0], cG[1], rbp, n))
            ]
            self.H = [
                ck.tail_fold(self.H[0], n, ones,
                             _pw_rows(cH[0], cH[1], rbp, n))
            ]
        if _TIMING:
            TIMER.add("fold_dispatch", time.time() - t0)

    def result(self) -> InnerProductProof:
        return InnerProductProof(
            self.L_vec, self.R_vec,
            scvec.row_to_scalar(self.a[0]), scvec.row_to_scalar(self.b[0]),
        )
