"""Frozen-tail IPP math vs the host inner-product argument.

The device backend's late IPP rounds run in "frozen-tail" mode
(ops/pallas_backend.py): generators pinned at side size S, skipped folds
absorbed into per-index factor vectors (``frozen_fold_update``), each
round's L/R expressed over the fixed [G|H] packing with composite
scalars (``frozen_walk_rows``; Q terms on host).  These tests drive those helpers through
a host-point simulation of the device job (same factor-tracking scheme
as ``_IppJob``) and assert byte equality of every L/R point and the
final a/b against the reference host ``InnerProductProof.create`` — the
frozen path must be mathematically invisible.
"""

import numpy as np

from bulletproofs_r1cs_gadgets_tpu.core.ipp import InnerProductProof
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import (
    RistrettoPoint,
    multiscalar_mul,
)
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.core.transcript import Transcript
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import (
    _ratio_pieces,
    frozen_fold_update,
    frozen_walk_rows,
)
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L as LMOD


def _rand_points(rng, n):
    base = RistrettoPoint.basepoint()
    return [base.scalar_mul(Scalar(rng.randrange(LMOD))) for i in range(n)]


def _sim_device_ipp(
    transcript, Q, G, H, GF_list, HF_list, a_list, b_list,
    n1, u_phi, y_inv, freeze_side, halfwidth=False,
):
    """Host-point mirror of ``_IppJob``: factor-tracked walks and constant
    folds, entering frozen-tail mode once both sides fit ``freeze_side``.
    With ``halfwidth`` the non-frozen folds split each constant via
    half_gcd_split and fold D' = beta*D_L + alpha*D_R, absorbing beta^-1
    into the factor vectors (the rho/bp bookkeeping under test)."""
    from bulletproofs_r1cs_gadgets_tpu.ops.chunks import half_gcd_split
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import _pw_rows

    n = len(G)
    transcript.innerproduct_domain_sep(n)
    D_G, D_H = list(G), list(H)
    GFa = scvec.from_scalars(GF_list)
    HFa = scvec.from_scalars(HF_list)
    aa = scvec.from_scalars(a_list)
    bb = scvec.from_scalars(b_list)
    bp = min(n1, n)
    rho_G = rho_H = u_phi
    one = Scalar.one()
    fz_pts = None
    FFG = FFH = None
    S = 0
    if n <= freeze_side:  # init-freeze (small proofs)
        S = n
        fz_pts = D_G + D_H
        ones = np.tile(scvec.scalar_to_row(one), (S, 1)).astype(np.uint64)
        FFG, FFH = ones.copy(), ones.copy()
    L_vec, R_vec = [], []
    while n > 1:
        n //= 2
        a_L, a_R = aa[:n], aa[n:]
        b_L, b_R = bb[:n], bb[n:]
        c_L = scvec.inner(a_L, b_R)
        c_R = scvec.inner(a_R, b_L)
        scG_L = scvec.mul(a_L, GFa[n : 2 * n])
        scH_L = scvec.mul(b_R, HFa[:n])
        scG_R = scvec.mul(a_R, GFa[:n])
        scH_R = scvec.mul(b_L, HFa[n : 2 * n])
        if fz_pts is not None:
            # Q terms on host, mirroring the production _host_q pattern
            rowsL, rowsR = frozen_walk_rows(
                S, n, scG_L, scH_L, scG_R, scH_R, FFG, FFH
            )
            L = multiscalar_mul(scvec.to_scalars(rowsL), fz_pts) \
                + Q.scalar_mul(c_L)
            R = multiscalar_mul(scvec.to_scalars(rowsR), fz_pts) \
                + Q.scalar_mul(c_R)
        else:
            L = multiscalar_mul(
                scvec.to_scalars(scG_L) + scvec.to_scalars(scH_L) + [c_L],
                D_G[n : 2 * n] + D_H[:n] + [Q],
            )
            R = multiscalar_mul(
                scvec.to_scalars(scG_R) + scvec.to_scalars(scH_R) + [c_R],
                D_G[:n] + D_H[n : 2 * n] + [Q],
            )
        L_c, R_c = L.compress(), R.compress()
        L_vec.append(L_c)
        R_vec.append(R_c)
        transcript.append_point(b"L", L_c)
        transcript.append_point(b"R", R_c)
        u = transcript.challenge_scalar(b"u")
        u_inv = u.invert()
        aa = scvec.axpby(a_L, u, a_R, u_inv)
        bb = scvec.axpby(b_L, u_inv, b_R, u)
        powA, powB, rbp = _ratio_pieces(bp, n)
        u2 = u * u
        hfac = u_inv * u_inv * Scalar(pow(y_inv.v, n, LMOD))
        cG = (
            u2 * (rho_G if powA else one),
            u2 * (rho_G if powB else one),
        )
        cH = (
            hfac * (rho_H if powA else one),
            hfac * (rho_H if powB else one),
        )
        freezing = fz_pts is None and 2 * n <= freeze_side
        use_hw = halfwidth and fz_pts is None and not freezing
        if use_hw:
            sGA = half_gcd_split(cG[0].v, LMOD)
            sGB = half_gcd_split(cG[1].v, LMOD)
            sHA = half_gcd_split(cH[0].v, LMOD)
            sHB = half_gcd_split(cH[1].v, LMOD)
            bGAi = Scalar(sGA[1] % LMOD).invert()
            bGBi = Scalar(sGB[1] % LMOD).invert()
            bHAi = Scalar(sHA[1] % LMOD).invert()
            bHBi = Scalar(sHB[1] % LMOD).invert()
            GFa = scvec.mul(
                GFa[:n], _pw_rows(u_inv * bGAi, u_inv * bGBi, rbp, n)
            )
            HFa = scvec.mul(
                HFa[:n], _pw_rows(u * bHAi, u * bHBi, rbp, n)
            )
            ratio_G = Scalar(sGA[1] % LMOD) * bGBi
            ratio_H = Scalar(sHA[1] % LMOD) * bHBi
        else:
            GFa = scvec.scale(GFa[:n], u_inv)
            HFa = scvec.scale(HFa[:n], u)
            ratio_G = ratio_H = one
        if bp <= n:
            rho_G = rho_G * ratio_G
            rho_H = rho_H * ratio_H
        else:
            rho_G, rho_H = ratio_G, ratio_H
            bp = bp - n
        if fz_pts is not None:
            FFG = frozen_fold_update(FFG, n, rbp, cG[0], cG[1])
            FFH = frozen_fold_update(FFH, n, rbp, cH[0], cH[1])
        elif freezing:
            # transition freeze: pin the size-2n vectors, absorb THIS
            # round's fold into fresh factor vectors
            S = 2 * n
            fz_pts = D_G + D_H
            ones = np.tile(
                scvec.scalar_to_row(one), (S, 1)
            ).astype(np.uint64)
            FFG = frozen_fold_update(ones.copy(), n, rbp, cG[0], cG[1])
            FFH = frozen_fold_update(ones.copy(), n, rbp, cH[0], cH[1])
        elif use_hw:
            D_G = [
                D_G[i].scalar_mul(
                    Scalar((sGA if i < rbp else sGB)[1] % LMOD)
                )
                + D_G[i + n].scalar_mul(
                    Scalar((sGA if i < rbp else sGB)[0] % LMOD)
                )
                for i in range(n)
            ]
            D_H = [
                D_H[i].scalar_mul(
                    Scalar((sHA if i < rbp else sHB)[1] % LMOD)
                )
                + D_H[i + n].scalar_mul(
                    Scalar((sHA if i < rbp else sHB)[0] % LMOD)
                )
                for i in range(n)
            ]
        else:
            D_G = [
                D_G[i] + D_G[i + n].scalar_mul(cG[0] if i < rbp else cG[1])
                for i in range(n)
            ]
            D_H = [
                D_H[i] + D_H[i + n].scalar_mul(cH[0] if i < rbp else cH[1])
                for i in range(n)
            ]
    return InnerProductProof(
        L_vec, R_vec, scvec.row_to_scalar(aa[0]), scvec.row_to_scalar(bb[0])
    )


def _reference_and_sim(padded_n, n1, freeze_side, seed, halfwidth=False):
    import random

    rng = random.Random(seed)
    G = _rand_points(rng, padded_n)
    H = _rand_points(rng, padded_n)
    Q = RistrettoPoint.basepoint().scalar_mul(Scalar(rng.randrange(LMOD)))
    u_phi = Scalar(rng.randrange(LMOD))
    y_inv = Scalar(rng.randrange(LMOD))
    GF = [Scalar.one()] * n1 + [u_phi] * (padded_n - n1)
    HF = [
        Scalar(pow(y_inv.v, i, LMOD)) * GF[i] for i in range(padded_n)
    ]
    a = [Scalar(rng.randrange(LMOD)) for _ in range(padded_n)]
    b = [Scalar(rng.randrange(LMOD)) for _ in range(padded_n)]

    ref = InnerProductProof.create(
        Transcript(b"FrozenTailTest"), Q, GF, HF, G, H, list(a), list(b)
    )
    sim = _sim_device_ipp(
        Transcript(b"FrozenTailTest"), Q, G, H, GF, HF, a, b,
        n1, u_phi, y_inv, freeze_side, halfwidth=halfwidth,
    )
    return ref, sim


def _assert_equal(ref, sim):
    assert sim.L_vec == ref.L_vec
    assert sim.R_vec == ref.R_vec
    assert sim.a == ref.a and sim.b == ref.b


def test_frozen_tail_transition_matches_host_ipp():
    """padded_n=64, freeze once sides reach 16: covers big-round constant
    folds, the pre-fold freeze transition, and four frozen rounds."""
    ref, sim = _reference_and_sim(64, 23, 16, seed=1)
    _assert_equal(ref, sim)


def test_frozen_tail_init_freeze_matches_host_ipp():
    """padded_n=32 frozen from round 1 (the small-proof path)."""
    ref, sim = _reference_and_sim(32, 32, 32, seed=2)
    _assert_equal(ref, sim)


def test_frozen_tail_breakpoint_straddles_rounds():
    """n1 NOT a power-of-two multiple: the piecewise fold breakpoint stays
    inside the frozen region for several rounds."""
    ref, sim = _reference_and_sim(64, 5, 32, seed=3)
    _assert_equal(ref, sim)


def test_halfwidth_folds_match_host_ipp():
    """Half-width beta-folds (all non-frozen rounds): beta^-1 absorbed
    into the factor vectors, rho/bp bookkeeping evolving — L/R bytes must
    equal the host IPP's.  n1=48 > m exercises the bp > n migration."""
    ref, sim = _reference_and_sim(64, 48, 0, seed=4, halfwidth=True)
    _assert_equal(ref, sim)


def test_halfwidth_folds_then_freeze():
    """Half-width folds composing with a late transition freeze: the
    frozen factor updates must pick up the evolved rho pieces."""
    ref, sim = _reference_and_sim(64, 23, 8, seed=5, halfwidth=True)
    _assert_equal(ref, sim)
    ref, sim = _reference_and_sim(128, 96, 16, seed=6, halfwidth=True)
    _assert_equal(ref, sim)
