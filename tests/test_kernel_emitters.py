"""CPU correctness for the Pallas kernel EMITTERS (ladder math).

The kernels only dispatch on TPU, but their bodies are plain jnp emitters
over stacked (23, SUB, LAN) limb arrays — so the group-law and ladder MATH
(w4 signed-nibble MSM ladder, w2 dual fold ladder, digit selects, block
layout) runs anywhere.  These tests drive the emitters directly at a tiny
lane count against the host ristretto oracle, so a bad digit decode or
table select fails the fast suite instead of a TPU bench run.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bulletproofs_r1cs_gadgets_tpu.core.ristretto import RistrettoPoint
from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc
from bulletproofs_r1cs_gadgets_tpu.ops.field import STORE, limbs_to_int
from bulletproofs_r1cs_gadgets_tpu.utils.constants import L, P

rnd = random.Random(11)

LAN = 8  # tiny lane count: emitters are shape-generic outside pallas_call
N = pc.SUB * LAN  # 64 points


def _rand_points(n):
    B = RistrettoPoint.basepoint()
    return [B.scalar_mul(Scalar(rnd.randrange(1, L))) for _ in range(n)]


def _to_stacked(points):
    """points -> tuple of 4 stacked (STORE, SUB, LAN) coord arrays (the
    shape _load_point yields inside the kernels)."""
    from bulletproofs_r1cs_gadgets_tpu.ops.curve import _ints_to_limbs_vec

    coords = []
    for pt in points:
        coords.extend((pt.X, pt.Y, pt.Z, pt.T))
    limbs = _ints_to_limbs_vec(coords).reshape(len(points), 4, STORE)
    flat = np.ascontiguousarray(limbs.reshape(len(points), pc.ROWS).T)
    arr = jnp.asarray(flat.reshape(pc.ROWS, pc.SUB, LAN))
    return tuple(arr[c * STORE : (c + 1) * STORE] for c in range(4))


def _from_stacked(p):
    """Inverse of _to_stacked: emitter output -> list of RistrettoPoint."""
    rows = np.asarray(jnp.concatenate(p, axis=0)).reshape(pc.ROWS, N)
    out = []
    for i in range(N):
        c = rows[:, i].reshape(4, STORE)
        out.append(
            RistrettoPoint(
                limbs_to_int(c[0]) % P,
                limbs_to_int(c[1]) % P,
                limbs_to_int(c[2]) % P,
                limbs_to_int(c[3]) % P,
            )
        )
    return out


def _words(scalars, encoder):
    rows = np.concatenate([scvec.scalar_to_row(s)[None] for s in scalars])
    w = encoder(rows)  # (N, 8) int32
    return jnp.asarray(np.ascontiguousarray(w.T).reshape(8, pc.SUB, LAN))


def test_emit_group_ops_match_host():
    ps, qs = _rand_points(N), _rand_points(N)
    dp, dq = _to_stacked(ps), _to_stacked(qs)
    got = _from_stacked(jax.jit(pc.emit_point_add)(dp, dq))
    assert all(g == p + q for g, p, q in zip(got, ps, qs))
    got = _from_stacked(jax.jit(pc.emit_point_double)(dp))
    assert all(g == p.double() for g, p in zip(got, ps))


def test_emit_add_niels_matches_host():
    """Niels-form mixed add (the window walker's streamed-table add):
    p + to_niels(q) == p + q, and the select-style negation
    (swap, -2dT) yields p - q."""
    ps, qs = _rand_points(N), _rand_points(N)
    dp, dq = _to_stacked(ps), _to_stacked(qs)
    fn = jax.jit(lambda a, b: pc.emit_point_add_niels(a, pc._to_niels(b)))
    got = _from_stacked(fn(dp, dq))
    assert all(g == p + q for g, p, q in zip(got, ps, qs))

    def neg_add(a, b):
        n = pc._to_niels(b)
        return pc.emit_point_add_niels(a, (n[1], n[0], -n[2], n[3]))

    got = _from_stacked(jax.jit(neg_add)(dp, dq))
    neg_one = Scalar(L - 1)
    assert all(
        g == p + q.scalar_mul(neg_one) for g, p, q in zip(got, ps, qs)
    )


@pytest.mark.slow
def test_ladder_w4_per_lane():
    """_ladder_w4 (no reduce): lane i ends at scalar_i * P_i."""
    ps = _rand_points(N)
    ks = [Scalar(rnd.randrange(L)) for _ in range(N)]
    ks[0], ks[1] = Scalar(0), Scalar(1)
    words = _words(ks, ck.signed_digit_words)
    fn = jax.jit(lambda p, w: pc._ladder_w4(p, w, False))
    got = _from_stacked(fn(_to_stacked(ps), words))
    assert all(g == p.scalar_mul(k) for g, p, k in zip(got, ps, ks))


@pytest.mark.slow
def test_emit_fold_w2_per_lane():
    """_emit_fold_w2: lane i ends at wl_i * L_i + wr_i * R_i — the IPP
    generator fold math behind fold_grid (w2 signed-digit encoding)."""
    ls, rs = _rand_points(N), _rand_points(N)
    wl = [Scalar(rnd.randrange(L)) for _ in range(N)]
    wr = [Scalar(rnd.randrange(L)) for _ in range(N)]
    wl[0], wr[0] = Scalar(0), Scalar(0)
    wl[1], wr[1] = Scalar(1), Scalar(L - 1)
    wwl = _words(wl, ck.signed_digit2_words)
    wwr = _words(wr, ck.signed_digit2_words)
    fn = jax.jit(pc._emit_fold_w2)
    got = _from_stacked(fn(_to_stacked(ls), _to_stacked(rs), wwl, wwr))
    exp = [
        l.scalar_mul(a) + r.scalar_mul(b)
        for l, r, a, b in zip(ls, rs, wl, wr)
    ]
    assert all(g == e for g, e in zip(got, exp))


@pytest.mark.slow
def test_fold_c_body_per_lane():
    """The constant-scalar fold kernel body (pallas_curve._fold_c_kernel):
    lane i ends at L_i + c_i * R_i, with the piecewise-c digits built by
    chunks._c_fold_words semantics (cA below the breakpoint, cB beyond).
    The ladder is _ladder_w4 (also covered by test_ladder_w4_per_lane);
    this pins the fold composition."""
    ls, rs = _rand_points(N), _rand_points(N)
    cA, cB = Scalar(rnd.randrange(L)), Scalar(rnd.randrange(L))
    for bp in (23, 0, N):
        cs = [cA if i < bp else cB for i in range(N)]
        words = _words(cs, ck.signed_digit_words)
        fn = jax.jit(
            lambda l, r, w: pc.emit_point_add(pc._ladder_w4(r, w, False), l)
        )
        got = _from_stacked(fn(_to_stacked(ls), _to_stacked(rs), words))
        exp = [l + r.scalar_mul(c) for l, r, c in zip(ls, rs, cs)]
        assert got == exp, bp


@pytest.mark.slow
def test_emit_fold_w3h_per_lane():
    """_emit_fold_w3h: lane i ends at wl_i * L_i + wr_i * R_i for SIGNED
    half-width scalars (44 w3 digits) — the half-width dual fold behind
    fold_grid_w3h(_comb)."""
    ls, rs = _rand_points(N), _rand_points(N)
    xs = [rnd.randrange(-(1 << 126), 1 << 126) for _ in range(N)]
    ys = [rnd.randrange(-(1 << 126), 1 << 126) for _ in range(N)]
    xs[0], ys[0] = 0, 0
    xs[1], ys[1] = 1, -1

    def _w3words(vals):
        w = np.stack([ck.w3h_digit_words(v) for v in vals])  # (N, 8)
        return jnp.asarray(np.ascontiguousarray(w.T).reshape(8, pc.SUB, LAN))

    fn = jax.jit(pc._emit_fold_w3h)
    got = _from_stacked(
        fn(_to_stacked(ls), _to_stacked(rs), _w3words(xs), _w3words(ys))
    )
    exp = [
        l.scalar_mul(Scalar(x % L)) + r.scalar_mul(Scalar(y % L))
        for l, r, x, y in zip(ls, rs, xs, ys)
    ]
    assert all(g == e for g, e in zip(got, exp))


def test_c_fold_words_layout():
    """_c_fold_words equals the generic grid_words(w4) encode of the
    materialised piecewise rows (fast path correctness incl. the
    chunk-major transpose)."""
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import _pw_rows

    cA, cB = Scalar(12345), Scalar(L - 7)
    k = 3
    for bp in (0, 100, ck.CHUNK + 17, k * ck.CHUNK):
        fast = np.asarray(ck._c_fold_words(cA, cB, bp, k))
        slow = np.asarray(
            ck.grid_words(_pw_rows(cA, cB, bp, k * ck.CHUNK), k, encode="w4")
        )
        assert np.array_equal(fast, slow), bp


def test_signed_digit2_words_decode():
    """w2 encoding decodes back: digit i holds (d_i & 3) with
    d_i in [-2, 1] and sum d_i 4^i == scalar."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 2**63, size=(32, 4), dtype=np.uint64)
    arr[:, 3] &= (1 << 49) - 1
    arr[0] = 0
    arr[1] = (1, 0, 0, 0)
    w = ck.signed_digit2_words(arr).view(np.uint32)
    for row, wrow in zip(arr, w):
        scalar = sum(int(v) << (64 * i) for i, v in enumerate(row))
        total = 0
        for j in range(8):
            word = int(wrow[j])
            for t in range(16):
                e = (word >> (2 * t)) & 3
                d = e - 4 if e >= 2 else e
                total += d << (2 * (16 * j + t))
        assert total == scalar
