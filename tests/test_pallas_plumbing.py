"""CPU coverage for the PallasBackend HOST plumbing (VERDICT r1 item 10).

The Pallas kernels themselves are TPU-only, but every host-side branch
around them — chunk/word encoding, grid capacity arrays, IPP round
scheduling, tail transitions, batch fusion, the verifier mega-MSM prep —
is plain Python/numpy/jax and must not wait for a TPU run to fail (a
round-2 bench run died on ``const_grid_words(Scalar)`` — a pure host type
bug this file would have caught).

Strategy: monkeypatch the four ``pallas_call`` entry points with
shape-correct pass-throughs and ``fetch_points`` with a fixed-point
source, then drive REAL prove/verify flows through ``PallasBackend`` at a
size large enough (padded_n = 8192, k0 = 4 chunks) to hit every branch:
grid MSMs with and without chunk offsets, the factor fold, the constant
fold (``const_grid_words``), the big->chunk tail transition, sub-chunk
tail rounds, and the batch entry points.  Proof bytes are garbage (the
kernels are fakes) — these tests assert the plumbing runs and produces
well-formed objects, not soundness (the TPU e2e covers that).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bulletproofs_r1cs_gadgets_tpu import (
    BulletproofGens,
    PedersenGens,
    Prover,
    Scalar,
    Transcript,
    Verifier,
)
from bulletproofs_r1cs_gadgets_tpu.core import scvec
from bulletproofs_r1cs_gadgets_tpu.core.errors import VerificationError
from bulletproofs_r1cs_gadgets_tpu.core.ristretto import RistrettoPoint
from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend


@pytest.fixture(params=[True, False], ids=["winmsm", "ladder"])
def fake_kernels(monkeypatch, request):
    """Replace the TPU pallas kernels with shape-correct fakes and count
    calls per entry point; fetch_points returns base-point copies so
    transcript appends and compressions stay on real group elements.
    Parametrised over both MSM paths: the window-accumulator walker
    (default) and the per-lane ladder grid (BPTPU_WINMSM=0)."""
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pbm

    monkeypatch.setattr(pbm, "_WINMSM", request.param)
    calls = {
        "msm_chunk": 0, "fold_chunk": 0, "msm_grid": 0, "fold_grid": 0,
        "fold_grid_c": 0, "fold_grid_c_donate": 0, "fold_grid_c_comb": 0,
        "fold_grid_w3h": 0, "fold_grid_w3h_comb": 0, "msm_grid_pair": 0,
        "table_big": 0, "table_big5": 0, "msm_win": 0, "msm_win5": 0,
        "msm_win_pair": 0, "msm_lane": 0,
        "winmsm": request.param,
    }

    import jax

    def table_big(points_big, valid, half=False, old=None):
        calls["table_big"] += 1
        assert points_big.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
        tc = pc.GRID_CHUNKS // 2 if half else pc.GRID_CHUNKS
        assert 1 <= valid <= tc
        if old is not None:
            assert old.shape[-1] == pc.TBL * tc * pc.LAN_BLOCK
        # shape-only stand-in: a real full table is 768 MB
        return jax.ShapeDtypeStruct(
            (pc.ROWS, pc.SUB, pc.TBL * tc * pc.LAN_BLOCK), jnp.int32
        )

    def msm_win_dyn(table, words, chain, info, v):
        calls["msm_win"] += 1
        tc = table.shape[-1] // (pc.TBL * pc.LAN_BLOCK)
        assert tc in (pc.GRID_CHUNKS, pc.GRID_CHUNKS // 2)
        assert words.shape == (8, pc.SUB, pc.GRID_LANES)
        assert chain.shape == (pc.ROWS, pc.SUB, pc.LAN_BLOCK)
        iv, poff, woff, split, poff2 = (int(x) for x in info)
        assert iv == v and 1 <= v
        # two-segment wrap-around contract: steps [0, split) at poff,
        # steps [split, v) at poff2 (degenerate calls set split=v)
        assert 1 <= split <= v
        assert 0 <= poff and poff + split <= tc
        assert 0 <= poff2 and poff2 + (v - split) <= tc
        assert 0 <= woff and woff + v <= pc.GRID_CHUNKS
        return chain

    def table_big5(points_big, valid):
        calls["table_big5"] += 1
        assert points_big.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
        assert 1 <= valid <= pc.GRID_CHUNKS
        return jax.ShapeDtypeStruct(
            (pc.ROWS, pc.SUB, pc.TBL5 * pc.GRID_CHUNKS * pc.LAN_BLOCK),
            jnp.int32,
        )

    def msm_win5_dyn(table, words, chain, info, v):
        calls["msm_win5"] += 1
        tc = table.shape[-1] // (pc.TBL5 * pc.LAN_BLOCK)
        assert tc == pc.GRID_CHUNKS  # w5 tables are shared/full only
        assert words.shape == (16, pc.SUB, pc.GRID_LANES)
        assert chain.shape == (pc.ROWS, pc.SUB, pc.LAN_BLOCK)
        iv, poff, woff, split, poff2 = (int(x) for x in info)
        assert iv == v and 1 <= v
        assert 1 <= split <= v
        assert 0 <= poff and poff + split <= tc
        assert 0 <= poff2 and poff2 + (v - split) <= tc
        assert 0 <= woff and woff + v <= pc.GRID_CHUNKS
        return chain

    monkeypatch.setattr(ck, "table_big", table_big)
    monkeypatch.setattr(ck, "table_big5", table_big5)
    monkeypatch.setattr(pc, "msm_win_dyn", msm_win_dyn)
    monkeypatch.setattr(pc, "msm_win5_dyn", msm_win5_dyn)

    def msm_chunk_acc_w4(points, words, acc):
        calls["msm_chunk"] += 1
        assert points.shape == (pc.ROWS, pc.SUB, pc.LAN_BLOCK)
        assert words.shape == (8, pc.SUB, pc.LAN_BLOCK)
        return acc

    def fold_chunk(left, right, wl, wr):
        calls["fold_chunk"] += 1
        assert left.shape == right.shape == (pc.ROWS, pc.SUB, pc.LAN_BLOCK)
        return left

    def msm_grid_acc(points, words, acc, info):
        calls["msm_grid"] += 1
        assert points.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
        assert words.shape == (8, pc.SUB, pc.GRID_LANES)
        v, off = int(info[0]), int(info[1])
        assert 1 <= v and 0 <= off and off + v <= pc.GRID_CHUNKS
        return acc

    def fold_grid(left_right, wl, wr, info):
        calls["fold_grid"] += 1
        assert left_right.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
        assert wl.shape == wr.shape == (8, pc.SUB, pc.GRID_LANES)
        assert 1 <= int(info[0]) <= pc.GRID_CHUNKS // 2
        return left_right

    def _fold_grid_c(name):
        def fake(left_right, words, info):
            calls[name] += 1
            assert left_right.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
            assert words.shape == (8, pc.SUB, pc.GRID_LANES)
            v = int(info[0])
            assert 1 <= v <= pc.GRID_CHUNKS // 2
            return left_right

        return fake

    def msm_grid_pair(points, words, acc2, info):
        calls["msm_grid_pair"] += 1
        assert points.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
        assert words.shape == (8, pc.SUB, pc.GRID_LANES)
        assert acc2.shape == (pc.ROWS, pc.SUB, 2 * pc.LAN_BLOCK)
        v, lo, hi = (int(x) for x in info)
        assert 1 <= v and 2 * v <= pc.GRID_CHUNKS
        assert 0 <= lo <= v and 0 <= hi <= v
        return acc2

    B = PedersenGens.default().B

    def fetch_points(accs):
        for a in accs:
            assert a.shape == (pc.ROWS, pc.SUB, pc.LAN_BLOCK)
        return [B] * len(accs)

    monkeypatch.setattr(pc, "msm_chunk_acc_w4", msm_chunk_acc_w4)
    monkeypatch.setattr(pc, "fold_chunk", fold_chunk)
    monkeypatch.setattr(pc, "msm_grid_acc", msm_grid_acc)
    monkeypatch.setattr(pc, "fold_grid", fold_grid)
    monkeypatch.setattr(pc, "fold_grid_c", _fold_grid_c("fold_grid_c"))
    monkeypatch.setattr(
        pc, "fold_grid_c_donate", _fold_grid_c("fold_grid_c_donate")
    )
    monkeypatch.setattr(
        pc, "fold_grid_c_comb", _fold_grid_c("fold_grid_c_comb")
    )

    def _fold_w3h(name):
        def fake(left_right, wl, wr, info):
            calls[name] += 1
            assert left_right.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
            assert wl.shape == wr.shape == (8, pc.SUB, pc.GRID_LANES)
            assert 1 <= int(info[0]) <= pc.GRID_CHUNKS // 2
            return left_right

        return fake

    monkeypatch.setattr(pc, "fold_grid_w3h", _fold_w3h("fold_grid_w3h"))
    monkeypatch.setattr(
        pc, "fold_grid_w3h_comb", _fold_w3h("fold_grid_w3h_comb")
    )
    def msm_lane_dyn(points, words, info, v):
        # flotilla frozen rounds (default path since BPTPU_FLOTILLA=1):
        # per-lane totals over 2B packed chunks in one dispatch
        calls["msm_lane"] += 1
        assert points.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
        assert words.shape == (8, pc.SUB, pc.GRID_LANES)
        assert 1 <= int(info[0]) <= pc.GRID_CHUNKS
        return jnp.asarray(ck._IDENT_CHUNK_NP)

    def msm_win_pair_dyn(table, words, chain2, info, v):
        calls["msm_win_pair"] += 1
        tc = table.shape[-1] // (pc.TBL * pc.LAN_BLOCK)
        assert tc in (pc.GRID_CHUNKS, pc.GRID_CHUNKS // 2)
        assert words.shape == (8, pc.SUB, pc.GRID_LANES)
        assert chain2.shape == (pc.ROWS, pc.SUB, 2 * pc.LAN_BLOCK)
        iv, k = int(info[0]), int(info[1])
        assert iv == v == 2 * k and 4 * k <= tc
        return chain2

    monkeypatch.setattr(pc, "msm_grid_pair", msm_grid_pair)
    monkeypatch.setattr(pc, "msm_win_pair_dyn", msm_win_pair_dyn)
    monkeypatch.setattr(pc, "msm_lane_dyn", msm_lane_dyn)
    monkeypatch.setattr(ck, "fetch_points", fetch_points)
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pb

    monkeypatch.setattr(pb.ck, "fetch_points", fetch_points)
    return calls


@pytest.fixture(scope="module")
def gens():
    return PedersenGens.default(), BulletproofGens(8192)


def _build(cs, vals, n_mult):
    """n_mult trivial multipliers over two committed values."""
    a, b = vals
    _, _, o = cs.multiply(a + b, a - b)
    for _ in range(n_mult - 1):
        cs.multiply(o + Scalar(1), o + Scalar(2))


def _prove(gens, backend, n_mult=4097):
    pc_gens, bp_gens = gens
    prover = Prover(pc_gens, Transcript(b"plumb"))
    com, v = prover.commit(Scalar(5), Scalar(7))
    com2, v2 = prover.commit(Scalar(3), Scalar(11))
    _build(prover, (v, v2), n_mult)
    assert prover.num_multipliers() == n_mult
    return com, com2, prover.prove(bp_gens, backend=backend)


def test_prover_grid_branches(fake_kernels, gens):
    """padded_n = 8192 drives: grid phase-1 MSMs, IPP rounds at k=2 and
    k=1 (factor fold then CONSTANT fold), big->chunk tail transition, and
    sub-chunk tail rounds — every _IppJob branch."""
    _, _, proof = _prove(gens, PallasBackend())
    blob = proof.to_bytes()
    assert len(blob) > 0
    # frozen tail (S=1024): padded 8192 freezes after the m=512 round ->
    # rounds m=256..1 are 9 single pair dispatches (no folds; Q on host)
    if fake_kernels["winmsm"]:
        # shared-table walks ride the w5 walker (BPTPU_W5 default on)
        assert fake_kernels["msm_win5"] >= 9  # 5 phase-1 + 4 IPP walks
        assert fake_kernels["table_big5"] >= 2  # shared gens tables (G, H)
        assert fake_kernels["table_big"] >= 1  # per-job combined prepass
        assert fake_kernels["msm_grid"] == 0
        assert fake_kernels["msm_grid_pair"] == 9  # frozen rounds only
    else:
        assert fake_kernels["msm_grid"] >= 5  # phase-1 commitment walks
        # 2 grid rnds x (G, H) walks + 9 frozen-tail rounds
        assert fake_kernels["msm_grid_pair"] >= 12
        assert fake_kernels["msm_win"] == 0
    # winmsm: round 1 transitions to the combined G|H layout with
    # half-width dual-ladder folds (2 separate-sides + 1 combined); the
    # ladder path keeps full-width folds (round 1 shared-cache, round 2+
    # donated in place)
    if fake_kernels["winmsm"]:
        assert fake_kernels["fold_grid_w3h"] == 2
        assert fake_kernels["fold_grid_w3h_comb"] == 1
        assert fake_kernels["fold_grid_c"] == 0
        assert fake_kernels["fold_grid_c_donate"] == 0
    else:
        assert fake_kernels["fold_grid_c"] >= 2
        assert fake_kernels["fold_grid_c_donate"] >= 2
    # packed tail rounds only (m=1024, 512; m<=256 frozen) — phase-1
    # blinding heads are HOST scalar_muls on the grid path (added
    # post-fetch), not device chains
    assert fake_kernels["msm_chunk"] == 4
    assert fake_kernels["fold_chunk"] >= 0


def test_prover_pairwalk(fake_kernels, gens, monkeypatch):
    """BPTPU_PAIRWALK=1: each combined round's L and R walks ride ONE
    msm_win_pair dispatch (dual accumulator halves) instead of two
    msm_win calls; all other plumbing is unchanged."""
    if not fake_kernels["winmsm"]:
        pytest.skip("pairwalk applies to the winmsm combined layout only")
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pb

    monkeypatch.setattr(pb, "_PAIRWALK", True)
    _, _, proof = _prove(gens, PallasBackend())
    assert len(proof.to_bytes()) > 0
    # padded 8192: one combined round (k=1) -> one pair dispatch; the
    # separate-tables round 1 and phase-1 walks stay single w5 walks
    assert fake_kernels["msm_win_pair"] == 1
    assert fake_kernels["msm_win5"] >= 9


def test_verifier_msm_gens_grid(fake_kernels, gens):
    """Verifier mega-MSM takes the grid path; with fake kernels the final
    identity check sees a non-identity point and must raise (never crash
    on host plumbing)."""
    pc_gens, bp_gens = gens
    com, com2, proof = _prove(gens, PallasBackend())
    verifier = Verifier(Transcript(b"plumb"))
    v = verifier.commit(com)
    v2 = verifier.commit(com2)
    _build(verifier, (v, v2), 4097)
    with pytest.raises(VerificationError):
        verifier.verify(proof, pc_gens, bp_gens, backend=PallasBackend())
    key = "msm_win5" if fake_kernels["winmsm"] else "msm_grid"
    assert fake_kernels[key] >= 2  # G and H segments


def test_batch_entry_points(fake_kernels, gens):
    """prove_provers drives phase_commitments_batch + ipp_create_batch in
    lockstep for B=2 without type or shape errors."""
    from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_provers

    pc_gens, bp_gens = gens
    provers = []
    for _ in range(2):
        p = Prover(pc_gens, Transcript(b"plumb"))
        _, v = p.commit(Scalar(5), Scalar(7))
        _, v2 = p.commit(Scalar(3), Scalar(11))
        _build(p, (v, v2), 4097)
        provers.append(p)
    proofs = prove_provers(provers, bp_gens, backend=PallasBackend())
    assert len(proofs) == 2 and all(len(p.to_bytes()) > 0 for p in proofs)


def test_chunks_helpers_accept_scalars():
    """Host-side encoders must accept Scalar objects (the type that the
    IPP hands them): regression for const_grid_words(int(Scalar))."""
    s = Scalar(12345)
    w = ck.const_grid_words(s)
    assert w.shape == (8, pc.SUB, pc.GRID_LANES)
    w1 = ck.single_scalar_words(s)
    assert w1.shape == (8, pc.SUB, pc.LAN_BLOCK)
    w2 = ck.const_words(s, 16)
    assert w2.shape == (8, pc.SUB, pc.LAN_BLOCK)


def test_grid_words_layout_roundtrip():
    """grid_words places chunk c of the scalar vector at lanes
    [256c, 256(c+1)) with the same in-chunk layout as words_chunks."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 2**63, size=(2 * ck.CHUNK, 4), dtype=np.uint64)
    arr[:, 3] &= (1 << 49) - 1
    big = np.asarray(ck.grid_words(arr, 2))
    blocks = ck.words_chunks(arr, 2, encode="w4")
    for c in range(2):
        lo, hi = c * pc.LAN_BLOCK, (c + 1) * pc.LAN_BLOCK
        assert np.array_equal(big[:, :, lo:hi], blocks[c])
    assert not big[:, :, 2 * pc.LAN_BLOCK :].any()


def test_signed_digit_words_decode():
    """The packed w4 encoding decodes back to the scalar: nibble i holds
    (d_i & 15) with d_i in [-8, 7] and sum d_i 16^i == scalar."""
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 2**63, size=(32, 4), dtype=np.uint64)
    arr[:, 3] &= (1 << 49) - 1
    arr[0] = 0
    arr[1] = (1, 0, 0, 0)
    w = ck.signed_digit_words(arr).view(np.uint32)
    for row, wrow in zip(arr, w):
        scalar = sum(int(v) << (64 * i) for i, v in enumerate(row))
        total = 0
        for j in range(8):
            word = int(wrow[j])
            for t in range(8):
                nib = (word >> (4 * t)) & 15
                d = nib - 16 if nib >= 8 else nib
                total += d << (4 * (8 * j + t))
        assert total == scalar


def test_flotilla_frozen_rounds(fake_kernels, gens, monkeypatch):
    """With BPTPU_FLOTILLA, a batch whose jobs are all frozen drives ONE
    msm_lane dispatch per round (shared pack) instead of B pair
    dispatches; proof flow completes and msm_grid_pair is never used."""
    from bulletproofs_r1cs_gadgets_tpu.parallel.batch import prove_provers
    from bulletproofs_r1cs_gadgets_tpu.ops import pallas_backend as pb

    lane_calls = []

    def msm_lane_dyn(points, words, info, v):
        lane_calls.append(int(info[0]))
        assert points.shape == (pc.ROWS, pc.SUB, pc.GRID_LANES)
        assert words.shape == (8, pc.SUB, pc.GRID_LANES)
        return jnp.asarray(ck._IDENT_CHUNK_NP)

    monkeypatch.setattr(pc, "msm_lane_dyn", msm_lane_dyn)
    monkeypatch.setattr(pb, "_FLOTILLA", True)

    pc_gens, bp_gens = gens
    provers = []
    for _ in range(3):
        p = Prover(pc_gens, Transcript(b"plumb"))
        _, v = p.commit(Scalar(5), Scalar(7))
        _, v2 = p.commit(Scalar(3), Scalar(11))
        _build(p, (v, v2), 300)  # padded 512 <= FROZEN_MAX_SIDE
        provers.append(p)
    before_pair = fake_kernels["msm_grid_pair"]
    proofs = prove_provers(provers, bp_gens, backend=PallasBackend())
    assert len(proofs) == 3
    # padded_n=512 -> 9 rounds, each ONE flotilla dispatch of 2B=6 chunks
    assert lane_calls == [6] * 9
    assert fake_kernels["msm_grid_pair"] == before_pair  # no per-job pairs


def test_flotilla_words_layout():
    """flotilla_words chunk 2j/2j+1 must equal the per-job
    frozen_pair_words chunks 0/1 (same w4 encode, same offsets)."""
    import numpy as np

    rng = np.random.RandomState(3)
    pairs = []
    for _ in range(2):
        rowsL = scvec.from_wide_bytes(rng.bytes(64 * 33))
        rowsR = scvec.from_wide_bytes(rng.bytes(64 * 33))
        pairs.append((rowsL, rowsR))
    flot = np.asarray(ck.flotilla_words(pairs))
    for j, (rowsL, rowsR) in enumerate(pairs):
        single = np.asarray(ck.frozen_pair_words(rowsL, rowsR))
        for c_off in (0, 1):
            a = flot[:, :, (2 * j + c_off) * pc.LAN_BLOCK
                     : (2 * j + c_off + 1) * pc.LAN_BLOCK]
            b = single[:, :, c_off * pc.LAN_BLOCK
                       : (c_off + 1) * pc.LAN_BLOCK]
            assert np.array_equal(a, b), (j, c_off)


def test_flotilla_pack_and_fetch_roundtrip():
    """flotilla_pack duplicates each packed chunk at 2j/2j+1, and
    fetch_lane_points decodes lattice positions of an msm_lane block."""
    import numpy as np

    from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar as Sc

    B = PedersenGens.default().B
    pts = [B.scalar_mul(Sc(i + 2)) for i in range(3)]
    chunks = ck.points_to_chunks(pts)  # 1 chunk, pts at lanes 0..2
    packed = ck.flotilla_pack([chunks[0], chunks[0]])
    arr = np.asarray(packed)
    for c in range(4):
        assert np.array_equal(
            arr[:, :, c * pc.LAN_BLOCK : (c + 1) * pc.LAN_BLOCK],
            np.asarray(chunks[0]),
        )
    # fetch: positions of the raw chunk decode to the original points
    # (lattice position j = sublane j//LAN, lane j%LAN — matches the
    # (ROWS, SUB, LAN) flattening of points_to_chunks)
    got = ck.fetch_lane_points(chunks[0], 3)
    assert got == pts


def test_evict_gens_clears_caches():
    """evict_gens drops every cached generator array/table (stale entries
    for dead gens objects pin ~0.9 GB device HBM each — bench calls this
    between stages that switch BulletproofGens)."""
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend

    be = PallasBackend()
    be._gens_cache[("x", "G", "big")] = ("sentinel", 1)
    be._point_chunk_cache[("t", b"p")] = "sentinel"
    be.evict_gens()
    assert be._gens_cache == {} and be._point_chunk_cache == {}
