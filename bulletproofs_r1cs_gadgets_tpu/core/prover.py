"""R1CS prover (the ``bulletproofs::r1cs::Prover`` equivalent).

Implements the dalek-bulletproofs "yoloproofs" constraint-system prover the
reference builds on (SURVEY.md S2b N5/N6, call stack CS-1), including the
fork-only surface used by the gadgets: ``evaluate_lc`` + ``allocate_single``
(``/root/reference/src/gadget_poseidon.rs:160-166``) and the
``num_constraints`` / ``num_multipliers`` counters
(``/root/reference/src/gadget_mimc.rs:138``).

Protocol (two-phase, Fiat-Shamir over Merlin):

1. per-commitment: ``V_j = v_j B + gamma_j B~``, transcript ``V``.
2. phase-1 vector commitments ``A_I1`` (a_L on G, a_R on H), ``A_O1`` (a_O on
   G), ``S1`` (blinding vectors), transcript ``A_I1, A_O1, S1``.
3. randomized-constraint phase (unused by the reference gadget zoo but
   supported): domain-sep ``r1cs-1phase``/``r1cs-2phase`` then ``A_I2, A_O2,
   S2`` (identity when unused).
4. challenges y, z; constraints flattened by powers of z into per-wire weight
   vectors wL, wR, wO, wV.
5. vector polynomials l(x), r(x) (degree 3) and t(x) = <l, r> (degree 6);
   commitments ``T_1, T_3..T_6``; challenges u, x; blinded evaluations
   ``t_x, t_x_blinding, e_blinding``; challenge w.
6. inner-product argument over 2 * padded_n folded generators.

The heavy vector math of steps 2, 5, 6 routes through an optional *device
backend* (TPU, :mod:`bulletproofs_r1cs_gadgets_tpu.ops.backend`); the host
path below is the exact reference implementation.
"""

from __future__ import annotations

import secrets

from .scalar import Scalar, exp_iter, inner_product
from .linear_combination import Variable, VarKind, LinearCombination, _coerce
from .ristretto import RistrettoPoint, multiscalar_mul
from .transcript import Transcript
from .pedersen import PedersenGens, BulletproofGens
from .ipp import InnerProductProof
from .proof import R1CSProof
from .errors import MissingAssignment, InvalidGeneratorsLength
from ..utils.stats import CircuitStats

_IDENTITY_BYTES = b"\x00" * 32


class _SystemRng:
    def bytes(self, n: int) -> bytes:
        return secrets.token_bytes(n)


class Prover:
    """Builds a constraint tape with witness assignments, then proves it."""

    def __init__(self, pc_gens: PedersenGens, transcript: Transcript, rng=None):
        self.pc_gens = pc_gens
        self.transcript = transcript
        transcript.r1cs_domain_sep()
        self.rng = rng if rng is not None else _SystemRng()
        # high-level witness
        self.v: list[Scalar] = []
        self.v_blinding: list[Scalar] = []
        # low-level witness (multiplier wires)
        self.a_L: list[Scalar] = []
        self.a_R: list[Scalar] = []
        self.a_O: list[Scalar] = []
        self.constraints: list[LinearCombination] = []
        self.pending_multiplier: int | None = None
        self.deferred_constraints = []  # callbacks for randomized phase
        self.num_phase1_multipliers = 0

    # ------------------------------------------------------------ commitments
    def commit(self, v: Scalar, v_blinding: Scalar):
        """Pedersen-commit a high-level witness value; returns
        (compressed commitment, Variable)."""
        i = len(self.v)
        self.v.append(v)
        self.v_blinding.append(v_blinding)
        V = self.pc_gens.commit(v, v_blinding).compress()
        self.transcript.append_point(b"V", V)
        return V, Variable.committed(i)

    # --------------------------------------------------- ConstraintSystem API
    def multiply(self, left, right):
        left = _coerce(left)
        right = _coerce(right)
        l = self.eval_lc(left)
        r = self.eval_lc(right)
        o = l * r
        i = len(self.a_L)
        self.a_L.append(l)
        self.a_R.append(r)
        self.a_O.append(o)
        l_var = Variable.mult_left(i)
        r_var = Variable.mult_right(i)
        o_var = Variable.mult_out(i)
        # constrain wires to the LCs
        self.constrain(left - l_var)
        self.constrain(right - r_var)
        return l_var, r_var, o_var

    def allocate(self, assignment: Scalar | None):
        if assignment is None:
            raise MissingAssignment("prover requires assignments")
        if self.pending_multiplier is None:
            i = len(self.a_L)
            self.pending_multiplier = i
            self.a_L.append(assignment)
            self.a_R.append(Scalar.zero())
            self.a_O.append(Scalar.zero())
            return Variable.mult_left(i)
        else:
            i = self.pending_multiplier
            self.pending_multiplier = None
            self.a_R[i] = assignment
            self.a_O[i] = self.a_L[i] * self.a_R[i]
            return Variable.mult_right(i)

    def allocate_single(self, assignment: Scalar | None):
        """Fork extension: like ``allocate`` but also reports the output wire
        when this call completes a multiplier
        (``gadget_poseidon.rs:165-166``)."""
        var = self.allocate(assignment)
        if var.kind == VarKind.MULT_RIGHT:
            return var, Variable.mult_out(var.index)
        return var, None

    def allocate_multiplier(self, assignment: tuple[Scalar, Scalar] | None):
        if assignment is None:
            raise MissingAssignment("prover requires assignments")
        l, r = assignment
        i = len(self.a_L)
        self.a_L.append(l)
        self.a_R.append(r)
        self.a_O.append(l * r)
        return (
            Variable.mult_left(i),
            Variable.mult_right(i),
            Variable.mult_out(i),
        )

    def constrain(self, lc) -> None:
        self.constraints.append(_coerce(lc))

    def evaluate_lc(self, lc) -> Scalar | None:
        """Fork extension: evaluate an LC against the current witness."""
        return self.eval_lc(_coerce(lc))

    def eval_lc(self, lc: LinearCombination) -> Scalar:
        acc = 0
        for var, coeff in lc.terms:
            if var.kind == VarKind.MULT_LEFT:
                acc += coeff.v * self.a_L[var.index].v
            elif var.kind == VarKind.MULT_RIGHT:
                acc += coeff.v * self.a_R[var.index].v
            elif var.kind == VarKind.MULT_OUT:
                acc += coeff.v * self.a_O[var.index].v
            elif var.kind == VarKind.COMMITTED:
                acc += coeff.v * self.v[var.index].v
            else:  # ONE
                acc += coeff.v
        return Scalar(acc)

    def specify_randomized_constraints(self, callback) -> None:
        self.deferred_constraints.append(callback)

    def num_constraints(self) -> int:
        return len(self.constraints)

    def num_multipliers(self) -> int:
        return len(self.a_L)

    def stats(self) -> CircuitStats:
        return CircuitStats(
            multipliers=len(self.a_L),
            constraints=len(self.constraints),
            commitments=len(self.v),
            phase1_multipliers=self.num_phase1_multipliers or len(self.a_L),
        )

    # ------------------------------------------------------- snapshot/restore
    def snapshot(self):
        """Capture the synthesized state (tape + transcript) so the same
        circuit can be proven repeatedly without re-synthesis - prove()
        consumes transcript state but never mutates the tape."""
        st = self.transcript.strobe
        return (
            bytes(st.state),
            st.pos,
            st.pos_begin,
            st.cur_flags,
            list(self.v),
            list(self.v_blinding),
            list(self.a_L),
            list(self.a_R),
            list(self.a_O),
            list(self.constraints),
            self.pending_multiplier,
        )

    def restore(self, snap) -> None:
        st = self.transcript.strobe
        (
            state, st.pos, st.pos_begin, st.cur_flags,
            self.v, self.v_blinding, self.a_L, self.a_R, self.a_O,
            self.constraints, self.pending_multiplier,
        ) = snap
        st.state = bytearray(state)
        self.deferred_constraints = []

    # ------------------------------------------------------------- challenges
    def _random_scalar(self) -> Scalar:
        return Scalar.from_bytes_mod_order_wide(self.rng.bytes(64))

    def _flattened_constraints(self, z: Scalar, n: int):
        # int accumulation with a single final reduction per wire (this loop
        # touches every constraint term; Scalar-object churn dominates it)
        from ..utils.constants import L as _L

        wL = [0] * n
        wR = [0] * n
        wO = [0] * n
        wV = [0] * len(self.v)
        exp_z = z.v
        zv = z.v
        for lc in self.constraints:
            for var, coeff in lc.terms:
                k = var.kind
                if k == VarKind.MULT_LEFT:
                    wL[var.index] += exp_z * coeff.v
                elif k == VarKind.MULT_RIGHT:
                    wR[var.index] += exp_z * coeff.v
                elif k == VarKind.MULT_OUT:
                    wO[var.index] += exp_z * coeff.v
                elif k == VarKind.COMMITTED:
                    wV[var.index] -= exp_z * coeff.v
                # ONE terms are public; prover does not need wc
            exp_z = exp_z * zv % _L
        return (
            [Scalar(x) for x in wL],
            [Scalar(x) for x in wR],
            [Scalar(x) for x in wO],
            [Scalar(x) for x in wV],
        )

    def _create_randomized_constraints(self) -> None:
        if not self.deferred_constraints:
            self.transcript.r1cs_1phase_domain_sep()
            return
        self.transcript.r1cs_2phase_domain_sep()
        callbacks = self.deferred_constraints
        self.deferred_constraints = []
        rcs = RandomizingProver(self)
        for cb in callbacks:
            cb(rcs)

    # ------------------------------------------------------------------ prove
    def prove(self, bp_gens: BulletproofGens, backend=None) -> R1CSProof:
        import os as _os
        import time as _time

        _timing = _os.environ.get("BPTPU_TIMING", "") not in ("", "0")
        _marks = []

        def _mark(name):
            if _timing:
                _marks.append((name, _time.time()))

        _mark("start")
        t = self.transcript
        t.append_u64(b"m", len(self.v))

        B_b = self.pc_gens.B_blinding

        # --- phase 1 commitments
        n1 = len(self.a_L)
        self.num_phase1_multipliers = n1
        i_blinding1 = self._random_scalar()
        o_blinding1 = self._random_scalar()
        s_blinding1 = self._random_scalar()
        s_L1 = [self._random_scalar() for _ in range(n1)]
        s_R1 = [self._random_scalar() for _ in range(n1)]

        gens = bp_gens.share(0)
        if backend is not None:
            commit3 = backend.phase_commitments(
                gens, self.a_L, self.a_R, self.a_O, s_L1, s_R1,
                i_blinding1, o_blinding1, s_blinding1, B_b, 0,
            )
            A_I1, A_O1, S1 = commit3
        else:
            G1 = gens.G(n1)
            H1 = gens.H(n1)
            if len(G1) < n1:
                raise InvalidGeneratorsLength("gens capacity too small")
            A_I1 = multiscalar_mul(
                [i_blinding1] + self.a_L + self.a_R, [B_b] + G1 + H1
            ).compress()
            A_O1 = multiscalar_mul([o_blinding1] + self.a_O, [B_b] + G1).compress()
            S1 = multiscalar_mul(
                [s_blinding1] + s_L1 + s_R1, [B_b] + G1 + H1
            ).compress()
        _mark("phase1_commitments")
        t.append_point(b"A_I1", A_I1)
        t.append_point(b"A_O1", A_O1)
        t.append_point(b"S1", S1)

        # --- phase 2 (randomized constraints)
        self._create_randomized_constraints()
        n = len(self.a_L)
        n2 = n - n1
        padded_n = max(1, n)
        if padded_n & (padded_n - 1):
            padded_n = 1 << padded_n.bit_length()
        pad = padded_n - n
        if bp_gens.gens_capacity < padded_n:
            raise InvalidGeneratorsLength(
                f"need {padded_n} generators, have {bp_gens.gens_capacity}"
            )

        has_2nd_phase = n2 > 0
        if has_2nd_phase:
            i_blinding2 = self._random_scalar()
            o_blinding2 = self._random_scalar()
            s_blinding2 = self._random_scalar()
            s_L2 = [self._random_scalar() for _ in range(n2)]
            s_R2 = [self._random_scalar() for _ in range(n2)]
            G2 = gens.G(n)[n1:]
            H2 = gens.H(n)[n1:]
            A_I2 = multiscalar_mul(
                [i_blinding2] + self.a_L[n1:] + self.a_R[n1:], [B_b] + G2 + H2
            ).compress()
            A_O2 = multiscalar_mul(
                [o_blinding2] + self.a_O[n1:], [B_b] + G2
            ).compress()
            S2 = multiscalar_mul(
                [s_blinding2] + s_L2 + s_R2, [B_b] + G2 + H2
            ).compress()
        else:
            i_blinding2 = o_blinding2 = s_blinding2 = Scalar.zero()
            s_L2 = []
            s_R2 = []
            A_I2 = A_O2 = S2 = _IDENTITY_BYTES
        t.append_point(b"A_I2", A_I2)
        t.append_point(b"A_O2", A_O2)
        t.append_point(b"S2", S2)

        y = t.challenge_scalar(b"y")
        z = t.challenge_scalar(b"z")

        _mark("phase2")
        wL, wR, wO, wV = self._flattened_constraints(z, n)
        _mark("flatten")

        # --- l(x), r(x) vector polynomials over padded_n entries
        y_inv = y.invert()
        exp_y_inv = exp_iter(y_inv, padded_n)
        s_L = s_L1 + s_L2
        s_R = s_R1 + s_R2

        # int-domain vector-poly construction (hot O(padded_n) loops)
        from ..utils.constants import L as _L

        l1 = [0] * padded_n
        l2 = [0] * padded_n
        l3 = [0] * padded_n
        r0 = [0] * padded_n
        r1 = [0] * padded_n
        r3 = [0] * padded_n
        exp_y = 1
        yv = y.v
        for i in range(n):
            l1[i] = (self.a_L[i].v + exp_y_inv[i].v * wR[i].v) % _L
            l2[i] = self.a_O[i].v
            l3[i] = s_L[i].v
            r0[i] = (wO[i].v - exp_y) % _L
            r1[i] = (exp_y * self.a_R[i].v + wL[i].v) % _L
            r3[i] = exp_y * s_R[i].v % _L
            exp_y = exp_y * yv % _L
        for i in range(n, padded_n):
            r0[i] = _L - exp_y
            exp_y = exp_y * yv % _L

        def ip(u, w):
            return sum(map(lambda a, b: a * b, u, w)) % _L

        # t(x) = <l(x), r(x)>, degree 6, t0 == 0 (l0 == 0)
        t1 = Scalar(ip(l1, r0))
        t2 = Scalar(ip(l1, r1) + ip(l2, r0))
        t3 = Scalar(ip(l2, r1) + ip(l3, r0))
        t4 = Scalar(ip(l1, r3) + ip(l3, r1))
        t5 = Scalar(ip(l2, r3))
        t6 = Scalar(ip(l3, r3))

        t_1_blinding = self._random_scalar()
        t_3_blinding = self._random_scalar()
        t_4_blinding = self._random_scalar()
        t_5_blinding = self._random_scalar()
        t_6_blinding = self._random_scalar()

        pc = self.pc_gens
        T_1 = pc.commit(t1, t_1_blinding).compress()
        T_3 = pc.commit(t3, t_3_blinding).compress()
        T_4 = pc.commit(t4, t_4_blinding).compress()
        T_5 = pc.commit(t5, t_5_blinding).compress()
        T_6 = pc.commit(t6, t_6_blinding).compress()
        t.append_point(b"T_1", T_1)
        t.append_point(b"T_3", T_3)
        t.append_point(b"T_4", T_4)
        t.append_point(b"T_5", T_5)
        t.append_point(b"T_6", T_6)

        u = t.challenge_scalar(b"u")
        x = t.challenge_scalar(b"x")

        t_2_blinding = inner_product(wV, self.v_blinding)

        # evaluate t, blinding poly, l, r at x
        xx = x * x
        t_x = (
            t1 * x + t2 * xx + t3 * xx * x + t4 * xx * xx
            + t5 * xx * xx * x + t6 * xx * xx * xx
        )
        t_x_blinding = (
            t_1_blinding * x
            + t_2_blinding * xx
            + t_3_blinding * xx * x
            + t_4_blinding * xx * xx
            + t_5_blinding * xx * xx * x
            + t_6_blinding * xx * xx * xx
        )
        xv = x.v
        xxv = xv * xv % _L
        xxxv = xxv * xv % _L
        l_vec = [
            Scalar((l1[i] * xv + l2[i] * xxv + l3[i] * xxxv) % _L)
            for i in range(padded_n)
        ]
        r_vec = [
            Scalar((r0[i] + r1[i] * xv + r3[i] * xxxv) % _L)
            for i in range(padded_n)
        ]

        i_blinding = i_blinding1 + u * i_blinding2
        o_blinding = o_blinding1 + u * o_blinding2
        s_blinding = s_blinding1 + u * s_blinding2
        e_blinding = x * (i_blinding + x * (o_blinding + x * s_blinding))

        _mark("polys")
        t.append_scalar(b"t_x", t_x)
        t.append_scalar(b"t_x_blinding", t_x_blinding)
        t.append_scalar(b"e_blinding", e_blinding)

        w = t.challenge_scalar(b"w")
        Q = self.pc_gens.B.scalar_mul(w)

        G_factors = [Scalar.one()] * n1 + [u] * (n2 + pad)
        H_factors = [exp_y_inv[i] * G_factors[i] for i in range(padded_n)]

        if backend is not None and hasattr(backend, "stage_ipp_gens"):
            backend.stage_ipp_gens(gens, padded_n)
        ipp = InnerProductProof.create(
            t,
            Q,
            G_factors,
            H_factors,
            gens.G(padded_n),
            gens.H(padded_n),
            l_vec,
            r_vec,
            backend=backend,
        )

        _mark("ipp")
        if _timing:
            import sys as _sys

            parts = ", ".join(
                f"{name}={_marks[i+1][1]-_marks[i][1]:.2f}s"
                for i, (name, _) in enumerate(_marks[1:], 0)
                for name in [_marks[i + 1][0]]
            )
            print(f"[timing:prove] {parts}", file=_sys.stderr, flush=True)
        return R1CSProof(
            A_I1, A_O1, S1, A_I2, A_O2, S2,
            T_1, T_3, T_4, T_5, T_6,
            t_x, t_x_blinding, e_blinding, ipp,
        )


class RandomizingProver:
    """Phase-2 constraint system handed to randomized-constraint callbacks."""

    def __init__(self, prover: Prover):
        self.prover = prover

    def challenge_scalar(self, label: bytes) -> Scalar:
        return self.prover.transcript.challenge_scalar(label)

    def __getattr__(self, name):
        return getattr(self.prover, name)
