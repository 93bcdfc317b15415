"""Roofline for the window-accumulator MSM walker (VERDICT r3 weak #3).

Three numbers, measured on the real chip in one process:

  A. field-mul ceiling     - loop-resident dependent chain of emit_mul
                             on one (23, 8, 256) stacked block: the
                             speed-of-light for the mod-p multiply the
                             walker is made of.
  B. walk-step ceiling     - loop-resident walker inner step (8-entry
                             signed-digit select + niels mixed add) on
                             one block: the speed-of-light for the
                             walker's actual instruction mix (selects
                             are not muls but cost real issue slots).
  C. measured msm_win      - the production dispatch at k=32 chunks
                             (n = 65536 points, bench stage-1 shape).

MFU-style ratios reported:
  mul-MFU  = achieved field-muls/s (analytic count) / A
  step-MFU = achieved walk-steps/s / B

Analytic op count per msm_win dispatch over k chunks (see
pallas_curve._msm_win_kernel):
  walk steps: 64 windows x k chunks, each = 8 selects + 1 niels add
              (8 muls on a 2048-element block)
  boundary  : per window, 3 dbl_xyz (6 muls) + 1 dbl (7) + [w>0] 1 add
              (8) = 33 muls on one block (25 for w=0)
  final     : block reduce 11 adds (88 muls) + 1 chain add (8)

Usage (TPU session): python scratch/roofline.py
Writes a JSON line; paste the summary into PERF_NOTES.md 'Roofline'.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bulletproofs_r1cs_gadgets_tpu.ops import pallas_field as pf
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc
from bulletproofs_r1cs_gadgets_tpu.ops.field import STORE

ROWS, SUB, LAN = pc.ROWS, pc.SUB, pc.LAN_BLOCK
ELEMS = SUB * LAN  # 2048 field elements per stacked block


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1, :1, :1])


def timeit(fn, reps=3):
    fn()  # compile
    sync(fn())
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.time() - t0) / reps


# --------------------------------------------- A. field-mul ceiling kernel
def _mulchain_kernel(a_ref, b_ref, o_ref, *, reps: int):
    b = b_ref[...]

    def body(_, x):
        return pf.emit_mul(x, b, "fp")

    o_ref[...] = lax.fori_loop(0, reps, body, a_ref[...], unroll=False)


def ceiling_mul(reps=2000):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(-2048, 2049, (STORE, SUB, LAN), np.int32))
    b = jnp.asarray(rng.integers(-2048, 2049, (STORE, SUB, LAN), np.int32))

    import functools

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            functools.partial(_mulchain_kernel, reps=reps),
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    dt = timeit(lambda: run(a, b))
    rate = ELEMS * reps / dt
    print(f"A. field-mul ceiling: {reps} chained muls in {dt*1e3:.1f} ms "
          f"= {rate/1e6:.0f} M elem-muls/s", flush=True)
    return rate


# ------------------------------------------ B. walk-step ceiling kernel
def _walkchain_kernel(t_ref, w_ref, o_ref, *, reps: int):
    zeros = jnp.zeros((STORE, SUB, LAN), jnp.int32)
    ident_n = pc._identity_niels(zeros)

    def body(i, acc):
        sel = pc._win_digit_select(w_ref, i % 64, t_ref, ident_n)
        return pc.emit_point_add_niels(acc, sel)

    pc._store_point(
        o_ref, lax.fori_loop(0, reps, body, pc._identity_point(zeros),
                             unroll=False)
    )


def ceiling_step(reps=500):
    rng = np.random.default_rng(2)
    tbl = jnp.asarray(
        rng.integers(-2048, 2049, (ROWS, SUB, 8 * LAN), np.int32)
    )
    words = jnp.asarray(
        rng.integers(0, 2**31 - 1, (8, SUB, LAN), np.int32)
    )

    import functools

    @jax.jit
    def run(t, w):
        return pl.pallas_call(
            functools.partial(_walkchain_kernel, reps=reps),
            out_shape=jax.ShapeDtypeStruct((ROWS, SUB, LAN), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(t, w)

    dt = timeit(lambda: run(tbl, words))
    rate = ELEMS * reps / dt  # walk-steps/s (per element)
    print(f"B. walk-step ceiling: {reps} chained steps in {dt*1e3:.1f} ms "
          f"= {rate/1e6:.0f} M elem-steps/s "
          f"(mul content {rate*8/1e6:.0f} M muls/s)", flush=True)
    return rate


# --------------------------------------------------- C. production msm_win
def measured_msm(n=1 << 16):
    import random

    from bulletproofs_r1cs_gadgets_tpu.core.pedersen import BulletproofGens
    from bulletproofs_r1cs_gadgets_tpu.core import scvec
    from bulletproofs_r1cs_gadgets_tpu.core.scalar import Scalar
    from bulletproofs_r1cs_gadgets_tpu.ops import chunks as ck
    from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
    from bulletproofs_r1cs_gadgets_tpu.utils.constants import L

    k = n // ck.CHUNK
    gens = BulletproofGens(max(n, 2048))
    backend = PallasBackend()
    tbl = backend._gens_table(gens.share(0), n, "G")
    rnd = random.Random(1)
    word_sets = [
        ck.grid_words(
            scvec.from_scalars([Scalar(rnd.randrange(L)) for _ in range(n)]),
            k,
        )
        for _ in range(4)
    ]

    def run(words):
        return ck.fetch_points([ck.msm_win(tbl, words, k)])[0]

    run(word_sets[-1])
    t0 = time.time()
    for w in word_sets[:3]:
        run(w)
    dt = (time.time() - t0) / 3
    steps = 64 * n                      # element walk-steps
    muls = steps * 8 + 64 * 33 * ELEMS + (11 * 8 + 8) * ELEMS
    print(f"C. msm_win n={n} (k={k}): {dt*1e3:.1f} ms "
          f"= {steps/dt/1e6:.0f} M elem-steps/s, "
          f"{muls/dt/1e6:.0f} M elem-muls/s (analytic)", flush=True)
    return steps / dt, muls / dt, dt


def main():
    d = jax.devices()
    print("devices:", d, flush=True)
    a = ceiling_mul()
    b = ceiling_step()
    step_rate, mul_rate, dt = measured_msm()
    out = {
        "ceiling_mul_elem_per_s": round(a),
        "ceiling_step_elem_per_s": round(b),
        "msm_win_65536_s": round(dt, 4),
        "achieved_step_elem_per_s": round(step_rate),
        "achieved_mul_elem_per_s": round(mul_rate),
        "step_mfu_pct": round(100 * step_rate / b, 1),
        "mul_mfu_pct": round(100 * mul_rate / a, 1),
        "walkstep_mul_content_pct": round(100 * (b * 8) / a, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
