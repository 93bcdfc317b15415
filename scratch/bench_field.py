"""TPU microbench: field mul + point add + small MSM with the current
emit_reduce schedule."""
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bulletproofs_r1cs_gadgets_tpu.ops import pallas_field as pf
from bulletproofs_r1cs_gadgets_tpu.ops import pallas_curve as pc
from bulletproofs_r1cs_gadgets_tpu.ops.field import STORE

rng = np.random.default_rng(3)

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1, :1, :1])

LAN = 256 * 64  # 16384 lanes -> 131072 elements
a = jnp.asarray(rng.integers(-2048, 2049, (STORE, 8, LAN), dtype=np.int32))
b = jnp.asarray(rng.integers(-2048, 2049, (STORE, 8, LAN), dtype=np.int32))

t0 = time.time()
out = pf.mul_fp(a, b); sync(out)
print(f"mul_fp compile+run: {time.time()-t0:.2f}s")
best = 1e9
for _ in range(5):
    t0 = time.time(); out = pf.mul_fp(a, b); sync(out)
    best = min(best, time.time() - t0)
n_mul = 8 * LAN
print(f"mul_fp n={n_mul}: {best*1e3:.2f} ms = {n_mul/best/1e6:.1f} M muls/s")

# point add over 64 blocks (131072 points)
P = jnp.asarray(rng.integers(-2048, 2049, (92, 8, LAN), dtype=np.int32))
Q = jnp.asarray(rng.integers(-2048, 2049, (92, 8, LAN), dtype=np.int32))
t0 = time.time(); out = pc.padd(P, Q); sync(out)
print(f"padd compile+run: {time.time()-t0:.2f}s")
best = 1e9
for _ in range(5):
    t0 = time.time(); out = pc.padd(P, Q); sync(out)
    best = min(best, time.time() - t0)
npts = 8 * LAN
print(f"padd n={npts}: {best*1e3:.2f} ms = {npts/best/1e6:.1f} M adds/s "
      f"({best/ (LAN//256) * 1e6:.1f} us per 2048-pt block)")

# w4 chunk MSM (one block, compile + steady)
pts = jnp.asarray(rng.integers(-2048, 2049, (92, 8, 256), dtype=np.int32))
words = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (8, 8, 256), dtype=np.int32))
acc = pc.identity_rows_array(2048)
t0 = time.time(); out = pc.msm_chunk_acc_w4(pts, words, acc); sync(out)
print(f"msm_chunk_acc_w4 compile+run: {time.time()-t0:.2f}s")
best = 1e9
for _ in range(5):
    t0 = time.time(); out = pc.msm_chunk_acc_w4(pts, words, acc); sync(out)
    best = min(best, time.time() - t0)
print(f"msm_chunk_acc_w4 (2048 pts, ~340 ops/pt): {best*1e3:.2f} ms")
