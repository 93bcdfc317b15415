"""Marginal-cost microbench: chain K dependent dispatches, sync once."""
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

LAN = 256 * 64
K = 20

a = jnp.asarray(rng.integers(-2048, 2049, (STORE, 8, LAN), dtype=np.int32))
b = jnp.asarray(rng.integers(-2048, 2049, (STORE, 8, LAN), dtype=np.int32))
out = pf.mul_fp(a, b); sync(out)
# marginal: K chained muls
t0 = time.time()
x = a
for _ in range(K):
    x = pf.mul_fp(x, b)
sync(x)
dt1 = time.time() - t0
t0 = time.time()
x = a
for _ in range(2 * K):
    x = pf.mul_fp(x, b)
sync(x)
dt2 = time.time() - t0
per = (dt2 - dt1) / K
n = 8 * LAN
print(f"mul_fp marginal: {per*1e3:.2f} ms/call = {n/per/1e6:.0f} M muls/s")

P = jnp.asarray(rng.integers(-2048, 2049, (92, 8, LAN), dtype=np.int32))
Q = jnp.asarray(rng.integers(-2048, 2049, (92, 8, LAN), dtype=np.int32))
out = pc.padd(P, Q); sync(out)
t0 = time.time()
x = P
for _ in range(K):
    x = pc.padd(x, Q)
sync(x)
dt1 = time.time() - t0
t0 = time.time()
x = P
for _ in range(2 * K):
    x = pc.padd(x, Q)
sync(x)
dt2 = time.time() - t0
per = (dt2 - dt1) / K
npts = 8 * LAN
print(f"padd marginal: {per*1e3:.2f} ms/call = {npts/per/1e6:.1f} M adds/s "
      f"({per/(LAN//256)*1e6:.1f} us per 2048-pt block)")

pts = jnp.asarray(rng.integers(-2048, 2049, (92, 8, 256), dtype=np.int32))
words = jnp.asarray(rng.integers(-2**31, 2**31-1, (8, 8, 256), dtype=np.int32))
acc = pc.identity_rows_array(2048)
out = pc.msm_chunk_acc_w4(pts, words, acc); sync(out)
t0 = time.time()
x = acc
for _ in range(K):
    x = pc.msm_chunk_acc_w4(pts, words, x)
sync(x)
dt1 = time.time() - t0
t0 = time.time()
x = acc
for _ in range(2 * K):
    x = pc.msm_chunk_acc_w4(pts, words, x)
sync(x)
dt2 = time.time() - t0
per = (dt2 - dt1) / K
print(f"msm_chunk_acc_w4 marginal: {per*1e3:.2f} ms per 2048-pt chunk "
      f"(~340 pt-ops/pt -> {per/340/2048*1e9:.1f} ns/pt-op)")
