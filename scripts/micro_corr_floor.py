"""Microbenchmarks for the correlation redesign.

Measures, on the real TPU:
  1. XLA batched dot (E,9,128)@(E,128,W) bf16 from HBM  (current corr_mxu plane)
  2. Pallas kernel: same dots but LHS/RHS VMEM-resident (MXU small-dot floor)
  3. Pallas kernel: per-patch window slice from a VMEM fmap slab + dot
     (the frame-resident fused design candidate)

Timing: dispatch loop of K calls, fetch a dependent scalar, divide.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # dependent-value fetch (axon: block_until_ready may lie)
    x = out[0] if isinstance(out, (tuple, list)) else out
    _ = float(jnp.asarray(x).ravel()[0])
    return (time.perf_counter() - t0) / iters


E = 49152
P2 = 9
C = 128
W = 384

rng = np.random.RandomState(0)
g = jnp.asarray(rng.randn(E, P2, C), jnp.bfloat16)
win = jnp.asarray(rng.randn(E, W, C), jnp.bfloat16)


@jax.jit
def xla_plane(g, win):
    return jnp.einsum('epc,ewc->epw', g, win,
                      preferred_element_type=jnp.float32)


t = timeit(xla_plane, g, win, iters=5)
macs = E * P2 * W * C
print(f"1. XLA batched dot HBM: {t*1e3:8.2f} ms  {macs*2/t/1e12:6.2f} TFLOP/s")

# --- 2. VMEM-resident repeated small dots --------------------------------
# one grid step processes BLK patches' dots from VMEM blocks
BLK = 16   # patches per grid step


def dot_kernel(g_ref, w_ref, out_ref):
    def body(m, _):
        gm = g_ref[m]                       # (P2, C)
        wm = w_ref[m]                       # (W, C)
        out_ref[m] = jax.lax.dot_general(
            gm, wm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


@jax.jit
def pallas_dots(g, win):
    G = E // BLK
    return pl.pallas_call(
        dot_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((BLK, P2, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((BLK, W, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((BLK, P2, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P2, W), jnp.float32),
    )(g.reshape(E, P2, C), win)


t = timeit(pallas_dots, g, win)
print(f"2. Pallas VMEM dots:    {t*1e3:8.2f} ms  {macs*2/t/1e12:6.2f} TFLOP/s")

# --- 2b. same but output bf16 and smaller W ------------------------------
W2 = 256
win2 = win[:, :W2]


def dot_kernel2(g_ref, w_ref, out_ref):
    def body(m, _):
        out_ref[m] = jax.lax.dot_general(
            g_ref[m], w_ref[m], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


@jax.jit
def pallas_dots2(g, win):
    G = E // BLK
    return pl.pallas_call(
        dot_kernel2,
        grid=(G,),
        in_specs=[pl.BlockSpec((BLK, P2, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((BLK, W2, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((BLK, P2, W2), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P2, W2), jnp.bfloat16),
    )(g.reshape(E, P2, C), win)


t = timeit(pallas_dots2, g, win2)
macs2 = E * P2 * W2 * C
print(f"2b. Pallas W=256 bf16:  {t*1e3:8.2f} ms  {macs2*2/t/1e12:6.2f} TFLOP/s")

# --- 3. fused: window slice from VMEM slab + dot -------------------------
H4, W4 = 120, 160
fmap = jnp.asarray(rng.randn(H4, W4, C), jnp.bfloat16)
WY, WX = 16, 16
by = jnp.asarray(rng.randint(0, H4 - WY, (E // BLK, BLK)), jnp.int32)
bx = jnp.asarray((rng.randint(0, (W4 - WX) // 8, (E // BLK, BLK)) * 8),
                 jnp.int32)


def fused_kernel(by_ref, bx_ref, g_ref, fmap_ref, out_ref):
    def body(m, _):
        y0 = by_ref[m]
        x0 = bx_ref[m]
        w = fmap_ref[pl.ds(y0, WY), pl.ds(x0, WX), :]       # (WY, WX, C)
        wm = w.reshape(WY * WX, C)
        out_ref[m] = jax.lax.dot_general(
            g_ref[m], wm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


@jax.jit
def pallas_fused(g, fmap, by, bx):
    G = E // BLK
    return pl.pallas_call(
        fused_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, BLK), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, BLK), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((BLK, P2, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((H4, W4, C), lambda i: (0, 0, 0)),
                  ],
        out_specs=pl.BlockSpec((BLK, P2, WY * WX), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P2, WY * WX), jnp.bfloat16),
    )(by, bx, g.reshape(E, P2, C), fmap)


t = timeit(pallas_fused, g, fmap, by, bx)
macs3 = E * P2 * WY * WX * C
print(f"3. fused slab slice+dot:{t*1e3:8.2f} ms  {macs3*2/t/1e12:6.2f} TFLOP/s")
