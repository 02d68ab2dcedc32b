"""Isolate the one-pass kernel's per-step DMA overhead: time the dot loop
with vs without the skinny epilogue input streams (s1/fr1/s2/fr2, S1/S2).

Run ON TPU.  Env: E, ITERS, STREAMS=0|1
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpvo_tpu.ops.corr_fused import (WY, WX, WY2, WX2, pad_slab, pad_slab2)

EB = 32
E = int(os.environ.get('E', 49152))
ITERS = int(os.environ.get('ITERS', 20))
STREAMS = int(os.environ.get('STREAMS', 0))
H1, W1 = 120, 160
F, P, C, M = 36, 3, 128, 96
P2 = P * P
R = EB * P2


def kernel(nv_ref, pa_ref, pb_ref, g_ref, *rest):
    if STREAMS:
        s1_ref, fr1_ref, s2_ref, fr2_ref, S1_ref, S2_ref = rest[:6]
        rest = rest[6:]
    f1_hbm, f2_hbm, out1_ref, out2_ref, pl1, pl2, f1_vmem, f2_vmem, \
        cur_ref, sem_ref = rest
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        cur_ref[0] = -1

    def body(e, _):
        gidx = blk * EB + e
        pa = pa_ref[gidx]
        pb = pb_ref[gidx]
        js = pa & 0xFF

        @pl.when(js != cur_ref[0])
        def _():
            cp1 = pltpu.make_async_copy(f1_hbm.at[js], f1_vmem, sem_ref.at[0])
            cp2 = pltpu.make_async_copy(f2_hbm.at[js], f2_vmem, sem_ref.at[1])
            cp1.start(); cp2.start(); cp1.wait(); cp2.wait()
            cur_ref[0] = js

        g = g_ref[e]
        w1 = f1_vmem[pl.ds((pa >> 8) & 0x3FF, WY),
                     pl.ds(pl.multiple_of(((pa >> 18) & 0xFF) * 8, 8), WX), :]
        w2 = f2_vmem[(pb >> 18) & 1, pl.ds(pb & 0x3FF, WY2),
                     pl.ds(pl.multiple_of(((pb >> 10) & 0xFF) * 8, 8),
                           WX2), :]
        w12 = jnp.concatenate(
            [w1.reshape(WY * WX, C), w2.reshape(WY2 * WX2, C)], axis=0)
        p12 = jax.lax.dot_general(g, w12, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        pl1[e] = p12[:, :WY * WX]
        pl2[e] = p12[:, WY * WX:]
        return 0

    jax.lax.fori_loop(0, EB, body, 0)
    out1_ref[...] = pl1[...].reshape(R, WY * WX)[:, :49] * 1.0
    out2_ref[...] = pl2[...].reshape(R, WY2 * WX2)[:, :49] * 1.0


@partial(jax.jit, static_argnames=())
def call(g9, fp1, fp2, pa, pb, s1, fr1, s2, fr2, nv):
    d = 7
    stream_specs = ([
        pl.BlockSpec((R, 1), lambda i, *_: (i, 0)),
        pl.BlockSpec((R, 2), lambda i, *_: (i, 0)),
        pl.BlockSpec((R, 1), lambda i, *_: (i, 0)),
        pl.BlockSpec((R, 2), lambda i, *_: (i, 0)),
        pl.BlockSpec((d * WX, d * d), lambda i, *_: (0, 0)),
        pl.BlockSpec((d * WX2, d * d), lambda i, *_: (0, 0)),
    ] if STREAMS else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(E // EB,),
        in_specs=[pl.BlockSpec((EB, P2, C), lambda i, *_: (i, 0, 0))]
        + stream_specs
        + [pl.BlockSpec(memory_space=pl.ANY),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((R, d * d), lambda i, *_: (i, 0)),
            pl.BlockSpec((R, d * d), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((EB, P2, WY * WX), jnp.float32),
            pltpu.VMEM((EB, P2, WY2 * WX2), jnp.float32),
            pltpu.VMEM(fp1.shape[1:], fp1.dtype),
            pltpu.VMEM(fp2.shape[1:], fp2.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    stream_args = ([s1, fr1, s2, fr2,
                    jnp.zeros((7 * WX, 49), jnp.float32),
                    jnp.zeros((7 * WX2, 49), jnp.float32)] if STREAMS else [])
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E * P2, 49), jnp.float32),
                   jax.ShapeDtypeStruct((E * P2, 49), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
    )(nv.reshape(1), pa, pb, g9, *stream_args, fp1, fp2)


rng = np.random.RandomState(0)
g9 = jnp.asarray(rng.randn(E, P2, C), jnp.bfloat16)
fp1 = pad_slab(jnp.asarray(rng.randn(F, H1, W1, C), jnp.bfloat16))
fp2 = pad_slab2(jnp.asarray(rng.randn(F, H1 // 4, W1 // 4, C), jnp.bfloat16))
jj = np.sort(rng.randint(0, 22, E)).astype(np.int32)
by1 = rng.randint(0, 100, E).astype(np.int32)
bx1 = (rng.randint(0, 20, E) * 8).astype(np.int32)
pa = jnp.asarray(jj | (by1 << 8) | ((bx1 // 8) << 18))
by2 = rng.randint(0, 30, E).astype(np.int32)
bx2s = (rng.randint(0, 8, E) * 8).astype(np.int32)
ph2 = rng.randint(0, 2, E).astype(np.int32)
pb = jnp.asarray(by2 | ((bx2s // 8) << 10) | (ph2 << 18))
s1 = jnp.zeros((E * P2, 1), jnp.int32)
fr1 = jnp.zeros((E * P2, 2), jnp.float32)
s2 = jnp.zeros((E * P2, 1), jnp.int32)
fr2 = jnp.zeros((E * P2, 2), jnp.float32)
nv = jnp.asarray(E, jnp.int32)

o = call(g9, fp1, fp2, pa, pb, s1, fr1, s2, fr2, nv)
jax.block_until_ready(o)
_ = float(o[0][0, 0])
t0 = time.perf_counter()
for _ in range(ITERS):
    o = call(g9, fp1, fp2, pa, pb, s1, fr1, s2, fr2, nv)
_ = float(o[0][0, 0])
dt = (time.perf_counter() - t0) / ITERS
print(f'STREAMS={STREAMS}: {dt*1e3:8.2f} ms ({dt/E*1e9:6.1f} ns/edge)',
      flush=True)
