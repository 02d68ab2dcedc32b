"""Isolate the per-edge cost in the fused-corr kernel: slices vs dot vs writes.

Variants (same grid/scalars as the real kernel):
  full     — slices + reshape + concat + dot (the real thing, minus taps)
  nodot    — slices + reshape + concat, dot replaced by a fixed-operand dot
  fixedw   — dot with FIXED scratch window (no per-edge slices)
  rank3    — per-level rank-3 dot_general (no reshape/concat), if supported
  unroll2  — full, two edges per loop iteration
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WY, WX, EB = 12, 16, 32
E = int(os.environ.get('E', 49152))
P2, C = 9, 128
H1, W1 = 120, 160
F = 36

rng = np.random.RandomState(0)
g9 = jnp.asarray(rng.randn(E, P2, C), jnp.bfloat16)
f1 = jnp.asarray(rng.randn(F, H1, W1, C), jnp.bfloat16)
f2 = jnp.asarray(rng.randn(F, H1 // 4, W1 // 4, C), jnp.bfloat16)

jsl = np.sort(rng.randint(0, 30, E)).astype(np.int32)
by1 = rng.randint(0, H1 - WY, E).astype(np.int32)
bx1s = (rng.randint(0, (W1 - WX) // 8, E) * 8).astype(np.int32)
ph1 = rng.randint(0, 2, E).astype(np.int32)
by2 = rng.randint(0, H1 // 4 - WY, E).astype(np.int32)
bx2s = np.zeros(E, np.int32)
ph2 = rng.randint(0, 2, E).astype(np.int32)
pa = jnp.asarray(jsl | (by1 << 8) | ((bx1s // 8) << 18) | (ph1 << 26))
pb = jnp.asarray(by2 | ((bx2s // 8) << 10) | (ph2 << 18))


def make_kernel(mode):
    def kern(pa_ref, pb_ref, g_ref, f1a, f1b, f2a, f2b,
             out1_ref, out2_ref, f1_vmem, f2_vmem, cur_ref, sem_ref):
        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _():
            cur_ref[0] = -1

        def body(e, _):
            gidx = blk * EB + e
            pav = pa_ref[gidx]
            pbv = pb_ref[gidx]
            js = pav & 0xFF

            @pl.when(js != cur_ref[0])
            def _():
                cps = [pltpu.make_async_copy(src.at[js], dst, sem_ref.at[k])
                       for k, (src, dst) in enumerate(
                           [(f1a, f1_vmem.at[0]), (f1b, f1_vmem.at[1]),
                            (f2a, f2_vmem.at[0]), (f2b, f2_vmem.at[1])])]
                for c in cps:
                    c.start()
                for c in cps:
                    c.wait()
                cur_ref[0] = js

            g = g_ref[e]

            if mode == 'fixedw':
                w1 = f1_vmem[0, :WY, :WX, :]
                w2 = f2_vmem[0, :WY, :WX, :]
            else:
                w1 = f1_vmem[(pav >> 26) & 1,
                             pl.ds((pav >> 8) & 0x3FF, WY),
                             pl.ds(pl.multiple_of(((pav >> 18) & 0xFF) * 8, 8),
                                   WX), :]
                w2 = f2_vmem[(pbv >> 18) & 1,
                             pl.ds(pbv & 0x3FF, WY),
                             pl.ds(pl.multiple_of(((pbv >> 10) & 0xFF) * 8, 8),
                                   WX), :]

            if mode == 'rank3':
                p1 = jax.lax.dot_general(
                    g, w1, (((1,), (2,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p2 = jax.lax.dot_general(
                    g, w2, (((1,), (2,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out1_ref[e] = p1.reshape(P2, WY * WX).astype(out1_ref.dtype)
                out2_ref[e] = p2.reshape(P2, WY * WX).astype(out2_ref.dtype)
            elif mode == 'twodots':
                w1f = w1.reshape(WY * WX, C)
                w2f = w2.reshape(WY * WX, C)
                p1 = jax.lax.dot_general(g, w1f, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                p2 = jax.lax.dot_general(g, w2f, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                out1_ref[e] = p1.astype(out1_ref.dtype)
                out2_ref[e] = p2.astype(out2_ref.dtype)
            else:
                w12 = jnp.concatenate([w1.reshape(WY * WX, C),
                                       w2.reshape(WY * WX, C)], axis=0)
                p12 = jax.lax.dot_general(g, w12, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                out1_ref[e] = p12[:, :WY * WX].astype(out1_ref.dtype)
                out2_ref[e] = p12[:, WY * WX:].astype(out2_ref.dtype)
            return 0

        jax.lax.fori_loop(0, EB, body, 0)

    return kern


def run(mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(E // EB,),
        in_specs=[pl.BlockSpec((EB, P2, C), lambda i, *_: (i, 0, 0))] +
                 [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec((EB, P2, WY * WX), lambda i, *_: (i, 0, 0)),
                   pl.BlockSpec((EB, P2, WY * WX), lambda i, *_: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((2, H1, W1, C), jnp.bfloat16),
            pltpu.VMEM((2, H1 // 4, W1 // 4, C), jnp.bfloat16),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    f1b = jnp.pad(f1[:, :, 4:, :], ((0, 0), (0, 0), (0, 4), (0, 0)))
    f2b = jnp.pad(f2[:, :, 4:, :], ((0, 0), (0, 0), (0, 4), (0, 0)))

    fn = jax.jit(lambda: pl.pallas_call(
        make_kernel(mode), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, P2, WY * WX), jnp.bfloat16)] * 2,
    )(pa, pb, g9, f1, f1b, f2, f2b))

    out = fn()
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn()
    _ = float(jnp.asarray(out[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / 10
    print(f'{mode:8s}: {dt*1e3:8.2f} ms  ({dt/E*1e9:6.1f} ns/edge)', flush=True)


for mode in ('full', 'twodots', 'fixedw', 'rank3'):
    try:
        run(mode)
    except Exception as ex:
        print(f'{mode:8s}: FAILED {str(ex)[:120]}', flush=True)
