"""Microbench for corr_fused kernel evolutions (run on the real TPU).

Variants (all produce both-level planes for E edges, grouped by target):
  v0  current production kernel (ops/corr_fused._planes_fused)
  v1  K=2 edge pairing: one (18, C) x (C, 896) dot per loop iteration —
      amortizes the per-iteration loop/slice overhead across 2 edges at the
      cost of 2x MAC (off-diagonal blocks discarded)
  v2  v0 + in-kernel dynamic lane roll (pltpu.roll) that removes the
      per-edge 8-alignment slack from the emitted planes, shrinking the
      host-side tap-select from 18+12 to 11+6 masked shift terms
  sel  the full _select_taps pass on v0 planes (the thing v2 shrinks),
       timed separately

Timing: dispatch K iterations, fetch a dependent scalar, divide.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpvo_tpu.ops import corr_fused as cf
from dpvo_tpu.ops.corr_fused import (EB, TX, TY, WX, WX2, WY, WY2,
                                     pad_hw, pad_hw2)

H, W = 120, 160              # 640x480 at feature scale
H2, W2 = H // 4, W // 4
C = 128
P2 = 9
F = 16                       # distinct target slots
E = 43008                    # ~ default-config live edge count


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    x = out[0] if isinstance(out, (tuple, list)) else out
    _ = float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    x = out[0] if isinstance(out, (tuple, list)) else out
    _ = float(jnp.asarray(x).ravel()[0])
    return (time.perf_counter() - t0) / iters


rng = np.random.RandomState(0)
Hp, Wp = pad_hw(H, W)
Hp2, Wp2 = pad_hw2(H2, W2)
fp1 = jnp.asarray(rng.randn(F, Hp, Wp, C), jnp.bfloat16)
fp2 = jnp.asarray(rng.randn(F, 2, Hp2, Wp2, C), jnp.bfloat16)
g9 = jnp.asarray(rng.randn(E, P2, C), jnp.bfloat16)

# plausible grouped edges: coords spread over the image, sorted by slot
jslot = np.sort(rng.randint(0, F, E)).astype(np.int32)
cx = rng.uniform(4, W - 5, (E, 1, 1)) + rng.uniform(-1, 1, (E, 3, 3))
cy = rng.uniform(4, H - 5, (E, 1, 1)) + rng.uniform(-1, 1, (E, 3, 3))
coords = jnp.asarray(np.stack([cx, cy], -1), jnp.float32)

xi1, yi1, fx1, fy1, by1, bx1, oy1, ox1 = cf._window_base(coords, H, W, 3)
xi2, yi2, fx2, fy2, by2, bx2, oy2, ox2 = cf._window_base(
    coords / 4.0, H2, W2, 3, align=4, wy=WY2)
ph2 = (bx2 // 4) % 2
bx2s = bx2 - 4 * ph2
pa = jnp.asarray(jslot) | (by1 << 8) | ((bx1 // 8) << 18)
pb = by2 | ((bx2s // 8) << 10) | (ph2 << 18)

# ---------------- v0: production ----------------
t = timeit(partial(cf._planes_fused, interpret=False), g9, fp1, fp2, pa, pb)
print(f'v0 planes:            {t*1e3:7.2f} ms   {t/E*1e9:6.0f} ns/edge')

p1, p2 = cf._planes_fused(g9, fp1, fp2, pa, pb)


@jax.jit
def select_pass(p1, p2):
    pl1 = p1.reshape(E, P2, WY, WX)
    pl2 = p2.reshape(E, P2, WY2, WX2)
    c1 = cf._select_taps(pl1, xi1, yi1, fx1, fy1, oy1, ox1, H, W, 3, 3)
    c2 = cf._select_taps(pl2, xi2, yi2, fx2, fy2, oy2, ox2, H2, W2, 3, 3)
    return c1, c2


t = timeit(select_pass, p1, p2)
print(f'sel _select_taps:     {t*1e3:7.2f} ms')


# ---------------- v1: K=2 edge pairing ----------------
def _plane_kernel_k2(pa_ref, pb_ref, g_ref, f1_hbm, f2_hbm,
                     out1_ref, out2_ref, f1_vmem, f2_vmem, cur_ref, sem_ref):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        cur_ref[0] = -1

    def body(e2, _):
        gidx = blk * EB + 2 * e2
        pa0 = pa_ref[gidx]
        js = pa0 & 0xFF

        @pl.when(js != cur_ref[0])
        def _():
            cp1 = pltpu.make_async_copy(f1_hbm.at[js], f1_vmem, sem_ref.at[0])
            cp2 = pltpu.make_async_copy(f2_hbm.at[js], f2_vmem, sem_ref.at[1])
            cp1.start(); cp2.start(); cp1.wait(); cp2.wait()
            cur_ref[0] = js

        ws = []
        for k in range(2):
            pak = pa_ref[gidx + k]
            pbk = pb_ref[gidx + k]
            w1 = f1_vmem[pl.ds((pak >> 8) & 0x3FF, WY),
                         pl.ds(pl.multiple_of(((pak >> 18) & 0xFF) * 8, 8),
                               WX), :]
            w2 = f2_vmem[(pbk >> 18) & 1,
                         pl.ds(pbk & 0x3FF, WY2),
                         pl.ds(pl.multiple_of(((pbk >> 10) & 0xFF) * 8, 8),
                               WX2), :]
            ws.append(jnp.concatenate(
                [w1.reshape(WY * WX, C), w2.reshape(WY2 * WX2, C)], axis=0))
        wcat = jnp.concatenate(ws, axis=0)              # (2*448, C)
        gcat = jnp.concatenate([g_ref[2 * e2], g_ref[2 * e2 + 1]], axis=0)
        p = jax.lax.dot_general(gcat, wcat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        NW = WY * WX + WY2 * WX2
        for k in range(2):
            pk = p[k * P2:(k + 1) * P2, k * NW:(k + 1) * NW]
            out1_ref[2 * e2 + k] = pk[:, :WY * WX].astype(out1_ref.dtype)
            out2_ref[2 * e2 + k] = pk[:, WY * WX:].astype(out2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, EB // 2, body, 0)


@jax.jit
def planes_k2(g9, fp1, fp2, pa, pb):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(E // EB,),
        in_specs=[pl.BlockSpec((EB, P2, C), lambda i, *_: (i, 0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((EB, P2, WY * WX), lambda i, *_: (i, 0, 0)),
                   pl.BlockSpec((EB, P2, WY2 * WX2), lambda i, *_: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM(fp1.shape[1:], fp1.dtype),
                        pltpu.VMEM(fp2.shape[1:], fp2.dtype),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _plane_kernel_k2, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, P2, WY * WX), jnp.bfloat16),
                   jax.ShapeDtypeStruct((E, P2, WY2 * WX2), jnp.bfloat16)],
    )(pa.astype(jnp.int32), pb.astype(jnp.int32), g9, fp1, fp2)


try:
    t = timeit(planes_k2, g9, fp1, fp2, pa, pb)
    print(f'v1 K=2 pairing:       {t*1e3:7.2f} ms   {t/E*1e9:6.0f} ns/edge')
    q1, q2 = planes_k2(g9, fp1, fp2, pa, pb)
    err = float(jnp.max(jnp.abs(q1.astype(jnp.float32) -
                                p1.astype(jnp.float32))))
    print(f'   parity max|diff| vs v0: {err:.4f}')
except Exception as ex:
    print(f'v1 FAILED: {type(ex).__name__}: {str(ex)[:300]}')


# ---------------- v2: in-kernel dealign roll ----------------
def _plane_kernel_roll(pa_ref, pb_ref, g_ref, f1_hbm, f2_hbm,
                       out1_ref, out2_ref, f1_vmem, f2_vmem, cur_ref,
                       sem_ref):
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
        w2 = f2_vmem[(pb >> 18) & 1,
                     pl.ds(pb & 0x3FF, WY2),
                     pl.ds(pl.multiple_of(((pb >> 10) & 0xFF) * 8, 8),
                           WX2), :]
        w12 = jnp.concatenate([w1.reshape(WY * WX, C),
                               w2.reshape(WY2 * WX2, C)], axis=0)
        p12 = jax.lax.dot_general(g, w12, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sh1 = (pa >> 26) & 0x7          # x alignment slack, lanes
        sh2 = (pb >> 19) & 0x7
        o1 = pltpu.roll(p12[:, :WY * WX], -sh1, 1)
        o2 = pltpu.roll(p12[:, WY * WX:], -sh2, 1)
        out1_ref[e] = o1.astype(out1_ref.dtype)
        out2_ref[e] = o2.astype(out2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, EB, body, 0)


@jax.jit
def planes_roll(g9, fp1, fp2, pa, pb):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(E // EB,),
        in_specs=[pl.BlockSpec((EB, P2, C), lambda i, *_: (i, 0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((EB, P2, WY * WX), lambda i, *_: (i, 0, 0)),
                   pl.BlockSpec((EB, P2, WY2 * WX2), lambda i, *_: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM(fp1.shape[1:], fp1.dtype),
                        pltpu.VMEM(fp2.shape[1:], fp2.dtype),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _plane_kernel_roll, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, P2, WY * WX), jnp.bfloat16),
                   jax.ShapeDtypeStruct((E, P2, WY2 * WX2), jnp.bfloat16)],
    )(pa.astype(jnp.int32), pb.astype(jnp.int32), g9, fp1, fp2)


# x slack: (min(xi)-3) - bx_img, in [0,7]; recompute here for the bench
minx1 = jnp.min(xi1, axis=1) - 3
sh1 = (minx1 - (bx1 - TX)).astype(jnp.int32)
minx2 = jnp.min(xi2, axis=1) - 3
sh2 = (minx2 - (bx2s - TX)).astype(jnp.int32)
pa_r = pa | (sh1 << 26)
pb_r = pb | (sh2 << 19)

try:
    t = timeit(planes_roll, g9, fp1, fp2, pa_r, pb_r)
    print(f'v2 dealign roll:      {t*1e3:7.2f} ms   {t/E*1e9:6.0f} ns/edge')
    r1, _ = planes_roll(g9, fp1, fp2, pa_r, pb_r)
    # parity: rolled plane column c == v0 plane column c+sh for kept cols
    i = 5
    s = int(sh1[i])
    a = np.asarray(r1[i, :, :WY * WX - s], np.float32).reshape(P2, -1)
    b = np.asarray(p1[i], np.float32)[:, s:]
    print(f'   roll parity (edge {i}, sh={s}): '
          f'{np.max(np.abs(a - b)):.4f}')
except Exception as ex:
    print(f'v2 FAILED: {type(ex).__name__}: {str(ex)[:300]}')


# ---------------- v3: VMEM-streamed select kernel ----------------
from dpvo_tpu.ops.corr_select import select_taps_tpu

try:
    t = timeit(partial(select_taps_tpu, H=H, W=W, radius=3),
               p1.reshape(E, P2, WY, WX), yi1, xi1, fy1, fx1, oy1, ox1)
    print(f'v3 select kernel L1:  {t*1e3:7.2f} ms')
    t = timeit(partial(select_taps_tpu, H=H2, W=W2, radius=3),
               p2.reshape(E, P2, WY2, WX2), yi2, xi2, fy2, fx2, oy2, ox2)
    print(f'v3 select kernel L2:  {t*1e3:7.2f} ms')
    got = select_taps_tpu(p1.reshape(E, P2, WY, WX), yi1, xi1, fy1, fx1,
                          oy1, ox1, H=H, W=W, radius=3)
    ref = cf._select_taps(p1.reshape(E, P2, WY, WX), xi1, yi1, fx1, fy1,
                          oy1, ox1, H, W, 3, 3)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f'   parity max|diff|: {err:.4f} (scale {scale:.1f})')
except Exception as ex:
    print(f'v3 FAILED: {type(ex).__name__}: {str(ex)[:300]}')


# ---------------- end-to-end corr_fused: XLA select vs kernel select ----
kk_dummy = jnp.arange(E, dtype=jnp.int32)


@partial(jax.jit, static_argnames=('sk',))
def full_corr(g9, fp1, fp2, coords, jslot, sk):
    return cf.corr_fused(None, fp1, fp2, coords, kk_dummy, jslot,
                         g9=g9, prepadded=((H, W), (H2, W2)),
                         select_kernel=sk)


for sk in (False, True):
    try:
        t = timeit(partial(full_corr, sk=sk), g9, fp1, fp2, coords,
                   jnp.asarray(jslot))
        print(f'corr_fused select_kernel={sk}: {t*1e3:7.2f} ms')
    except Exception as ex:
        print(f'corr_fused sk={sk} FAILED: {type(ex).__name__}: '
              f'{str(ex)[:300]}')
