"""TPU A/B: corr_mxu (window-DMA + XLA einsums) vs corr_fused (frame-resident)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops.corr_mxu import corr_mxu
from dpvo_tpu.ops.corr_fused import corr_fused

E = int(os.environ.get('E', 49152))
P, C = 3, 128
H1, W1 = 120, 160
F = 36
M = 96

rng = np.random.RandomState(0)
gmap = jnp.asarray(rng.randn(F * M, P, P, C), jnp.bfloat16)
fmap1 = jnp.asarray(rng.randn(F, H1, W1, C), jnp.bfloat16)
fmap2 = jnp.asarray(rng.randn(F, H1 // 4, W1 // 4, C), jnp.bfloat16)

cx = rng.uniform(8, W1 - 9, E)
cy = rng.uniform(8, H1 - 9, E)
off = np.linspace(-1.0, 1.0, P)
gx = cx[:, None, None] + off[None, None, :] + rng.uniform(-0.3, 0.3, (E, P, P))
gy = cy[:, None, None] + off[None, :, None] + rng.uniform(-0.3, 0.3, (E, P, P))
coords = jnp.asarray(np.stack([gx, gy], -1), jnp.float32)
kk = jnp.asarray(rng.randint(0, F * M, E), jnp.int32)
jj = jnp.asarray(np.sort(rng.randint(0, 30, E)), jnp.int32)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    x = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    x = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(x).ravel()[0])
    return (time.perf_counter() - t0) / iters


@jax.jit
def run_mxu(coords):
    c1 = corr_mxu(gmap, fmap1, coords, kk, jj)
    c2 = corr_mxu(gmap, fmap2, coords / 4.0, kk, jj)
    return c1, c2


@jax.jit
def run_fused(coords):
    return corr_fused(gmap, fmap1, fmap2, coords, kk, jj)


t_f = timeit(run_fused, coords)
print(f'corr_fused both levels @E={E}: {t_f*1e3:8.2f} ms', flush=True)
t_m = timeit(run_mxu, coords)
print(f'corr_mxu   both levels @E={E}: {t_m*1e3:8.2f} ms', flush=True)

# numeric agreement on TPU
c1f, c2f = run_fused(coords)
c1m, c2m = run_mxu(coords)
d1 = float(jnp.max(jnp.abs(c1f - c1m)))
s = float(jnp.max(jnp.abs(c1m)))
print(f'max |fused-mxu| level1: {d1:.4f}  (scale {s:.1f})', flush=True)

# ---- breakdown: planes kernel alone vs selection ----
from dpvo_tpu.ops.corr_fused import _planes_fused, _window_base, _select_taps, WY, WX, EB

g9 = gmap[kk].reshape(E, 9, C)
xi1, yi1, fx1, fy1, by1, bx1 = _window_base(coords, H1, W1, 3)


@jax.jit
def run_planes(g9, coords):
    xi1, yi1, fx1, fy1, by1, bx1 = _window_base(coords, H1, W1, 3)
    xi2, yi2, fx2, fy2, by2, bx2 = _window_base(coords / 4.0, H1 // 4,
                                                W1 // 4, 3)
    return _planes_fused(g9, fmap1, fmap2, jj, by1, bx1, by2, bx2)


t_p = timeit(run_planes, g9, coords)
print(f'planes kernel only:            {t_p*1e3:8.2f} ms', flush=True)


@jax.jit
def run_select(plane, coords):
    xi1, yi1, fx1, fy1, by1, bx1 = _window_base(coords, H1, W1, 3)
    return _select_taps(plane.reshape(E, 9, WY, WX), xi1, yi1, fx1, fy1,
                        by1, bx1, H1, W1, 3, 3)


p1, p2 = run_planes(g9, coords)
t_s = timeit(run_select, p1, coords)
print(f'select_taps one level:         {t_s*1e3:8.2f} ms', flush=True)
