"""Tune the fused corr kernel: planes (Pallas) vs taps (XLA) split, EB sweep."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import corr_fused as cfm

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


WY, WX = cfm.WY, cfm.WX


fp1 = jax.jit(cfm._pad_phases)(fmap1)
fp2 = jax.jit(cfm._pad_phases)(fmap2)


def planes_only(coords):
    H1_, W1_ = fmap1.shape[1], fmap1.shape[2]
    H2_, W2_ = fmap2.shape[1], fmap2.shape[2]
    xi1, yi1, fx1, fy1, by1, bx1, oy1, ox1 = \
        cfm._window_base(coords, H1_, W1_, 3)
    xi2, yi2, fx2, fy2, by2, bx2, oy2, ox2 = \
        cfm._window_base(coords / 4.0, H2_, W2_, 3)
    ph1 = (bx1 // 4) % 2
    bx1s = bx1 - 4 * ph1
    ph2 = (bx2 // 4) % 2
    bx2s = bx2 - 4 * ph2
    jsl32 = jj.astype(jnp.int32)
    pa = (jsl32 | (by1 << 8) | ((bx1s // 8) << 18) | (ph1 << 26))
    pb = (by2 | ((bx2s // 8) << 10) | (ph2 << 18))
    g9 = gmap[kk].reshape(E, P * P, C)
    return cfm._planes_fused(g9, fp1, fp2, pa, pb)


for eb in (32, 64, 128, 256):
    cfm.EB = eb
    f = jax.jit(planes_only)
    t = timeit(f, coords)
    print(f'planes EB={eb:4d}: {t*1e3:8.2f} ms', flush=True)

cfm.EB = 32
full = jax.jit(lambda c: cfm.corr_fused(gmap, fmap1, fmap2, c, kk, jj))
t_full = timeit(full, coords)
print(f'full corr_fused (EB=32): {t_full*1e3:8.2f} ms', flush=True)
