"""Microbenchmark the pieces of update_step on realistic TPU shapes."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.models.vonet import DIM, P, VONetParams, init_vonet_params, update_op
from dpvo_tpu.ops.corr import corr as corr_op
from dpvo_tpu import ba as ba_mod
from dpvo_tpu.runtime.state import _reproject

E = 8192
M, pmem, mem = 96, 36, 36
H4, W4 = 120, 160
NF = 40

rng = np.random.RandomState(0)
params = VONetParams.from_f32(init_vonet_params(0))

gmap = jnp.asarray(rng.randn(pmem * M, P, P, 128), jnp.bfloat16)
fmap1 = jnp.asarray(rng.randn(mem, H4, W4, 128), jnp.bfloat16)
fmap2 = jnp.asarray(rng.randn(mem, H4 // 4, W4 // 4, 128), jnp.bfloat16)
imap = jnp.asarray(rng.randn(pmem * M, DIM), jnp.bfloat16)

coords = jnp.asarray(
    np.stack([rng.uniform(5, W4 - 5, (E, P, P)),
              rng.uniform(5, H4 - 5, (E, P, P))], -1), jnp.float32)
kk_slot = jnp.asarray(rng.randint(0, pmem * M, E), jnp.int32)
jj_slot = jnp.asarray(rng.randint(0, mem, E), jnp.int32)

corr1_jit = jax.jit(lambda g, f, c, i, j: corr_op(g, f, c, i, j, radius=3))

net = jnp.zeros((E, DIM), jnp.bfloat16)
corr_feat = jnp.asarray(rng.randn(E, 2 * 49 * 9), jnp.bfloat16)
ix = jnp.asarray(rng.randint(-1, E, E), jnp.int32)
jx = jnp.asarray(rng.randint(-1, E, E), jnp.int32)
ids = jnp.asarray(rng.randint(0, E // 4, E), jnp.int32)
mask = jnp.ones(E, bool)

upd_jit = jax.jit(lambda *a: update_op(params, *a, num_segments=E,
                                       edge_mask=mask))

poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (4096, 1))
xy = jnp.asarray(rng.uniform(5, 100, (4096 * M, 2)), jnp.float32)
depth = jnp.asarray(rng.uniform(0.3, 1.5, (4096 * M,)), jnp.float32)
intr = jnp.asarray([110.0, 110.0, 80.0, 60.0])
ii = jnp.asarray(rng.randint(0, NF, E), jnp.int32)
jj = jnp.asarray(rng.randint(0, NF, E), jnp.int32)
kk = jnp.asarray(rng.randint(0, NF * M, E), jnp.int32)
target = jnp.asarray(rng.uniform(0, 150, (E, 2)), jnp.float32)
weight = jnp.ones((E, 2), jnp.float32)

ba_jit = jax.jit(lambda p, d, t, w: ba_mod.bundle_adjust(
    p, xy, d, intr, t, w, 1e-4, ii, jj, kk, mask,
    jnp.int32(NF - 10), jnp.int32(NF), jnp.int32(0), W=10, PC=2496,
    iterations=2))

patch_xy_full = jnp.asarray(rng.uniform(5, 100, (4096 * M, 2, P, P)),
                            jnp.float32)
intrN = jnp.tile(intr[None], (4096, 1))
repro_jit = jax.jit(lambda p, d: _reproject(p, patch_xy_full, d, intrN,
                                            ii, jj, kk))


def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f'{name:24s} {dt:9.2f} ms')
    return out


print(f'E={E}')
bench('reproject', repro_jit, poses, depth)
bench('corr_lvl1', corr1_jit, gmap, fmap1, coords, kk_slot, jj_slot)
bench('corr_lvl2', corr1_jit, gmap, fmap2, coords / 4.0, kk_slot, jj_slot)
bench('update_op', upd_jit, net, imap[kk_slot], corr_feat, ix, jx, ids, ids)
bench('ba_local', ba_jit, poses, depth, target, weight)

# null dispatch roundtrip
null = jax.jit(lambda x: x + 1)
bench('null_dispatch', null, jnp.zeros(8))
