"""Per-phase device timing on the real TPU: patchify / corr / update / BA.

Isolates each phase of the frame step with realistic default.yaml shapes so
the frame-time budget can be attributed op by op. Segment timing with a
dependent-value fetch (axon dispatch lies; see bench.py).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.config import cfg
from dpvo_tpu.models.vonet import DIM, P, VONetParams, init_vonet_params, \
    patchify_frame, update_op
from dpvo_tpu.runtime.device_vo import _gp_cap

cfg.merge_from_file('config/default.yaml')

H, W = 480, 640
M = cfg.PATCHES_PER_FRAME
GP = _gp_cap(cfg)
E = GP * M
pmem = mem = 36
H4, W4 = H // 4, W // 4

print(f'GP={GP} M={M} E={E}')

rng = np.random.RandomState(0)
params = VONetParams.from_f32(init_vonet_params(0))
img = jnp.asarray(rng.randint(0, 255, (H, W, 3)), jnp.float32)
coords = jnp.asarray(rng.uniform(8, 100, (M, 2)), jnp.float32)


def timeit(fn, *args, iters=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    x0 = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(x0).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    x0 = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(x0).ravel()[0])
    return (time.perf_counter() - t0) / iters


# ---------------- patchify ----------------
@jax.jit
def run_patchify(img, coords):
    return patchify_frame(params, img, coords, mixed_precision=True)


t = timeit(run_patchify, img, coords)
print(f'patchify (2 encoders + gathers): {t*1e3:8.2f} ms')

# ---------------- corr (current mxu path) ----------------
from dpvo_tpu.ops.corr_mxu import corr_mxu

gmap = jnp.asarray(rng.randn(pmem * M, P, P, 128), jnp.bfloat16)
fmap1 = jnp.asarray(rng.randn(mem, H4, W4, 128), jnp.bfloat16)
fmap2 = jnp.asarray(rng.randn(mem, H4 // 4, W4 // 4, 128), jnp.bfloat16)
ecoords = jnp.asarray(
    np.stack([rng.uniform(8, W4 - 8, (E, P, P)),
              rng.uniform(8, H4 - 8, (E, P, P))], -1), jnp.float32)
kk_slot = jnp.asarray(rng.randint(0, pmem * M, E), jnp.int32)
jj_slot = jnp.asarray(np.sort(rng.randint(0, mem, E)), jnp.int32)


@jax.jit
def run_corr(ecoords):
    c1 = corr_mxu(gmap, fmap1, ecoords, kk_slot, jj_slot)
    c2 = corr_mxu(gmap, fmap2, ecoords / 4.0, kk_slot, jj_slot)
    return jnp.stack([c1, c2], axis=-1).reshape(E, -1)


t = timeit(run_corr, ecoords, iters=10)
print(f'corr both levels (corr_mxu):     {t*1e3:8.2f} ms')

# ---------------- update op ----------------
net = jnp.asarray(rng.randn(E, DIM), jnp.bfloat16)
inp = jnp.asarray(rng.randn(E, DIM), jnp.bfloat16)
corr_feat = jnp.asarray(rng.randn(E, 2 * 49 * 9), jnp.bfloat16)
ix = jnp.asarray(rng.randint(-1, E, E), jnp.int32)
jx = jnp.asarray(rng.randint(-1, E, E), jnp.int32)
kk_ids = jnp.asarray(rng.randint(0, GP * M, E), jnp.int32)
pair_ids = jnp.asarray(rng.randint(0, GP, E), jnp.int32)
mask = jnp.ones(E, bool)


@jax.jit
def run_update(net, inp, corr_feat):
    return update_op(params, net, inp, corr_feat, ix, jx, kk_ids, pair_ids,
                     num_segments=E, edge_mask=mask, mixed_precision=True)


t = timeit(run_update, net, inp, corr_feat, iters=10)
print(f'update_op @E={E}:           {t*1e3:8.2f} ms')

# ---------------- BA (pairs) ----------------
from dpvo_tpu.ba_pairs import bundle_adjust_pairs

N = cfg.BUFFER_SIZE
poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32), (N, 1))
centers = jnp.asarray(
    np.stack([rng.uniform(8, W4 - 8, N * M), rng.uniform(8, H4 - 8, N * M)],
             -1), jnp.float32)
depth = jnp.ones((N * M,), jnp.float32)
intr4 = jnp.asarray([W * 0.73 / 4, W * 0.73 / 4, W / 8, H / 8], jnp.float32)
pi = jnp.asarray(np.sort(rng.randint(30, 52, GP)), jnp.int32)
pj = jnp.asarray(rng.randint(30, 53, GP), jnp.int32)
pvalid = jnp.ones(GP, bool)
target = jnp.asarray(rng.uniform(8, 100, (GP, M, 2)), jnp.float32)
weight = jnp.asarray(rng.uniform(0, 1, (GP, M, 2)), jnp.float32)

WW = cfg.OPTIMIZATION_WINDOW
PCF = cfg.REMOVAL_WINDOW + 4


@jax.jit
def run_ba(poses, depth, target, weight):
    return bundle_adjust_pairs(
        poses, centers, depth, intr4, target, weight, 1e-4,
        pi, pj, pvalid, jnp.int32(43), jnp.int32(53),
        jnp.int32(33), M=M, W=WW, PCF=PCF, iterations=2)


t = timeit(run_ba, poses, depth, target, weight, iters=10)
print(f'bundle_adjust_pairs (2 GN):      {t*1e3:8.2f} ms')
