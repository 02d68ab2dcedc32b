"""Per-op timing of the DeviceVO hot path on the real TPU.

Times each stage of vo_frame standalone at live steady-state shapes
(default.yaml: GP=512 pairs x M=96 = 49152 edges, 640x480):
  patchify (2 encoders + patch extraction), corr_fused (both levels),
  update_op, bundle_adjust_pairs, reprojection, and the full vo_frame
  dispatch via the bench loop. Prints a ms table; the numbers drive the
  kernel-optimization priorities (VERDICT r1 #2a).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.config import cfg
from dpvo_tpu.models.vonet import DIM, P, VONetParams, init_vonet_params, \
    patchify_frame, update_op
from dpvo_tpu.ops.corr_fused import corr_fused, pad_hw, pad_hw2
from dpvo_tpu.ba_pairs import bundle_adjust_pairs
from dpvo_tpu.runtime.device_vo import _gp_cap, _reproject_pairs, \
    ring_capacity

cfg.merge_from_file('config/default.yaml')

H, W = 480, 640
H4, W4 = H // 4, W // 4
M = cfg.PATCHES_PER_FRAME
GP = _gp_cap(cfg)
pmem = mem = ring_capacity(cfg)
E = GP * M
NF = 40

print(f'shapes: GP={GP} M={M} E={E} pmem={pmem}', flush=True)

rng = np.random.RandomState(0)
params = VONetParams.from_f32(init_vonet_params(0))

img = jnp.asarray(rng.randint(0, 255, (H, W, 3)), jnp.uint8)
coords_sel = jnp.asarray(
    np.stack([rng.randint(2, W4 - 2, M), rng.randint(2, H4 - 2, M)], -1),
    jnp.float32)

gmap = jnp.asarray(rng.randn(pmem * M, P, P, 128) * 0.2, jnp.bfloat16)
imap = jnp.asarray(rng.randn(pmem * M, DIM) * 0.2, jnp.bfloat16)
fmap1 = jnp.asarray(rng.randn(mem, *pad_hw(H4, W4), 128) * 0.2, jnp.bfloat16)
fmap2 = jnp.asarray(rng.randn(mem, 2, *pad_hw2(H4 // 4, W4 // 4), 128) * 0.2,
                    jnp.bfloat16)

# realistic pair table: ~22 distinct target frames, grouped by target
n = 30
pj_np = np.sort(rng.randint(n - 22, n, GP)).astype(np.int32)
pi_np = np.clip(pj_np - rng.randint(1, 13, GP), 0, None).astype(np.int32)
pvalid = jnp.ones((GP,), bool)
pi, pj = jnp.asarray(pi_np), jnp.asarray(pj_np)

poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                 (cfg.BUFFER_SIZE, 1))
centers = jnp.asarray(                  # frame-major (N, 2M) rows
    np.stack([rng.uniform(8, W4 - 8, cfg.BUFFER_SIZE * M),
              rng.uniform(8, H4 - 8, cfg.BUFFER_SIZE * M)],
             -1).reshape(cfg.BUFFER_SIZE, 2 * M), jnp.float32)
depth = jnp.asarray(rng.uniform(0.3, 2.0, (cfg.BUFFER_SIZE * M,)), jnp.float32)
intr = jnp.asarray([W * 0.73, W * 0.73, W / 2, H / 2], jnp.float32)

fslot = jnp.asarray(np.arange(cfg.BUFFER_SIZE) % pmem, jnp.int32)
psl = fslot[pi]
kk_slot = (psl[:, None] * M + jnp.arange(M)[None, :]).reshape(E)
jj_slot = jnp.repeat(fslot[pj], M)


def timeit(label, fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    _ = np.asarray(jax.device_get(x)).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f'{label:26s} {dt:8.2f} ms', flush=True)
    return dt


# 1. patchify
patchify_jit = jax.jit(lambda p, im, c: patchify_frame(
    p, 2.0 * (im.astype(jnp.float32) / 255.0) - 0.5, c))
timeit('patchify(2 encoders)', patchify_jit, params, img, coords_sel)

# 2. reprojection
reproj_jit = jax.jit(lambda po, ce, de: _reproject_pairs(
    po, ce, de, intr, pi, pj, M))
coords_r = reproj_jit(poses, centers, depth)
timeit('reproject_pairs', reproj_jit, poses, centers, depth)

coords_f = coords_r.reshape(E, P, P, 2)
g9 = gmap.reshape(pmem, M, P * P, 128)[psl].reshape(E, P * P, 128)


# 3. corr_fused (kernel + select taps)
@jax.jit
def corr_call(gm, f1, f2, cf, g9x):
    c1, c2 = corr_fused(gm, f1, f2, cf, kk_slot, jj_slot, g9=g9x,
                        prepadded=((H4, W4), (H4 // 4, W4 // 4)))
    return jnp.stack([c1, c2], axis=-1).reshape(E, -1)


corr_feat = corr_call(gmap, fmap1, fmap2, coords_f, g9)
timeit('corr_fused(planes+taps)', corr_call, gmap, fmap1, fmap2, coords_f, g9)

# 3b. planes only (kernel alone)
from dpvo_tpu.ops import corr_fused as cfm


@jax.jit
def planes_only(gm, f1, f2, cf, g9x):
    xi1, yi1, fx1, fy1, by1, bx1, oy1, ox1 = cfm._window_base(
        cf, H4, W4, 3)
    xi2, yi2, fx2, fy2, by2, bx2, oy2, ox2 = cfm._window_base(
        cf / 4.0, H4 // 4, W4 // 4, 3, align=4, wy=cfm.WY2)
    ph2 = (bx2 // 4) % 2
    bx2s = bx2 - 4 * ph2
    pa = (jj_slot.astype(jnp.int32) | (by1 << 8) | ((bx1 // 8) << 18))
    pb = (by2 | ((bx2s // 8) << 10) | (ph2 << 18))
    return cfm._planes_fused(g9x, f1, f2, pa, pb)


timeit('  planes kernel only', planes_only, gmap, fmap1, fmap2, coords_f, g9)

# 4. update_op
ix_e = jnp.asarray(rng.randint(-1, E, E), jnp.int32)
jx_e = jnp.asarray(rng.randint(-1, E, E), jnp.int32)
ix_pair = jnp.asarray(rng.randint(-1, GP, GP), jnp.int32)
jx_pair = jnp.asarray(rng.randint(-1, GP, GP), jnp.int32)
kk_ids = kk_slot
pair_ids = jnp.repeat(jnp.arange(GP, dtype=jnp.int32), M)
edge_mask = jnp.repeat(pvalid, M)
net = jnp.zeros((E, DIM), jnp.bfloat16)
inp = imap.reshape(pmem, M * DIM)[psl].reshape(E, DIM)

upd_jit = jax.jit(lambda p, n_, i_, c_: update_op(
    p, n_, i_, c_, ix_e, jx_e, kk_ids, pair_ids, num_segments=E,
    edge_mask=edge_mask, num_segments_kk=pmem * M, num_segments_ij=GP,
    gather_pairs=(ix_pair, jx_pair, M)))
timeit('update_op', upd_jit, params, net, inp, corr_feat)

# 5. BA (2 iterations)
target = coords_r[:, :, P // 2, P // 2, :] + 1.0
weight = jnp.ones((GP, M, 2), jnp.float32) * 0.5
ba_jit = jax.jit(lambda po, de, ta, we: bundle_adjust_pairs(
    po, centers, de, intr, ta, we, 1e-4, pi, pj, pvalid,
    jnp.int32(n - 10), jnp.int32(n), jnp.int32(n - 24),
    M=M, W=cfg.OPTIMIZATION_WINDOW, PCF=cfg.REMOVAL_WINDOW + 4,
    iterations=2))
timeit('bundle_adjust_pairs(x2)', ba_jit, poses, depth, target, weight)
