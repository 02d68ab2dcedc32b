"""Isolate: does windowed BA converge to GT given perfect oracle targets,
outside the runtime? Poses init identity, depths init 1."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np
import jax.numpy as jnp

from test_oracle_ate import PLANE_Z, make_gt_poses, make_oracle
from dpvo_tpu import ba as ba_mod
from dpvo_tpu import lie

N, M, P = int(os.environ.get('NF', 12)), 4, 3
LIFETIME = int(os.environ.get('LT', 4))
rng = np.random.RandomState(0)

gt = make_gt_poses(N)
oracle = make_oracle(gt)

intr = np.tile(np.array([20., 20., 12., 8.], np.float32), (N, 1))
if os.environ.get('INTC'):
    centers = np.stack([rng.randint(1, 23, N * M).astype(np.float32),
                        rng.randint(1, 15, N * M).astype(np.float32)],
                       -1).astype(np.float32)
else:
    centers = np.stack([rng.uniform(4, 20, N * M),
                        rng.uniform(3, 13, N * M)], -1).astype(np.float32)
off = np.arange(-1, 2, dtype=np.float32)
px = centers[:, 0, None, None] + off[None, None, :]
py = centers[:, 1, None, None] + off[None, :, None]
patch_xy = np.stack([np.broadcast_to(px, (N * M, P, P)),
                     np.broadcast_to(py, (N * M, P, P))], 1).astype(np.float32)

frame = np.repeat(np.arange(N), M)
ii, jj, kk = [], [], []
for k in range(N * M):
    for dj in range(-LIFETIME, LIFETIME + 1):
        j = frame[k] + dj
        if dj != 0 and 0 <= j < N:
            ii.append(frame[k]); jj.append(j); kk.append(k)
ii = np.asarray(ii, np.int32); jj = np.asarray(jj, np.int32)
kk = np.asarray(kk, np.int32)
E = len(ii)
print('edges:', E)

poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32), (N, 1))
depth = (jnp.asarray(rng.rand(N * M).astype(np.float32))
         if os.environ.get('RDEPTH') else jnp.ones((N * M,), jnp.float32))
mask = jnp.ones(E, bool)

tgt, w = oracle(None, jnp.asarray(patch_xy), None, jnp.asarray(intr),
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk))

xy_center = jnp.asarray(patch_xy[:, :, 1, 1])
for it in range(int(os.environ.get('ITERS', 20))):
    poses, depth = ba_mod.bundle_adjust(
        poses, xy_center, depth, jnp.asarray(intr[0]), tgt, w, 1e-4,
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk), mask,
        jnp.int32(1), jnp.int32(N), jnp.int32(0),
        W=N, PC=N * M, iterations=2)

# compare against GT up to Sim3 gauge: report inverse-depth ratios & pose err
d_np = np.asarray(depth)
# GT inverse depth
d_gt = np.zeros(N * M, np.float32)
for k in range(N * M):
    i = frame[k]
    rx = (centers[k, 0] - 12.) / 20.; ry = (centers[k, 1] - 8.) / 20.
    dc = np.array([rx, ry, 1.0])
    Pi_inv = np.asarray(lie.se3_inv(jnp.asarray(gt[i])))
    ow, dw = Pi_inv[:3], np.asarray(
        lie.quat_rotate(jnp.asarray(Pi_inv[3:7]), jnp.asarray(dc)))
    lam = (PLANE_Z - ow[2]) / dw[2]
    Xc = np.asarray(lie.se3_act(jnp.asarray(gt[i]),
                                jnp.asarray(ow + lam * dw)))
    d_gt[k] = 1.0 / Xc[2]

ratio = d_np / d_gt
print('depth/gt ratio: mean %.4f  std %.4f  min %.3f max %.3f' %
      (ratio.mean(), ratio.std(), ratio.min(), ratio.max()))
gt_wfc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
est_wfc = np.asarray(lie.se3_inv(poses))
from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
print('ATE:', ate_rmse(poses_to_trajectory(est_wfc, np.arange(N)),
                       poses_to_trajectory(gt_wfc, np.arange(N))))
