"""Replicate the hybrid runtime's bootstrap exactly via update_step + oracle.

8 frames, identity pose inits, random depth inits, fw/bw lifetime edges,
12 x update_step(iterations=2, W=8) with oracle targets. Compare to GT.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np
import jax.numpy as jnp

from test_oracle_ate import make_gt_poses, make_oracle
from dpvo_tpu import lie
from dpvo_tpu.runtime.state import update_step
from dpvo_tpu.runtime.dpvo import DPVO  # only for edge helpers? not needed
from dpvo_tpu.models.vonet import VONetParams, init_vonet_params

NF, M, P = 8, 4, 3
r = 4
N = 64

gt = make_gt_poses(NF)
oracle = make_oracle(gt)
params = VONetParams.from_f32(init_vonet_params(0))

rng = np.random.RandomState(3)
centers = np.stack([rng.uniform(4, 20, N * M),
                    rng.uniform(3, 13, N * M)], -1).astype(np.float32)
off = np.arange(-1, 2, dtype=np.float32)
px = centers[:, 0, None, None] + off[None, None, :]
py = centers[:, 1, None, None] + off[None, :, None]
patch_xy = np.stack([np.broadcast_to(px, (N * M, P, P)),
                     np.broadcast_to(py, (N * M, P, P))], 1).astype(np.float32)

# edge construction exactly like the runtime per frame n=1..7 (post-store n)
ii, jj, kk = [], [], []
for n in range(1, NF + 1):
    t0, t1 = M * max(n - r, 0), M * max(n - 1, 0)
    for k in range(t0, t1):
        kk.append(k); jj.append(n - 1)
    for k in range(M * (n - 1), M * n):
        for j in range(max(n - r, 0), n):
            kk.append(k); jj.append(j)
kk = np.asarray(kk, np.int32); jj = np.asarray(jj, np.int32)
ii = kk // M
E = len(kk)
cap = 1 << int(np.ceil(np.log2(E)))
print('edges:', E, 'cap:', cap)

tab = np.zeros((10, cap), np.int32)
tab[0, :E] = ii; tab[1, :E] = jj; tab[2, :E] = kk
tab[3, :E] = kk % (N * M)      # kk_slot unused by oracle path
tab[4, :E] = jj % 36
tab[5, :] = -1; tab[6, :] = -1
tab[9, :E] = 1

intr = np.tile(np.array([20., 20., 12., 8.], np.float32), (N, 1))
poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32), (N, 1))
depth = jnp.ones((N * M,), jnp.float32)
depth = depth.at[:NF * M].set(jnp.asarray(rng.rand(NF * M).astype(np.float32)))
net = jnp.zeros((cap, 384), jnp.bfloat16)

W_CAP = 8
PC_CAP = (6 + 4) * M

dummy = jnp.zeros((2, 2), jnp.bfloat16)
mask = jnp.asarray(tab[9].astype(bool))
for it in range(12):
    net, poses, depth, tgt, wgt, delta = update_step(
        params, poses, jnp.asarray(patch_xy), depth, jnp.asarray(intr),
        dummy, dummy, dummy, dummy, net,
        jnp.asarray(tab[:9]), mask,
        jnp.int32(1), jnp.int32(NF), jnp.int32(0),
        W=W_CAP, PC=PC_CAP, iterations=2, run_ba=True,
        mixed_precision=False, corr_mode='xla', oracle=oracle)

est = np.asarray(poses[:NF])
gtw = np.asarray(lie.se3_inv(jnp.asarray(gt)))
estw = np.asarray(lie.se3_inv(jnp.asarray(est)))
rel_e = np.linalg.norm(np.diff(estw[:, :3], axis=0), axis=1)
rel_g = np.linalg.norm(np.diff(gtw[:, :3], axis=0), axis=1)
print('|t_est|/|t_gt| per frame:', np.round(rel_e / rel_g, 3))
d = np.asarray(depth[:NF * M])
print('depth q:', np.round(np.quantile(d, [0.1, 0.5, 0.9]), 3))
from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
print('ATE:', ate_rmse(poses_to_trajectory(estw, np.arange(NF)),
                       poses_to_trajectory(gtw, np.arange(NF))))
