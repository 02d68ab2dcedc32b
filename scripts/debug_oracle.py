"""Debug the oracle-VO accuracy: report per-frame pose error vs GT."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))
from test_oracle_ate import (H, W, N_FRAMES, PLANE_Z, make_gt_poses,
                             make_oracle)

from dpvo_tpu import lie
from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory, umeyama_alignment
from dpvo_tpu.runtime.dpvo import DPVO

cfg = base_cfg.clone()
cfg.BUFFER_SIZE = 64
cfg.PATCHES_PER_FRAME = 4
cfg.PATCH_LIFETIME = 5
cfg.REMOVAL_WINDOW = 10
cfg.OPTIMIZATION_WINDOW = int(os.environ.get('OPTW', 10))
cfg.KEYFRAME_THRESH = -1.0
cfg.MIXED_PRECISION = False

gt_poses = make_gt_poses(N_FRAMES)
oracle = make_oracle(gt_poses)

slam = DPVO(cfg, None, ht=H, wd=W, seed=3)
slam._oracle = oracle
slam.motion_probe = lambda: 100.0

rng = np.random.RandomState(1)
intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)
for t in range(N_FRAMES):
    img = rng.randint(0, 255, (H, W, 3), np.uint8)
    slam(t, img, intr)
    if t <= 12 or t == N_FRAMES - 1:
        pd = np.array(slam.poses_dev[:slam.n])
        gw = gt_poses[:slam.n]
        # relative pose error frame i vs i-1 compared to GT relative
        import jax.numpy as _j
        rel_est = np.asarray(lie.se3_mul(_j.asarray(pd[1:]), lie.se3_inv(_j.asarray(pd[:-1]))))
        rel_gt = np.asarray(lie.se3_mul(_j.asarray(gw[1:]), lie.se3_inv(_j.asarray(gw[:-1]))))
        tn = np.linalg.norm(rel_est[:, :3], axis=1)
        tg = np.linalg.norm(rel_gt[:, :3], axis=1)
        dshape = np.array(slam.depth_dev[:slam.n*slam.M])
        print(f't={t} n={slam.n} |t_est|/|t_gt|=', np.round(tn/np.maximum(tg,1e-9), 3)[:12],
              'depth q=', np.round(np.quantile(dshape, [0.1,0.5,0.9]), 3), flush=True)

poses, tstamps = slam.terminate()
gt_wfc = np.asarray(lie.se3_inv(jnp.asarray(gt_poses)))

# align with Sim3 and print per-frame error
x = poses[:, :3].T
y = gt_wfc[:, :3].T
R, t, c = umeyama_alignment(x, y, with_scale=True)
err = ((c * R @ x + t) - y)
print('scale', c)
print('per-frame err:', np.round(np.linalg.norm(err, axis=0), 4))
est = poses_to_trajectory(poses, tstamps)
gt = poses_to_trajectory(gt_wfc, np.arange(N_FRAMES))
print('ATE:', ate_rmse(est, gt))
print('depth sample:', np.asarray(slam.depth_np[:8]))
