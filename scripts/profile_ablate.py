"""Ablate frame_step cost by toggling do_update / run_ba on live state."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax

from dpvo_tpu.config import cfg
from dpvo_tpu.runtime import DPVO

cfg.merge_from_file('config/default.yaml')

H, W = 480, 640
rng = np.random.RandomState(0)
base = rng.randint(0, 255, (H + 400, W + 600, 3), np.uint8)
frames = [base[2*t:2*t+H, 3*t:3*t+W] for t in range(70)]
intr = np.array([W*0.73, W*0.73, W/2, H/2], np.float32)

slam = DPVO(cfg, None, ht=H, wd=W, seed=0)
slam.motion_probe = lambda: 100.0
slam.motionmag = lambda i, j: 100.0

for t, img in enumerate(frames):
    slam(t, img, intr)
jax.block_until_ready(slam.poses_dev)
print(f"steady: E={len(slam.ii)} bucket={slam._ecap} n={slam.n}", flush=True)

import jax.numpy as jnp
img_dev = jnp.asarray(frames[-1])
coords = slam._select_coords(img_dev)
pose_init = slam.poses_np[slam.n - 1].copy()
depth_init = np.full(slam.M, 0.5, np.float32)

def run(tag, **kw):
    # warm
    slam._fused_step(img_dev, coords, pose_init, depth_init, slam.n - 1, **kw)
    jax.block_until_ready(slam.poses_dev)
    t0 = time.perf_counter()
    for _ in range(5):
        slam._fused_step(img_dev, coords, pose_init, depth_init, slam.n - 1, **kw)
    jax.block_until_ready(slam.poses_dev)
    print(f"{tag:28s} {(time.perf_counter()-t0)/5*1000:9.2f} ms", flush=True)

run('full (update+BA)', do_update=True, run_ba=True)
run('no BA (update only)', do_update=True, run_ba=False)
run('store only', do_update=False, run_ba=False)
