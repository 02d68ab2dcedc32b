"""Phase-level timing of the VO loop on TPU (block_until_ready walls)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax

from dpvo_tpu.config import cfg
from dpvo_tpu.runtime import HybridVO as DPVO
from dpvo_tpu.runtime import dpvo as dpvo_mod

# this script instruments the HYBRID runtime's internals (_fused_step
# etc.); for the device-resident runtime use scripts/profile_hybrid.py /
# bench.py --profile instead
cfg.merge_from_file('config/default.yaml')


def synth_frames(n, H, W, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H + 4 * n, W + 6 * n, 3), np.uint8)
    return [base[2 * t:2 * t + H, 3 * t:3 * t + W] for t in range(n)]


H, W = 480, 640
frames = synth_frames(90, H, W)
intr = np.array([W * 0.73, W * 0.73, W / 2, H / 2], np.float32)

slam = DPVO(cfg, None, ht=H, wd=W, seed=0)
slam.motion_probe = lambda: 100.0

# monkeypatch timers around the internals
times = {}


def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        jax.block_until_ready(slam.poses_dev)
        times.setdefault(name, []).append(time.perf_counter() - t0)
        return out
    return inner


orig_fused = slam._fused_step
orig_kf = slam.keyframe
orig_table = slam._edge_table
slam._fused_step = wrap('fused_step', orig_fused)
slam.keyframe = wrap('keyframe', orig_kf)


def table_timed(*a, **k):
    t0 = time.perf_counter()
    out = orig_table(*a, **k)
    times.setdefault('edge_table_host', []).append(time.perf_counter() - t0)
    return out


slam._edge_table = table_timed
slam.motionmag_orig = slam.motionmag
slam.motionmag = lambda i, j: 100.0   # retain keyframes: worst-case E

for t, img in enumerate(frames):
    t0 = time.perf_counter()
    slam(t, img, intr)
    jax.block_until_ready(slam.poses_dev)
    times.setdefault('frame_total', []).append(time.perf_counter() - t0)

print(f'\nedges steady state: {len(slam.ii)}  bucket: {slam._ecap}  n={slam.n}')
for k, v in times.items():
    v = np.array(v[len(v) // 2:]) * 1000
    print(f'{k:18s} n={len(v):3d}  mean={v.mean():8.2f}ms  p50={np.percentile(v,50):8.2f}  max={v.max():8.2f}')
