"""Wall-clock phase timing of the HybridVO (SLAM-mode) frame loop on TPU.

Monkeypatches timers around the host phases of __call__; the deferred
mirror sync is surfaced by timing _drain separately. Sections overlap with
async device work, so numbers are host-serialization costs, not device
durations (use bench --profile for those).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from collections import defaultdict

import numpy as np

from dpvo_tpu.config import cfg
from dpvo_tpu.runtime import HybridVO

cfg.merge_from_file('config/default.yaml')
cfg.LOOP_CLOSURE = True
import os
cfg.MIRROR_PIPELINE = int(os.environ.get('MP', '1'))


def synth_frames(n, H, W, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H + 4 * n, W + 6 * n, 3), np.uint8)
    return [base[2 * t:2 * t + H, 3 * t:3 * t + W] for t in range(n)]


H, W = 480, 640
N = 100
frames = synth_frames(N, H, W)
intr = np.array([W * 0.73, W * 0.73, W / 2, H / 2], np.float32)

slam = HybridVO(cfg, None, ht=H, wd=W, seed=0)
slam.motion_probe = lambda: 100.0

times = defaultdict(float)
counts = defaultdict(int)


def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        times[name] += time.perf_counter() - t0
        counts[name] += 1
        return out
    return inner


for name in ('_fused_step', '_drain', '_sort_edges', '_edge_table',
             'append_factors', 'keyframe', 'edges_loop', '_run_global_ba',
             '_apply_mirror', '_drain_one', 'normalize', '_flush_pending',
             '_start_refresh', '_apply_refresh'):
    setattr(slam, name, wrap(name, getattr(slam, name)))

WARM = 40
for t in range(WARM):
    slam(t, frames[t], intr)
times.clear(); counts.clear()

t0 = time.perf_counter()
M = 40
for t in range(WARM, WARM + M):
    slam(t, frames[t], intr)
import jax
jax.block_until_ready(slam.poses_dev)
_ = float(slam.poses_dev[0, 0])
total = time.perf_counter() - t0

print(f'frames: {M}, total {total*1e3:.1f} ms -> {total/M*1e3:.2f} ms/frame '
      f'({M/total:.2f} FPS)')
for k in sorted(times, key=lambda k: -times[k]):
    print(f'  {k:18s}: {times[k]/M*1e3:7.2f} ms/frame  (n={counts[k]})')
