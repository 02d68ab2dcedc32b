"""Benchmark: steady-state VO frame rate on synthetic 640x480 frames.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/baseline}

Baseline: the DPVO paper's ~60 FPS on an RTX-3090 (reference README.md:4-6;
no in-repo FPS logs exist — see BASELINE.md). Run on the real TPU chip.

The network weights are random (no public checkpoint in this environment),
which does not change the compute graph: identical conv/matmul/gather/BA
work per frame as a real checkpoint. Keyframe decisions are geometry-driven
and reach a realistic steady-state edge count.
"""
import argparse
import json
import time

import numpy as np


def synth_frames(n, H, W, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H + 4 * n, W + 6 * n, 3), np.uint8)
    return [base[2 * t:2 * t + H, 3 * t:3 * t + W] for t in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=120)
    ap.add_argument('--warmup', type=int, default=40)
    ap.add_argument('--height', type=int, default=480)
    ap.add_argument('--width', type=int, default=640)
    ap.add_argument('--config', default='config/default.yaml')
    ap.add_argument('--profile', action='store_true')
    ap.add_argument('--network', default=None)
    ap.add_argument('--no-keyframe-removal', action='store_true',
                    help='disable keyframe removal: worst-case edge load')
    args = ap.parse_args()

    import jax

    from dpvo_tpu.config import cfg
    from dpvo_tpu.runtime import DPVO

    cfg.merge_from_file(args.config)

    H, W = args.height, args.width
    frames = synth_frames(args.frames, H, W)
    intr = np.array([W * 0.73, W * 0.73, W / 2, H / 2], np.float32)

    slam = DPVO(cfg, args.network, ht=H, wd=W, seed=0)
    # random weights won't trip the learned motion probe; force the
    # initialization path so the benchmark reaches the steady-state workload
    if hasattr(slam, '_static'):           # device-resident runtime
        slam._static['force_accept'] = True
    else:
        slam.motion_probe = lambda: 100.0
        if args.no_keyframe_removal:
            slam.motionmag = lambda i, j: 100.0

    t_frame = []
    prof_ctx = None
    for t, img in enumerate(frames):
        if args.profile and t == args.warmup:
            prof_ctx = jax.profiler.trace('/tmp/dpvo_tpu_profile')
            prof_ctx.__enter__()
        t0 = time.perf_counter()
        slam(t, img, intr)
        jax.block_until_ready(slam.st.poses if hasattr(slam, 'st')
                              else slam.poses_dev)
        t_frame.append(time.perf_counter() - t0)
    if prof_ctx is not None:
        prof_ctx.__exit__(None, None, None)

    steady = np.array(t_frame[args.warmup:])
    fps = 1.0 / steady.mean()
    baseline = 60.0  # RTX-3090 paper figure

    print(json.dumps({
        'metric': f'vo_fps_{W}x{H}_default',
        'value': round(float(fps), 2),
        'unit': 'fps',
        'vs_baseline': round(float(fps / baseline), 3),
    }))


if __name__ == '__main__':
    main()
