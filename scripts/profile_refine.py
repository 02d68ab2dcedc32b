"""Trace vo_refine (one update+BA iteration, same body as vo_frame's
while-loop) so the profiler attributes the INNER ops individually —
while.52 in the vo_frame trace is opaque.

    python scripts/profile_refine.py
    python scripts/agg_trace.py /tmp/dpvo_tpu_profile_refine 10
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from dpvo_tpu.config import cfg
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.utils.fetch import fetch

    cfg.merge_from_file('config/default.yaml')
    cfg.UPLOAD_FORMAT = 'yuv420'
    H, W = 480, 640
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (H + 400, W + 600, 3), np.uint8)
    frames = [base[2 * t:2 * t + H, 3 * t:3 * t + W] for t in range(60)]
    intr = np.array([W * 0.73, W * 0.73, W / 2, H / 2], np.float32)

    slam = DPVO(cfg, None, ht=H, wd=W, seed=0)
    slam._static['force_accept'] = True
    for t in range(50):
        slam(t, frames[t % 60], intr)
    fetch(slam.st.poses[0, 0])

    from dpvo_tpu.runtime.device_vo import vo_refine
    kw = {k: v for k, v in slam._static.items()
          if k in ('M', 'pmem', 'mem', 'W', 'PCF', 'opt_window',
                   'mixed_precision', 'corr_impl')}
    st = vo_refine(slam.params, slam.st, ht4=H // 4, wd4=W // 4,
                   oracle=None, **kw)
    fetch(st.poses[0, 0])

    with jax.profiler.trace('/tmp/dpvo_tpu_profile_refine'):
        for _ in range(10):
            st = vo_refine(slam.params, st, ht4=H // 4, wd4=W // 4,
                           oracle=None, **kw)
        fetch(st.poses[0, 0])
    print('trace written to /tmp/dpvo_tpu_profile_refine')


if __name__ == '__main__':
    main()
