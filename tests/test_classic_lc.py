"""Classical loop-closure backend plumbing (retrieval + cache + PGO worker).

Runs the full process architecture (BoW retrieval service, JPEG cache, PGO
pool) over a synthetic out-and-back sequence. Tiny synthetic frames rarely
produce enough ORB inliers for an actual closure — the assertion is that the
whole pipeline runs and shuts down cleanly (an actual closure exercises the
same code paths tested in test_pgo / test_evaluation).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jit-heavy integration (see pytest.ini)

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.runtime import HybridVO

_LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'dpvo_tpu', 'native', 'libdpretrieval.so')


def textured_frames(n, H=96, W=128, seed=0):
    rng = np.random.RandomState(seed)
    base = np.zeros((H * 3, W * 3), np.uint8)
    # blobs + edges so ORB finds corners
    for _ in range(300):
        y, x = rng.randint(0, H * 3 - 12), rng.randint(0, W * 3 - 12)
        base[y:y + rng.randint(3, 12), x:x + rng.randint(3, 12)] = \
            rng.randint(0, 255)
    base = np.stack([base] * 3, -1)
    out = []
    for t in range(n):
        s = t if t < n // 2 else (n - 1 - t)
        out.append(base[2 * s:2 * s + H, 3 * s:3 * s + W].copy())
    return out


@pytest.mark.skipif(not os.path.exists(_LIB),
                    reason='native retrieval library not built')
def test_classic_lc_pipeline():
    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 8
    c.BUFFER_SIZE = 64
    c.REMOVAL_WINDOW = 5
    c.OPTIMIZATION_WINDOW = 4
    c.PATCH_LIFETIME = 4
    c.KEYFRAME_INDEX = 2
    c.CLASSIC_LOOP_CLOSURE = True
    c.LOOP_RETR_THRESH = 0.01

    frames = textured_frames(16)
    H, W, _ = frames[0].shape
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    slam = HybridVO(c, None, ht=H, wd=W, seed=0)
    assert slam.long_term_lc is not None, 'classic LC failed to start'
    slam.motion_probe = lambda: 100.0
    for t, img in enumerate(frames):
        slam(t, img, intr)

    poses, tstamps = slam.terminate()
    assert poses.shape == (len(frames), 7)
    assert np.isfinite(poses).all()
