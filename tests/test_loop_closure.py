"""DPV-SLAM backends: proximity loop closure + global BA, end to end."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jit-heavy integration (see pytest.ini)

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.runtime import HybridVO


def synth_frames(n, H=96, W=128, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    out = []
    for t in range(n):
        # out-and-back camera path so late frames revisit early content
        s = t if t < n // 2 else (n - 1 - t)
        out.append(base[2 * s:2 * s + H, 3 * s:3 * s + W])
    return out


def test_proximity_loop_closure_and_global_ba():
    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 8
    c.BUFFER_SIZE = 64
    c.REMOVAL_WINDOW = 6
    c.OPTIMIZATION_WINDOW = 5
    c.PATCH_LIFETIME = 4
    c.KEYFRAME_INDEX = 2
    c.LOOP_CLOSURE = True
    c.GLOBAL_OPT_FREQ = 6
    c.MAX_EDGE_AGE = 30
    c.BACKEND_THRESH = 1e6     # accept any proximity candidate
    c.KEYFRAME_THRESH = -1.0   # retain keyframes (keeps old patches around)

    frames = synth_frames(20)
    H, W, _ = frames[0].shape
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    slam = HybridVO(c, None, ht=H, wd=W, seed=0)
    slam.motion_probe = lambda: 100.0   # random weights: force acceptance
    for t, img in enumerate(frames):
        slam(t, img, intr)

    # the long-range edge trigger must have fired at least once
    assert slam.ran_global_ba[:slam.n + 1].any() or len(slam.ii_inac) > 0

    poses, tstamps = slam.terminate()
    assert poses.shape == (len(frames), 7)
    assert np.isfinite(poses).all()
