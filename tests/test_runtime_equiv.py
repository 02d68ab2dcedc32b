"""Device-resident vs host-orchestrated runtime: same algorithm.

Both runtimes implement the reference per-frame state machine; this test
runs them on the same synthetic sequence with aligned RNG streams and checks
the high-level behavior agrees (frame acceptance, keyframe count, finite
output of equal length). Exact pose equality is not expected — the hybrid
path does some decision math on the host in float64.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jit-heavy integration (see pytest.ini)

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.runtime import HybridVO
from dpvo_tpu.runtime.device_driver import DeviceVO


def synth_frames(n=14, H=96, W=128, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    return [base[2 * t:2 * t + H, 3 * t:3 * t + W] for t in range(n)]


@pytest.fixture(scope='module')
def small_cfg():
    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 8
    c.BUFFER_SIZE = 64
    c.REMOVAL_WINDOW = 8
    c.OPTIMIZATION_WINDOW = 6
    c.PATCH_LIFETIME = 5
    c.KEYFRAME_INDEX = 2
    return c


def run(slam, frames, intr):
    for t, img in enumerate(frames):
        slam.rng = np.random.RandomState(1000 + t)   # aligned streams
        slam(t, img, intr)
    return slam.terminate()


def test_runtimes_agree(small_cfg):
    frames = synth_frames()
    H, W, _ = frames[0].shape
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    dev = DeviceVO(small_cfg, None, ht=H, wd=W, seed=0)
    hyb = HybridVO(small_cfg, None, ht=H, wd=W, seed=0)

    p1, t1 = run(dev, frames, intr)
    p2, t2 = run(hyb, frames, intr)

    assert p1.shape == p2.shape == (len(frames), 7)
    assert np.isfinite(p1).all() and np.isfinite(p2).all()
    np.testing.assert_array_equal(t1, t2)
    # same number of accepted keyframes
    assert int(dev.st.counter) == hyb.counter
    # frame acceptance pattern pre-bootstrap is the load-bearing decision;
    # both runtimes must agree on how many keyframes survived
    assert abs(int(dev.st.n) - hyb.n) <= 1
