"""End-to-end runtime smoke test: synthetic frames through the DPVO driver.

Uses tiny images + a small config so the whole pipeline (patchify, probe,
bootstrap, update, BA, keyframing, terminate) executes on the CPU test mesh.
Random network weights — this checks mechanics, not tracking accuracy.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jit-heavy integration (see pytest.ini)

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.runtime import DPVO


def synth_frames(n=14, H=96, W=128, seed=0):
    """Textured random pattern translating slowly (keeps flow finite)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    frames = []
    for t in range(n):
        dx, dy = 3 * t, 2 * t
        frames.append(base[dy:dy + H, dx:dx + W])
    return frames


@pytest.fixture(scope='module')
def small_cfg():
    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 8
    c.BUFFER_SIZE = 64
    c.REMOVAL_WINDOW = 8
    c.OPTIMIZATION_WINDOW = 6
    c.PATCH_LIFETIME = 5
    c.KEYFRAME_INDEX = 2
    c.MIXED_PRECISION = True
    return c


def test_end_to_end_smoke(small_cfg):
    frames = synth_frames()
    H, W, _ = frames[0].shape
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    slam = DPVO(small_cfg, None, ht=H, wd=W, seed=0)
    for t, img in enumerate(frames):
        slam(t, img, intr)

    poses, tstamps = slam.terminate()
    assert poses.shape == (len(frames), 7)
    assert np.isfinite(poses).all()
    assert len(tstamps) == len(frames)
    # quaternions stay normalized through retraction chains
    qn = np.linalg.norm(poses[:, 3:7], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)


def test_hybrid_runtime_smoke(small_cfg):
    """Host-orchestrated runtime (loop-closure path) end to end."""
    from dpvo_tpu.runtime import HybridVO

    frames = synth_frames(n=12)
    H, W, _ = frames[0].shape
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    slam = HybridVO(small_cfg, None, ht=H, wd=W, seed=0)
    for t, img in enumerate(frames):
        slam(t, img, intr)
        assert slam.net_dev.shape[0] >= len(slam.ii)
    poses, tstamps = slam.terminate()
    assert poses.shape == (len(frames), 7)
    assert np.isfinite(poses).all()


def test_device_driver_gradient_bias_selection():
    """DeviceVO honors CENTROID_SEL_STRAT=GRADIENT_BIAS (reference
    net.py:119-136): selected centroids concentrate on the textured half
    of a half-flat image."""
    from dpvo_tpu.config import cfg as base_cfg
    from dpvo_tpu.runtime.device_driver import DeviceVO

    c = base_cfg.clone()
    c.PATCHES_PER_FRAME = 16
    c.CENTROID_SEL_STRAT = 'GRADIENT_BIAS'

    H, W = 64, 96
    vo = DeviceVO(c, None, ht=H, wd=W, seed=0)
    img = np.zeros((H, W, 3), np.uint8)
    img[:, W // 2:] = np.random.RandomState(0).randint(
        0, 255, (H, W - W // 2, 3))
    xy = vo._select_coords(img)
    assert xy.shape == (16, 2)
    # centroids are in 1/4-res pixels; textured half starts at W/8
    frac_textured = float((xy[:, 0] >= (W // 4) / 2).mean())
    assert frac_textured > 0.8, xy[:, 0]
