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


def test_runtimes_agree_oracle_trajectory():
    """Same oracle, same scene, both runtimes: the recovered trajectories
    must agree with each other (and with ground truth) in ATE — the two
    implementations claim to be the SAME algorithm (reference
    dpvo.py:377-473), so divergence beyond fp32-vs-fp64 decision noise is
    a real bug this catches."""
    import jax.numpy as jnp
    from dpvo_tpu import lie
    from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
    from test_oracle_ate import (
        H, W, N_FRAMES, make_gt_poses, make_oracle, _ConstDepthRng)

    c = default_cfg.clone()
    c.BUFFER_SIZE = 64
    c.PATCHES_PER_FRAME = 4
    c.PATCH_LIFETIME = 5
    c.REMOVAL_WINDOW = 10
    c.OPTIMIZATION_WINDOW = 10
    c.KEYFRAME_THRESH = -1.0
    c.MIXED_PRECISION = False

    gt_poses = make_gt_poses(N_FRAMES)
    oracle = make_oracle(gt_poses)
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    def run_oracle(slam):
        slam._oracle = oracle
        if hasattr(slam, '_static'):          # device-resident runtime
            slam._static['force_accept'] = True
        else:
            slam.motion_probe = lambda: 100.0
        rng = np.random.RandomState(1)
        for t in range(N_FRAMES):
            img = rng.randint(0, 255, (H, W, 3), np.uint8)
            slam.rng = _ConstDepthRng(np.random.RandomState(1000 + t))
            slam(t, img, intr)
        poses, tstamps = slam.terminate()
        return poses_to_trajectory(poses, tstamps)

    est_dev = run_oracle(DeviceVO(c, None, ht=H, wd=W, seed=3))
    est_hyb = run_oracle(HybridVO(c, None, ht=H, wd=W, seed=3))

    gt_wfc = np.asarray(lie.se3_inv(jnp.asarray(gt_poses)))
    gt = poses_to_trajectory(gt_wfc, np.arange(N_FRAMES))
    path_len = np.linalg.norm(np.diff(gt_wfc[:, :3], axis=0), axis=1).sum()

    err_dev = ate_rmse(est_dev, gt, correct_scale=True)
    err_hyb = ate_rmse(est_hyb, gt, correct_scale=True)
    cross = ate_rmse(est_dev, est_hyb, correct_scale=True)

    assert err_dev < 0.02 * path_len, f'device ATE {err_dev:.4f}'
    assert err_hyb < 0.02 * path_len, f'hybrid ATE {err_hyb:.4f}'
    # the two runtimes implement the same algorithm: trajectory agreement
    assert cross < 1e-2, f'inter-runtime ATE {cross:.5f}'


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
