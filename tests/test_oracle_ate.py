"""Accuracy evidence without datasets/checkpoints: oracle-target VO.

Drives the REAL hybrid runtime (patch lifecycle, motion model, windowed BA,
keyframing disabled-removal, terminate refinement) with ground-truth
reprojection targets in place of the learned update operator, on a synthetic
scene with known geometry (a fronto-parallel world plane) and a known
trajectory. The recovered trajectory must match ground truth in ATE after
Sim3 alignment (the reference's eval protocol, evaluate_tartan.py:60-67).

This certifies the whole geometric core end-to-end: reprojection math,
edge scheduling, bundle adjustment (Hessian assembly, Schur, retraction),
window/patch bookkeeping, trajectory fill-in and pose inversion at
terminate (reference dpvo.py:173-198).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dpvo_tpu import lie
from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
from dpvo_tpu.models.vonet import P

H, W = 64, 96
PLANE_Z = 3.0          # world plane z = const, cameras look down +z
N_FRAMES = 30


def make_gt_poses(n):
    """Smooth cam-from-world trajectory: translate in x, wobble in z/yaw.

    Scaled so inter-frame flow at the 1/4-res feature scale is ~2 px —
    the regime the reference operates in (KEYFRAME_THRESH 12.5 full-res px,
    config.py:21) — weak-parallax scenes leave depth unobservable and BA
    ill-conditioned regardless of implementation.
    """
    rng = np.random.RandomState(0)
    poses = np.zeros((n, 7), np.float32)
    for i in range(n):
        t = i * 0.25
        yaw = 0.03 * np.sin(0.2 * i)
        # world-from-cam: position, then invert to cam-from-world
        pos = np.array([t, 0.05 * np.sin(0.3 * i), 0.1 * np.sin(0.17 * i)])
        q = np.array([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
        wfc = np.concatenate([pos, q]).astype(np.float32)
        poses[i] = np.asarray(lie.se3_inv(jnp.asarray(wfc)))
    return poses


def make_oracle(gt_poses_np):
    gt = jnp.asarray(gt_poses_np)

    def oracle(poses, patch_xy, depth, intr, ii, jj, kk):
        c = patch_xy[kk][:, :, P // 2, P // 2]        # (E, 2) 1/RES pixels
        fxi, fyi, cxi, cyi = [intr[ii][:, i] for i in range(4)]
        rx = (c[:, 0] - cxi) / fxi
        ry = (c[:, 1] - cyi) / fyi
        d_c = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
        Pi_inv = lie.se3_inv(gt[ii])                  # world-from-cam i
        o_w = Pi_inv[:, :3]
        d_w = lie.quat_rotate(Pi_inv[:, 3:7], d_c)
        lam = (PLANE_Z - o_w[:, 2]) / d_w[:, 2]
        X_w = o_w + lam[:, None] * d_w
        X_j = lie.se3_act(gt[jj], X_w)
        fxj, fyj, cxj, cyj = [intr[jj][:, i] for i in range(4)]
        Z = jnp.maximum(X_j[:, 2], 0.1)
        tx = fxj * X_j[:, 0] / Z + cxj
        ty = fyj * X_j[:, 1] / Z + cyj
        target = jnp.stack([tx, ty], axis=-1)
        weight = jnp.ones_like(target)
        return target, weight

    return oracle


class _ConstDepthRng:
    """rng wrapper: constant inverse-depth seeds, pass-through otherwise.

    With FIXED oracle targets, uniform-random inverse depth (the reference's
    'TODO better depth initialization', dpvo.py:427) throws Gauss-Newton
    into local minima — the real system escapes because the learned update
    re-predicts targets from the current state each iteration. A constant
    seed keeps the test about what it certifies: geometry + BA + scheduling,
    not stochastic-init robustness (verified: isolated BA converges from
    constant init and diverges from uniform-random init on the same scene).
    """

    def __init__(self, rng):
        self._rng = rng

    def rand(self, *shape):
        return np.full(shape, 0.5)

    def __getattr__(self, name):
        return getattr(self._rng, name)


@pytest.mark.slow
def test_oracle_vo_recovers_trajectory():
    from dpvo_tpu.runtime.dpvo import DPVO

    cfg = base_cfg.clone()
    cfg.BUFFER_SIZE = 64
    cfg.PATCHES_PER_FRAME = 4
    cfg.PATCH_LIFETIME = 5
    # REMOVAL_WINDOW must exceed the 8-frame bootstrap so the long-range-edge
    # test (ii < n - REMOVAL_WINDOW - 1, reference dpvo.py:348) doesn't route
    # the very first update through global BA — same regime as the
    # reference's defaults (REMOVAL_WINDOW 22 > 8).
    cfg.REMOVAL_WINDOW = 10
    cfg.OPTIMIZATION_WINDOW = 10
    cfg.KEYFRAME_THRESH = -1.0       # never remove: slot index == frame index
    cfg.MIXED_PRECISION = False

    gt_poses = make_gt_poses(N_FRAMES)
    oracle = make_oracle(gt_poses)

    slam = DPVO(cfg, None, ht=H, wd=W, seed=3)
    slam._oracle = oracle
    slam.motion_probe = lambda: 100.0     # force init (no learned probe)
    slam.rng = _ConstDepthRng(slam.rng)   # well-conditioned depth seeds

    rng = np.random.RandomState(1)
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)
    for t in range(N_FRAMES):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        slam(t, img, intr)

    poses, tstamps = slam.terminate()

    # ground-truth trajectory in the same convention (world-from-cam xyzquat)
    gt_wfc = np.asarray(lie.se3_inv(jnp.asarray(gt_poses)))
    est = poses_to_trajectory(poses, tstamps)
    gt = poses_to_trajectory(gt_wfc, np.arange(N_FRAMES))
    err = ate_rmse(est, gt, correct_scale=True)

    path_len = np.linalg.norm(np.diff(gt_wfc[:, :3], axis=0), axis=1).sum()
    assert np.isfinite(err)
    # oracle targets + exact BA should land well under 2% of path length
    assert err < 0.02 * path_len, f'ATE {err:.4f} vs path {path_len:.3f}'


def make_gt_poses_dwell(n, dwell=(12, 19), step=0.25, dwell_step=0.05):
    """Trajectory with a mid-sequence DWELL (slow segment): frames in
    [dwell[0], dwell[1]) advance by dwell_step instead of step, so their
    center flow drops under an active KEYFRAME_THRESH and the in-graph
    keyframe-removal path actually fires (device_vo.py:519-549; reference
    dpvo.py:266-310)."""
    rng = np.random.RandomState(0)
    del rng
    poses = np.zeros((n, 7), np.float32)
    x = 0.0
    for i in range(n):
        yaw = 0.03 * np.sin(0.2 * i)
        pos = np.array([x, 0.05 * np.sin(0.3 * i), 0.1 * np.sin(0.17 * i)])
        q = np.array([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
        wfc = np.concatenate([pos, q]).astype(np.float32)
        poses[i] = np.asarray(lie.se3_inv(jnp.asarray(wfc)))
        x += dwell_step if dwell[0] <= i < dwell[1] else step
    return poses


@pytest.mark.slow
def test_oracle_vo_with_keyframe_removal():
    """Keyframe removal under an ATE assertion (device runtime).

    KEYFRAME_THRESH is ACTIVE and a dwell makes removal fire repeatedly;
    the final trajectory must still match ground truth INCLUDING the
    removed (non-keyframe) input frames, whose poses are reconstructed at
    terminate via the delta chain (device_vo.py:527-541 -> delta_src /
    delta_pose; reference dpvo.py:185-190). A wrong delta_pose composition
    or wrong post-removal edge re-indexing fails this test."""
    from dpvo_tpu.runtime.device_driver import DeviceVO
    from dpvo_tpu.utils.fetch import fetch

    cfg = base_cfg.clone()
    cfg.BUFFER_SIZE = 64
    cfg.PATCHES_PER_FRAME = 4
    cfg.PATCH_LIFETIME = 5
    cfg.REMOVAL_WINDOW = 10
    cfg.OPTIMIZATION_WINDOW = 10
    # ACTIVE: moving frames ~1.7 px center flow at the feature scale,
    # dwell frames ~0.35 px -> dwell keyframes get removed
    cfg.KEYFRAME_THRESH = 0.8
    cfg.MIXED_PRECISION = False

    gt_poses = make_gt_poses_dwell(N_FRAMES)
    oracle = make_oracle(gt_poses)
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    slam = DeviceVO(cfg, None, ht=H, wd=W, seed=3)
    slam._oracle = oracle
    slam._static['force_accept'] = True

    rng = np.random.RandomState(1)
    for t in range(N_FRAMES):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        slam.rng = _ConstDepthRng(np.random.RandomState(1000 + t))
        slam(t, img, intr)

    n_keyframes = int(fetch(slam.st.n))
    poses, tstamps = slam.terminate()

    # the dwell must have triggered real removals, else this test is vacuous
    removed = N_FRAMES - n_keyframes
    assert removed >= 3, f'keyframe removal never fired (removed={removed})'
    assert poses.shape[0] == N_FRAMES      # fill-in covers removed frames

    gt_wfc = np.asarray(lie.se3_inv(jnp.asarray(gt_poses)))
    est = poses_to_trajectory(poses, tstamps)
    gt = poses_to_trajectory(gt_wfc, np.arange(N_FRAMES))
    err = ate_rmse(est, gt, correct_scale=True)
    path_len = np.linalg.norm(np.diff(gt_wfc[:, :3], axis=0), axis=1).sum()
    assert np.isfinite(err)
    assert err < 0.01 * path_len, f'ATE {err:.4f} vs path {path_len:.3f}'
