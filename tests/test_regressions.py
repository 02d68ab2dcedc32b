"""Regression tests for round-2 fixes.

Covers: (1) graceful zero-update on BA solver failure (reference
dpvo/ba.py:12-37 posture), (2) the fused frame_step optimizing the NEWEST
pose (t1 off-by-one), (3) DeviceVO streaming more input frames than
BUFFER_SIZE when keyframe removal keeps the keyframe count bounded
(reference dpvo.py:383-384 guards on keyframes, not inputs).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dpvo_tpu import ba, lie
from dpvo_tpu.config import cfg as default_cfg

from test_ba import make_problem, residual_rms


# --------------------------------------------------------------------------
# (1) NaN guard: a poisoned / degenerate system must leave state unchanged
# --------------------------------------------------------------------------

def test_ba_nan_target_zero_update():
    """NaN targets make the Cholesky solve produce NaN under jit; the update
    must be dropped so poses and depths stay at their input values."""
    p = make_problem(n_frames=4, M=3)
    E = len(p['ii'])
    target = p['target'].copy()
    target[0] = np.nan

    poses, depth = ba.bundle_adjust(
        jnp.asarray(p['poses0']), jnp.asarray(p['xy']),
        jnp.asarray(p['depth0']), jnp.asarray(p['intr']),
        jnp.asarray(target), jnp.ones((E, 2), jnp.float32), 1e-4,
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        jnp.ones(E, bool), jnp.int32(1), jnp.int32(4), jnp.int32(0),
        W=6, PC=12, iterations=2)

    assert np.isfinite(np.asarray(poses)).all()
    assert np.isfinite(np.asarray(depth)).all()
    np.testing.assert_array_equal(np.asarray(poses), p['poses0'])


def test_ba_nan_weight_zero_update_structure_only():
    p = make_problem(n_frames=4, M=3)
    E = len(p['ii'])
    weight = np.ones((E, 2), np.float32)
    weight[1] = np.nan

    poses, depth = ba.bundle_adjust(
        jnp.asarray(p['poses_gt']), jnp.asarray(p['xy']),
        jnp.asarray(p['depth0']), jnp.asarray(p['intr']),
        jnp.asarray(p['target']), jnp.asarray(weight), 1e-4,
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        jnp.ones(E, bool), jnp.int32(1), jnp.int32(4), jnp.int32(0),
        W=6, PC=12, iterations=2, structure_only=True)

    assert np.isfinite(np.asarray(depth)).all()
    np.testing.assert_array_equal(np.asarray(depth), p['depth0'])


def test_ba_pairs_nan_target_zero_update():
    from dpvo_tpu.ba_pairs import bundle_adjust_pairs

    M, n_frames = 4, 6
    rng = np.random.RandomState(0)
    intr = jnp.asarray([100.0, 100.0, 64.0, 48.0])
    poses0 = np.asarray(lie.se3_exp(jnp.asarray(
        rng.randn(n_frames, 6).astype(np.float32) * 0.05)))
    centers = jnp.asarray(            # frame-major (N, 2M), see pair_centers
        rng.uniform(20, 100, (n_frames, 2 * M)).astype(np.float32))
    depth0 = jnp.asarray(rng.uniform(0.4, 1.2, n_frames * M).astype(np.float32))

    pi = np.array([0, 1, 2, 3, 4], np.int32)
    pj = np.array([1, 2, 3, 4, 5], np.int32)
    pv = np.ones(5, bool)
    GP = 8
    pi = np.pad(pi, (0, GP - 5))
    pj = np.pad(pj, (0, GP - 5))
    pv = np.pad(pv, (0, GP - 5))

    target = np.full((GP, M, 2), np.nan, np.float32)
    weight = np.ones((GP, M, 2), np.float32)

    poses, depth = bundle_adjust_pairs(
        jnp.asarray(poses0), centers, depth0, intr,
        jnp.asarray(target), jnp.asarray(weight), 1e-4,
        jnp.asarray(pi), jnp.asarray(pj), jnp.asarray(pv),
        jnp.int32(1), jnp.int32(n_frames), jnp.int32(0),
        M=M, W=8, PCF=6, iterations=2)

    assert np.isfinite(np.asarray(poses)).all()
    assert np.isfinite(np.asarray(depth)).all()
    np.testing.assert_array_equal(np.asarray(poses), poses0)


def test_train_ba_nan_zero_update():
    from dpvo_tpu.train.ba import bundle_adjust_train

    p = make_problem(n_frames=4, M=3)
    E = len(p['ii'])
    target = p['target'].copy()
    target[2] = np.nan
    bounds = jnp.asarray([-64.0, -64.0, 224.0, 184.0])

    poses, depth = bundle_adjust_train(
        jnp.asarray(p['poses0']), jnp.asarray(p['xy']),
        jnp.asarray(p['depth0']), jnp.asarray(p['intr']),
        jnp.asarray(target), jnp.ones((E, 2), jnp.float32),
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        bounds, W=3, PC=12, fixedp=1)

    assert np.isfinite(np.asarray(poses)).all()
    assert np.isfinite(np.asarray(depth)).all()
    np.testing.assert_array_equal(np.asarray(poses), p['poses0'])


# --------------------------------------------------------------------------
# (2) fused frame_step must optimize the newest pose (t1 = n + 1)
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_fused_step_updates_newest_pose():
    """After an initialized fused step with run_ba=True, the newest pose must
    move off the motion-model extrapolation (the GN update used to be
    computed for t1=n and discarded for the new frame)."""
    from dpvo_tpu.runtime import HybridVO
    from dpvo_tpu.runtime import numpy_se3 as nse3
    from test_runtime import synth_frames

    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 8
    c.BUFFER_SIZE = 64
    c.REMOVAL_WINDOW = 8
    c.OPTIMIZATION_WINDOW = 6
    c.PATCH_LIFETIME = 5
    c.KEYFRAME_INDEX = 2

    frames = synth_frames(n=16)
    H, W, _ = frames[0].shape
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)
    slam = HybridVO(c, None, ht=H, wd=W, seed=0)
    # random weights never pass the learned motion probe; force init so the
    # steady-state BA path actually runs (same trick as bench.py)
    slam.motion_probe = lambda: 100.0

    moved = 0
    checked = 0
    for t, img in enumerate(frames):
        if slam.is_initialized:
            # replicate the DAMPED_LINEAR extrapolation the runtime will use
            ns = slam.n
            P1, P2 = slam.poses_np[ns - 1], slam.poses_np[ns - 2]
            tl = [1, 1, 1] + slam.tlist + [t]
            a, b, cc = tl[-3], tl[-2], tl[-1]
            fac = (cc - b) / (b - a) if b != a else 1.0
            xi = c.MOTION_DAMPING * fac * nse3.log(nse3.mul(P1, nse3.inv(P2)))
            pose_init = nse3.mul(nse3.exp(xi), P1)
            slam(t, img, intr)
            slam._drain()   # mirrors are pipelined (MIRROR_PIPELINE);
            checked += 1    # sync before reading the host pose mirror
            newest = slam.poses_np[slam.n - 1]
            if not np.allclose(newest, pose_init, atol=1e-7):
                moved += 1
        else:
            slam(t, img, intr)

    assert checked >= 3
    # BA must move the newest pose on (at least most) steady-state frames
    assert moved >= checked - 1, (moved, checked)


# --------------------------------------------------------------------------
# (3) DeviceVO long sequences: inputs may exceed BUFFER_SIZE
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_devicevo_long_sequence_exceeds_buffer():
    """Stream more input frames than BUFFER_SIZE; heavy keyframe removal
    keeps st.n far below the buffer, so the run must complete (the old guard
    raised on input count). Mirrors KITTI: 4541 frames vs BUFFER_SIZE 4096."""
    from dpvo_tpu.runtime.device_driver import DeviceVO

    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 8
    c.BUFFER_SIZE = 20
    c.REMOVAL_WINDOW = 6
    c.OPTIMIZATION_WINDOW = 5
    c.PATCH_LIFETIME = 4
    c.KEYFRAME_INDEX = 2
    c.KEYFRAME_THRESH = 1000.0   # remove aggressively: every frame is static
    c.MIXED_PRECISION = True

    H, W = 96, 128
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (H * 2, W * 2, 3)).astype(np.uint8)
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    n_frames = 3 * c.BUFFER_SIZE // 2 + 4   # 34 > BUFFER_SIZE
    slam = DeviceVO(c, None, ht=H, wd=W, seed=0)
    for t in range(n_frames):
        dx, dy = 3 * min(t, 10), 2 * min(t, 10)   # move, then hold still
        slam(t, base[dy:dy + H, dx:dx + W], intr)

    poses, tstamps = slam.terminate()
    assert poses.shape == (n_frames, 7)
    assert np.isfinite(poses).all()
