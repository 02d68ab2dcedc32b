"""Evaluation utilities: Umeyama alignment + ATE RMSE golden tests."""
import numpy as np

from dpvo_tpu.evaluation import (PoseTrajectory3D, ate_rmse,
                                 umeyama_alignment)
from dpvo_tpu.loop_closure.optim import ransac_umeyama


def random_traj(n=50, seed=0):
    rng = np.random.RandomState(seed)
    pos = np.cumsum(rng.randn(n, 3) * 0.1, axis=0)
    quat = np.tile([1.0, 0, 0, 0], (n, 1))
    t = np.arange(n, dtype=float)
    return PoseTrajectory3D(pos, quat, t)


def test_ate_zero_for_identical():
    tr = random_traj()
    assert ate_rmse(tr, tr) < 1e-9


def test_ate_invariant_to_sim3():
    tr = random_traj()
    # apply a known Sim3 to the estimate: ATE should still be ~0
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0],
                  [0, 0, 1.0]])
    pos2 = 2.5 * tr.positions_xyz @ R.T + np.array([1.0, -2.0, 3.0])
    tr2 = PoseTrajectory3D(pos2, tr.orientations_quat_wxyz, tr.timestamps)
    assert ate_rmse(tr2, tr, correct_scale=True) < 1e-6


def test_umeyama_recovers_transform():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 30)
    ang = 0.3
    R_true = np.array([[1, 0, 0],
                       [0, np.cos(ang), -np.sin(ang)],
                       [0, np.sin(ang), np.cos(ang)]])
    y = 1.7 * R_true @ x + np.array([[0.5], [1.0], [-0.3]])
    R, t, c = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(c, 1.7, atol=1e-6)


def test_ransac_umeyama_with_outliers():
    rng = np.random.RandomState(2)
    src = rng.randn(200, 3)
    ang = -0.4
    R_true = np.array([[np.cos(ang), 0, np.sin(ang)],
                       [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
    dst = 0.8 * src @ R_true.T + np.array([2.0, 0.5, -1.0])
    # corrupt 30% with outliers
    out = rng.choice(200, 60, replace=False)
    dst[out] += rng.randn(60, 3) * 5.0
    R, t, s, ninl = ransac_umeyama(src, dst, iterations=200, threshold=0.05,
                                   seed=3)
    assert ninl >= 120
    np.testing.assert_allclose(R, R_true, atol=1e-3)
    np.testing.assert_allclose(s, 0.8, atol=1e-3)
