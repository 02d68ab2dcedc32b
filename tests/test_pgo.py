"""Sim3 pose-graph optimization: loop constraint corrects drifted chain."""
import numpy as np
import pytest
import jax.numpy as jnp

from dpvo_tpu import lie
from dpvo_tpu.loop_closure import pgo


@pytest.mark.slow
def test_pgo_closes_loop():
    """Odometry chain with injected drift + a perfect loop constraint: PGO
    should distribute the correction so endpoints coincide."""
    rng = np.random.RandomState(0)
    n = 24

    # ground-truth world-to-camera trajectory (a loop)
    xi = np.zeros((n, 6), np.float32)
    xi[:, 0] = 0.3                   # step forward
    xi[:, 4] = 2 * np.pi / n         # turn -> closes a circle
    poses_gt = [lie.se3_identity()]
    for i in range(1, n):
        poses_gt.append(np.asarray(lie.se3_mul(
            lie.se3_exp(jnp.asarray(xi[i])), jnp.asarray(poses_gt[-1]))))
    poses_gt = np.stack(poses_gt)

    # drifted estimate: perturb each odometry step slightly
    poses_est = [poses_gt[0]]
    for i in range(1, n):
        noise = rng.randn(6).astype(np.float32) * 0.01
        step = lie.se3_mul(lie.se3_exp(jnp.asarray(xi[i] + noise)),
                           jnp.asarray(poses_est[-1]))
        poses_est.append(np.asarray(step))
    poses_est = np.stack(poses_est)

    # loop constraint between last and first from GT relative pose
    # constants convention: C = Tj * Ti^-1 with T = Sim3(pose).Inv()
    Ti = lie.sim3_inv(jnp.asarray(pgo.se3_to_sim3(poses_gt[n - 1])))
    Tj = lie.sim3_inv(jnp.asarray(pgo.se3_to_sim3(poses_gt[0])))
    dS = np.asarray(lie.sim3_mul(Tj, lie.sim3_inv(Ti)))[None]

    ii = np.array([n - 1])
    jj = np.array([0])

    out = pgo.perform_updates(poses_est, dS, ii, jj, iters=30)

    # residual of the loop constraint after optimization should be tiny
    Ti_o = lie.sim3_inv(jnp.asarray(out[n - 1]))
    Tj_o = lie.sim3_inv(jnp.asarray(out[0]))
    rel = np.asarray(lie.sim3_log(lie.sim3_mul(
        jnp.asarray(dS[0]),
        lie.sim3_mul(lie.sim3_inv(jnp.asarray(out[n - 1])),
                     jnp.asarray(out[0])))))
    # note: residual convention Log(C Exp(Gi) Exp(Gj)^-1), Gi=log(T_i^-1)...
    # simpler check: endpoint error vs GT shrinks dramatically
    def endpoint_err(poses8):
        c0 = np.asarray(lie.sim3_inv(jnp.asarray(poses8[0])))[..., :3]
        cN = np.asarray(lie.sim3_inv(jnp.asarray(poses8[-1])))[..., :3]
        g0 = np.asarray(lie.se3_inv(jnp.asarray(poses_gt[0])))[..., :3]
        gN = np.asarray(lie.se3_inv(jnp.asarray(poses_gt[-1])))[..., :3]
        return np.linalg.norm((cN - c0) - (gN - g0))

    err_before = endpoint_err(pgo.se3_to_sim3(poses_est))
    err_after = endpoint_err(out)
    assert err_after < err_before * 0.2, (err_before, err_after)
