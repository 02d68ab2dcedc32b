"""Training-stack unit tests (the full DP step runs in dryrun_multichip)."""
import numpy as np
import jax.numpy as jnp

from dpvo_tpu import lie
from dpvo_tpu.train.trainer import (edge_schedule, kabsch_umeyama_scale,
                                    trajectory_loss)


def test_edge_schedule_shapes():
    T, M, steps = 10, 4, 4
    sched = edge_schedule(T, M, steps)
    assert len(sched) == steps
    ii0, jj0, kk0, nf0, n0 = sched[0]
    # initial graph: patches of frames < 8 x frames 0..7 (net.py:208)
    assert len(ii0) == 8 * M * 8
    assert nf0 is None and n0 == 8
    # frames introduced after step 8 would grow the graph; steps < 8 keep it
    for s in range(1, steps):
        assert len(sched[s][0]) == len(ii0)


def test_edge_schedule_growth():
    T, M = 10, 4
    sched = edge_schedule(T, M, 12)
    # steps 8, 9 introduce frames 8 and 9
    assert sched[8][3] == 8 and sched[9][3] == 9
    assert sched[10][3] is None  # no frames left
    E8 = len(sched[8][0])
    E7 = len(sched[7][0])
    # old patches -> new frame (8M) + new patches -> frames 0..8 (M*9)
    assert E8 - E7 == 8 * M + 9 * M


def test_kabsch_scale():
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(20, 3).astype(np.float32))
    B = A * 0.25
    s = float(kabsch_umeyama_scale(A, B))
    np.testing.assert_allclose(s, 4.0, rtol=1e-4)


def test_trajectory_loss_zero_when_exact():
    T = 6
    poses_gt = jnp.asarray(
        np.asarray(lie.se3_exp(jnp.asarray(
            np.random.RandomState(0).randn(T, 6).astype(np.float32) * 0.1))))
    E, P = 10, 3
    sup = jnp.ones((E,), bool)
    valid = jnp.ones((E, P, P), jnp.float32)
    co = jnp.asarray(np.random.RandomState(1).rand(E, P, P, 2).astype(np.float32))
    traj = [(sup, valid, co, co, poses_gt, T)] * 3
    loss, aux = trajectory_loss(traj, poses_gt)
    assert float(loss) < 1e-5
