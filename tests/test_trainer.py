"""Training-stack unit tests (the full DP step runs in dryrun_multichip)."""
import numpy as np
import jax.numpy as jnp
import pytest

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


def _tiny_batch(B=1, T=8, M=2, H=32, W=32, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        images=jnp.asarray(rng.randint(0, 255, (B, T, H, W, 3)),
                           jnp.float32),
        poses_gt=jnp.asarray(np.asarray(lie.se3_exp(jnp.asarray(
            rng.randn(B, T, 6).astype(np.float32) * 0.05)))),
        disps=jnp.asarray(rng.uniform(0.3, 1.5, (B, T, H // 4, W // 4)),
                          jnp.float32),
        intrinsics=jnp.tile(jnp.asarray([30.0, 30.0, W / 8, H / 8],
                                        jnp.float32), (B, 1)),
        coords=jnp.asarray(np.stack(
            [rng.randint(1, W // 4 - 1, (B, T, M)),
             rng.randint(1, H // 4 - 1, (B, T, M))], -1), jnp.float32),
        depth_init=jnp.asarray(rng.uniform(0.2, 1.0, (B, T, M)),
                               jnp.float32),
    )


def test_train_step_smoke_loss_decreases():
    """Single-device end-to-end train step: finite loss that the optimizer
    can push below its starting value (CI protection for the training graph
    independent of the multi-chip dryrun). The loss surface is nonconvex, so
    the assertion is min-over-run < start rather than monotone descent."""
    from dpvo_tpu.models.vonet import init_vonet_params
    from dpvo_tpu.train.trainer import make_optimizer, make_train_step

    sched = edge_schedule(8, 2, 2)
    params = {k: jnp.asarray(v) for k, v in init_vonet_params(0).items()}
    opt = make_optimizer(lr=1e-3, total_steps=100)
    opt_state = opt.init(params)
    step = make_train_step(opt, sched, structure_only=False,
                           mixed_precision=False)
    batch = _tiny_batch()

    losses = []
    for _ in range(6):
        params, opt_state, loss, aux = step(params, opt_state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert min(losses[1:]) < losses[0], losses


@pytest.mark.slow
def test_multichip_hlo_partitions_cleanly():
    """Compile the 8-device DP step and check the partitioner's work: the
    batch-sharded unroll must not all-gather batch-sized tensors (which
    would replicate per-sequence compute on every device). Grad reduction
    all-reduces are expected and allowed."""
    import re

    import jax
    from jax.sharding import Mesh
    from dpvo_tpu.models.vonet import init_vonet_params
    from dpvo_tpu.train.trainer import make_optimizer, make_train_step

    mesh = Mesh(np.array(jax.devices('cpu')[:8]), ('dp',))
    sched = edge_schedule(8, 2, 2)
    params = {k: jnp.asarray(v) for k, v in init_vonet_params(0).items()}
    opt = make_optimizer(lr=1e-3, total_steps=100)
    opt_state = opt.init(params)
    step = make_train_step(opt, sched, structure_only=False,
                           mixed_precision=False, mesh=mesh)
    batch = _tiny_batch(B=8)

    hlo = step.lower(params, opt_state, batch).compile().as_text()
    B, T, H, W = 8, 8, 32, 32
    # a full all-gather of the image batch (or anything of that order)
    # would mean the partitioner replicated the per-sequence forward
    batch_elems = B * T * H * W * 3
    for m in re.finditer(r'all-gather[^=]*=\s*\w+\[([\d,]+)\]', hlo):
        dims = [int(d) for d in m.group(1).split(',') if d]
        assert np.prod(dims) < batch_elems / 2, (
            f'batch-sized all-gather in DP step: {m.group(0)[:120]}')


def test_dropout_masks_alter_gradients():
    """corr-gradient dropout + edge removal change gradients but not the
    (edge-dropout-free) forward loss (reference net.py:161-172, 239-244)."""
    import jax
    from dpvo_tpu.models.vonet import init_vonet_params
    from dpvo_tpu.train.trainer import vonet_forward, trajectory_loss

    sched = edge_schedule(8, 2, 2)
    params0 = {k: jnp.asarray(v) for k, v in init_vonet_params(0).items()}
    from dpvo_tpu.models.vonet import VONetParams
    params = VONetParams(
        f32=params0,
        bf16={k: v.astype(jnp.bfloat16) for k, v in params0.items()})
    b = _tiny_batch()
    args = (b['images'][0], b['poses_gt'][0], b['disps'][0],
            b['intrinsics'][0], b['coords'][0], b['depth_init'][0])

    def loss_with(rng, corr_keep):
        def f(p):
            pp = VONetParams(
                f32=p, bf16={k: v.astype(jnp.bfloat16) for k, v in p.items()})
            traj = vonet_forward(pp, *args, sched, mixed_precision=False,
                                 rng=rng, corr_grad_keep=corr_keep,
                                 edge_dropout=0.0)
            return trajectory_loss(traj, b['poses_gt'][0])[0]
        return jax.value_and_grad(f)(params0)

    l_plain, g_plain = loss_with(None, 1.0)
    key = jnp.asarray([0, 7], jnp.uint32)
    l_drop, g_drop = loss_with(key, 0.2)

    # forward identical (dropout is gradient-only), gradients differ
    np.testing.assert_allclose(float(l_plain), float(l_drop), rtol=1e-5)
    diffs = [float(np.abs(np.asarray(g_plain[k] - g_drop[k])).max())
             for k in g_plain]
    assert max(diffs) > 0, 'corr-grad dropout did not change any gradient'
    # encoder weights are reached only through corr/imap paths: fnet grads
    # must be among those affected
    fkeys = [k for k in g_plain if k.startswith('patchify.fnet')]
    assert any(float(np.abs(np.asarray(g_plain[k] - g_drop[k])).max()) > 0
               for k in fkeys)
