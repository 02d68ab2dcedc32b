"""DPV-SLAM mode certified with LEARNED weights on a synthetic loop.

The reference's headline for DPV-SLAM is loop closure cutting drift
(EuRoC 0.0239 vs DPVO 0.1041, reference logs/dpv_slam/euroc.txt:14-25).
This is the in-repo analogue: the trained micro-VONet
(scripts/train_synthetic.py -> artifacts/micro_vonet.npz) tracks an
out-and-back synthetic sequence twice — pure VO vs LOOP_CLOSURE — and the
proximity edges + global BA must not worsen (and should reduce) the final
ATE. Skipped when the trained artifact is absent.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_NPZ = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'artifacts', 'micro_vonet.npz')


def _run(seq, net, loop_closure, pipeline=1):
    from dpvo_tpu.config import cfg as base_cfg
    from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
    from dpvo_tpu.runtime import DPVO

    images = seq['images']
    T, H, W, _ = images.shape

    cfg = base_cfg.clone()
    cfg.BUFFER_SIZE = 128
    cfg.PATCHES_PER_FRAME = 8
    cfg.PATCH_LIFETIME = 6
    cfg.REMOVAL_WINDOW = 12
    cfg.OPTIMIZATION_WINDOW = 10
    cfg.KEYFRAME_THRESH = -1.0
    cfg.MIXED_PRECISION = False
    cfg.LOOP_CLOSURE = bool(loop_closure)
    # the loop arc is ~T/2 frames; make revisit edges eligible + frequent
    cfg.GLOBAL_OPT_FREQ = 8
    cfg.BACKEND_THRESH = 64.0
    cfg.MIRROR_PIPELINE = int(pipeline)

    slam = DPVO(cfg, net, ht=H, wd=W, seed=7)
    if hasattr(slam, '_static'):
        slam._static['force_accept'] = True
    else:
        slam.motion_probe = lambda: 100.0
    for t in range(T):
        slam(t, images[t], seq['intrinsics'])
    poses, tstamps = slam.terminate()

    est = poses_to_trajectory(poses, tstamps)
    gt = poses_to_trajectory(seq['wfc'], np.arange(T))
    err = float(ate_rmse(est, gt, correct_scale=True))
    n_loop_edges = int(getattr(slam, '_n_loop_edges', 0))
    return err, n_loop_edges


@pytest.mark.skipif(not os.path.exists(_NPZ),
                    reason='run scripts/train_synthetic.py first')
def test_dpv_slam_loop_closure_on_synthetic_loop():
    from dpvo_tpu.data_readers.synthetic import make_sequence

    seq = make_sequence(950, T=40, H=64, W=96, step=0.12, loop=True)
    err_vo, _ = _run(seq, _NPZ, loop_closure=False)
    err_lc, n_loop = _run(seq, _NPZ, loop_closure=True)

    path = float(np.linalg.norm(np.diff(seq['wfc'][:, :3], axis=0),
                                axis=1).sum())
    print(f'dpv-slam synthetic loop: VO ATE {err_vo:.4f}, '
          f'LC ATE {err_lc:.4f}, loop edges {n_loop}, path {path:.2f}')

    assert np.isfinite(err_vo) and np.isfinite(err_lc)
    assert n_loop > 0, 'proximity loop closure proposed no edges on a revisit'
    # loop closure must not worsen the estimate, and when VO has real
    # drift (>1% of path) it must measurably reduce it
    assert err_lc <= err_vo * 1.05 + 1e-4
    if err_vo > 0.01 * path:
        assert err_lc < err_vo, (err_lc, err_vo)


@pytest.mark.skipif(not os.path.exists(_NPZ),
                    reason='run scripts/train_synthetic.py first')
def test_dpv_slam_pipelined_lc_matches_synchronous():
    """MIRROR_PIPELINE=2 routes global-BA frames through the deferred
    mirror queue (dispatch-only global BA, refresh riding the queue) —
    the trajectory must match the reference-synchronous MIRROR_PIPELINE=1
    run closely: only the host/device sync point moves, not the math.
    The device-side init recomputes the motion model in-graph, so the
    result is near-identical, not merely similar."""
    from dpvo_tpu.data_readers.synthetic import make_sequence

    seq = make_sequence(951, T=40, H=64, W=96, step=0.12, loop=True)
    err_sync, n_loop_sync = _run(seq, _NPZ, loop_closure=True, pipeline=1)
    err_pipe, n_loop_pipe = _run(seq, _NPZ, loop_closure=True, pipeline=2)

    path = float(np.linalg.norm(np.diff(seq['wfc'][:, :3], axis=0),
                                axis=1).sum())
    print(f'pipelined LC: sync ATE {err_sync:.4f} ({n_loop_sync} edges), '
          f'pipelined ATE {err_pipe:.4f} ({n_loop_pipe} edges), '
          f'path {path:.2f}')

    assert np.isfinite(err_sync) and np.isfinite(err_pipe)
    assert n_loop_pipe > 0, 'pipelined LC proposed no loop edges'
    # same math, shifted sync point: within 20% relative or 2% of path
    assert abs(err_pipe - err_sync) <= max(0.2 * err_sync, 0.02 * path), \
        (err_pipe, err_sync)
