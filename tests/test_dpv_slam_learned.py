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


def _run(seq, net, loop_closure):
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
