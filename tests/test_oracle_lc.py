"""Loop-closure machinery certified with a GEOMETRY-TRUE oracle.

Drives the REAL hybrid runtime's DPV-SLAM path — proximity edge proposal
(loop_closure/proximity.py ≙ reference patchgraph.py:56-82), the inactive
edge store, gauge normalization (≙ patchgraph.py:84-95), and global BA over
active+inactive edges (ba_global.py ≙ reference dpvo.py:312-326 with
eff_impl) — with ground-truth reprojection targets computed from GT poses
AND GT depth sampled from the rendered world (data_readers/synthetic.py).

Why GT depth matters: an oracle that back-projects with the CURRENT
estimated depth produces targets entangled with the estimate's scale, and
`normalize()`'s mid-run gauge rescale then invalidates them — measured on
this exact sequence: est-depth oracle LC ATE 0.0116 (normalize on) /
0.0031 (normalize off) vs GT-depth oracle LC ATE 0.00006. A geometry-true
oracle's targets are consistent with the true scene up to gauge, so any
LC-mode ATE blow-up here is a real machinery regression, not an oracle
artifact.

Measured reference behavior (TPU, also reproduced on CPU): VO 0.00021,
LC 0.00006 — loop closure IMPROVES the oracle trajectory through the full
production path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dpvo_tpu import lie
from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.evaluation import ate_rmse, poses_to_trajectory
from dpvo_tpu.models.vonet import P

pytestmark = pytest.mark.slow


def make_gt_oracle(seq):
    """Target oracle from GT poses + GT inverse depth (bilinear at the
    patch center in the source frame, at feature resolution)."""
    gt = jnp.asarray(seq['poses_w2c'])     # (T, 7) cam-from-world
    disps = jnp.asarray(seq['disps4'])     # (T, H4, W4) inverse z-depth

    def oracle(poses, patch_xy, depth, intr, ii, jj, kk):
        c = patch_xy[kk][:, :, P // 2, P // 2]          # (E, 2) 1/4-res px
        H4, W4 = disps.shape[1], disps.shape[2]
        x = jnp.clip(c[:, 0], 0.0, W4 - 1.001)
        y = jnp.clip(c[:, 1], 0.0, H4 - 1.001)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx_ = x - x0
        fy_ = y - y0
        d = ((1 - fy_) * ((1 - fx_) * disps[ii, y0, x0]
                          + fx_ * disps[ii, y0, x0 + 1])
             + fy_ * ((1 - fx_) * disps[ii, y0 + 1, x0]
                      + fx_ * disps[ii, y0 + 1, x0 + 1]))
        d = jnp.maximum(d, 1e-4)

        fxi, fyi, cxi, cyi = [intr[ii][:, i] for i in range(4)]
        rx = (c[:, 0] - cxi) / fxi
        ry = (c[:, 1] - cyi) / fyi
        d_c = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
        Xw = lie.se3_act(lie.se3_inv(gt[ii]), d_c / d[:, None])
        Xj = lie.se3_act(gt[jj], Xw)
        z = jnp.maximum(Xj[:, 2], 1e-3)
        fxj, fyj, cxj, cyj = [intr[jj][:, i] for i in range(4)]
        target = jnp.stack([fxj * Xj[:, 0] / z + cxj,
                            fyj * Xj[:, 1] / z + cyj], axis=-1)
        return target, jnp.ones_like(target)

    return oracle


def _run(seq, loop_closure):
    from dpvo_tpu.runtime import HybridVO

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
    cfg.GLOBAL_OPT_FREQ = 8
    cfg.BACKEND_THRESH = 64.0
    slam = HybridVO(cfg, None, ht=H, wd=W, seed=7)
    slam._oracle = make_gt_oracle(seq)
    slam.motion_probe = lambda: 100.0
    for t in range(T):
        slam(t, images[t], seq['intrinsics'])
    poses, tstamps = slam.terminate()
    est = poses_to_trajectory(poses, tstamps)
    gt = poses_to_trajectory(seq['wfc'], np.arange(T))
    return (float(ate_rmse(est, gt, correct_scale=True)),
            int(getattr(slam, '_n_loop_edges', 0)))


def test_oracle_loop_closure_does_not_corrupt_and_converges():
    from dpvo_tpu.data_readers.synthetic import make_sequence

    seq = make_sequence(950, T=40, H=64, W=96, step=0.12, loop=True)
    path = float(np.linalg.norm(np.diff(seq['wfc'][:, :3], axis=0),
                                axis=1).sum())
    e_vo, _ = _run(seq, loop_closure=False)
    e_lc, n_loop = _run(seq, loop_closure=True)
    print(f'gt-depth oracle loop-seq: VO {e_vo:.5f}  LC {e_lc:.5f}  '
          f'loop_edges {n_loop}  path {path:.2f}')

    assert np.isfinite(e_vo) and np.isfinite(e_lc)
    assert n_loop > 0, 'proximity proposed no loop edges on a revisit'
    # VO sanity: oracle targets must track near-exactly (<0.1% of path)
    assert e_vo < 0.001 * path, (e_vo, path)
    # the LC path (loop edges + normalize + global BA over the inactive
    # store) must stay in the same near-exact regime — a machinery bug
    # here shows up orders of magnitude above this line
    assert e_lc < 0.001 * path, (e_lc, path)
    # and must not meaningfully worsen the VO solution
    assert e_lc <= 2.0 * e_vo + 1e-4, (e_lc, e_vo)
