"""Correctness of the synthetic training world (data_readers/synthetic.py).

The learned-loop certification (scripts/train_synthetic.py,
tests/test_learned_ate.py) is only as good as the renderer: images, depth,
and poses must be mutually consistent or the network learns a broken
geometry. These tests verify photometric consistency under GT reprojection
— the exact invariant the VO system exploits.
"""
import numpy as np
import pytest

from dpvo_tpu.data_readers.synthetic import make_batch, make_sequence
from dpvo_tpu.runtime import numpy_se3 as nse3


def test_sequence_shapes_and_ranges():
    s = make_sequence(0, T=8, H=64, W=96)
    assert s['images'].shape == (8, 64, 96, 3)
    assert s['images'].dtype == np.uint8
    assert s['disps4'].shape == (8, 16, 24)
    assert np.all(s['disps4'] > 0.05) and np.all(s['disps4'] < 1.0)
    # enough texture for matching: nontrivial gradient energy
    g = np.abs(np.diff(s['images'][0].astype(np.float32), axis=1)).mean()
    assert g > 2.0, f'texture too flat: {g}'


def test_photometric_consistency_under_gt_reprojection():
    """Back-project pixels of frame a with GT depth, reproject into frame
    b with GT poses, and compare intensities — the renderer's images must
    agree with its own geometry to ~a few gray levels."""
    s = make_sequence(3, T=6, H=64, W=96)
    H, W = 64, 96
    fx, fy, cx, cy = s['intrinsics']
    a, b = 1, 2
    wfc = s['wfc']

    # depth at FULL res for frame a: use the 1/4-res disp grid upsampled
    # analytically is inexact; instead sample interior pixels on the 4-grid
    ys, xs = np.meshgrid(np.arange(6, H // 4 - 6), np.arange(6, W // 4 - 6),
                         indexing='ij')
    ys, xs = ys.ravel(), xs.ravel()
    z_a = 1.0 / s['disps4'][a, ys, xs]
    # full-res pixel centers of those 1/4-res cells
    u = (xs + 0.5) * 4.0
    v = (ys + 0.5) * 4.0

    d_c = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1)
    X_a = d_c * z_a[:, None]
    X_w = nse3.act(np.broadcast_to(wfc[a], (len(u), 7)), X_a)
    cfw_b = nse3.inv(wfc[b])
    X_b = nse3.act(np.broadcast_to(cfw_b, (len(u), 7)), X_w)
    ub = fx * X_b[:, 0] / X_b[:, 2] + cx
    vb = fy * X_b[:, 1] / X_b[:, 2] + cy

    ok = (ub > 1) & (ub < W - 2) & (vb > 1) & (vb < H - 2)
    assert ok.mean() > 0.5

    img_a = s['images'][a].astype(np.float32).mean(-1)
    img_b = s['images'][b].astype(np.float32).mean(-1)

    def bilin(img, uu, vv):
        # pixel i holds the intensity at center i+0.5 (renderer convention)
        xc, yc = uu - 0.5, vv - 0.5
        x0, y0 = np.floor(xc).astype(int), np.floor(yc).astype(int)
        fxs, fys = xc - x0, yc - y0
        return ((1 - fys) * ((1 - fxs) * img[y0, x0]
                             + fxs * img[y0, x0 + 1])
                + fys * ((1 - fxs) * img[y0 + 1, x0]
                         + fxs * img[y0 + 1, x0 + 1]))

    ia = bilin(img_a, u[ok], v[ok])
    ib = bilin(img_b, ub[ok], vb[ok])
    err = np.abs(ia - ib)
    assert np.median(err) < 6.0, f'median photometric error {np.median(err)}'


def test_batch_contract_matches_trainer():
    b = make_batch([0, 1], T=6, M=4, H=48, W=64)
    assert b['images'].shape == (2, 6, 48, 64, 3)
    assert b['poses_gt'].shape == (2, 6, 7)
    assert b['disps'].shape == (2, 6, 12, 16)
    assert b['intrinsics'].shape == (2, 4)
    assert b['coords'].shape == (2, 6, 4, 2)
    assert b['depth_init'].shape == (2, 6, 4)
    # w2c poses: unit quaternions
    q = b['poses_gt'][..., 3:7]
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
