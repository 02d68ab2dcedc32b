"""Training data pipeline on a synthetic on-disk TartanAir-format scene."""
import os

import cv2
import numpy as np
import pytest

from dpvo_tpu.data_readers.tartan import TartanAir
from dpvo_tpu.data_readers.rgbd_utils import (compute_distance_matrix_flow,
                                              induced_flow)
from dpvo_tpu.runtime import numpy_se3 as nse3


def make_scene(root, n=70, H=64, W=80):
    scene = root / 'env' / 'env' / 'Easy' / 'P001'
    (scene / 'image_left').mkdir(parents=True)
    (scene / 'depth_left').mkdir(parents=True)
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (H + 2 * n, W + 2 * n, 3), np.uint8)
    poses = []
    for t in range(n):
        img = base[t:t + H, 2 * t:2 * t + W]
        cv2.imwrite(str(scene / 'image_left' / f'{t:06d}.png'), img)
        depth = rng.uniform(4.0, 8.0, (H, W)).astype(np.float32)
        np.save(str(scene / 'depth_left' / f'{t:06d}.npy'), depth)
        # NED-format pose row: [x y z qx qy qz qw] permuted on load
        poses.append([0.05 * t, 0.02 * t, 0.0, 0, 0, 0, 1])
    np.savetxt(str(scene / 'pose_left.txt'), np.asarray(poses, float),
               delimiter=' ')
    return scene


def test_induced_flow_identity():
    poses = np.tile(nse3.identity(), (3, 1))
    disps = np.full((3, 8, 10), 0.5, np.float32)
    intr = np.tile(np.array([20.0, 20.0, 5.0, 4.0], np.float32), (3, 1))
    flow, valid = induced_flow(poses, disps, intr, np.array([0]),
                               np.array([1]))
    assert float(flow.max()) < 1e-4
    assert valid.all()


def test_distance_matrix_monotone():
    """Flow distance grows with baseline for a translating camera."""
    n = 5
    poses = np.stack([nse3.exp(np.array([0.4 * t, 0, 0, 0, 0, 0],
                                        np.float32)) for t in range(n)])
    # camera-to-world input (the function inverts internally)
    disps = np.full((n, 8, 10), 0.5, np.float32)
    intr = np.tile(np.array([20.0, 20.0, 5.0, 4.0], np.float32), (n, 1))
    d = compute_distance_matrix_flow(poses, disps, intr)
    assert d[0, 1] < d[0, 2] < d[0, 3]


def test_tartan_dataset(tmp_path):
    make_scene(tmp_path)
    db = TartanAir(datapath=str(tmp_path), n_frames=4,
                   crop_size=(48, 64), fmin=0.1, fmax=1e9,
                   scene_info_path=str(tmp_path / 'cache.pickle'))
    assert len(db) > 0
    images, poses, disps, intrinsics = db[0]
    assert images.shape == (4, 48, 64, 3)
    assert poses.shape == (4, 7)
    assert disps.shape == (4, 48, 64)
    assert intrinsics.shape == (4, 4)
    assert np.isfinite(disps).all() and (disps > 0).all()
    # scale normalization: 98th percentile of disps ~ 1/0.7
    q = np.quantile(disps, 0.98)
    np.testing.assert_allclose(q * 0.7, 1.0, rtol=0.05)
