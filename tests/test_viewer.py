"""Headless viewer: the 3D trajectory/point-cloud render path actually
draws (reference DPViewer renders frusta + cloud, viewer.cpp:104-218)."""
import os
import time

import numpy as np


def test_viewer_headless_3d(tmp_path):
    os.environ['MPLBACKEND'] = 'Agg'
    from dpvo_tpu.viz.viewer import Viewer

    v = Viewer(outdir=str(tmp_path), live=False)
    rng = np.random.RandomState(0)

    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (12, 1))
    poses[:, 0] = np.linspace(0, 2.0, 12)          # camera track along x
    pts = rng.randn(200, 3).astype(np.float32) + np.array([1, 0, 3])
    clr = rng.randint(0, 255, (200, 3)).astype(np.float32)

    v.update_image(rng.randint(0, 255, (48, 64, 3)).astype(np.uint8))
    v.update_state(poses, pts, clr)

    deadline = time.time() + 30
    while time.time() < deadline:
        if any(f.startswith('traj3d') for f in os.listdir(tmp_path)):
            break
        time.sleep(0.2)
    v.join()

    files = os.listdir(tmp_path)
    assert any(f.startswith('traj3d') and f.endswith('.png')
               for f in files), files
