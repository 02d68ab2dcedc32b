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


def test_html_viewer_payload_roundtrip(tmp_path):
    """The interactive HTML artifact embeds the exact point/pose payload
    (base64 float32/uint8) and a complete document — the headless
    counterpart of the reference's Pangolin viewer
    (DPViewer/dpviewer/viewer.cpp:19-313)."""
    import base64
    import re

    from dpvo_tpu.viz.html_viewer import save_html_viewer

    rng = np.random.RandomState(0)
    N, M = 6, 500
    poses = np.zeros((N, 7), np.float32)
    poses[:, 0] = np.arange(N)
    poses[:, 6] = 1.0
    pts = rng.randn(M, 3).astype(np.float32)
    clr = (rng.rand(M, 3) * 255).astype(np.uint8)

    path = str(tmp_path / 'v.html')
    save_html_viewer(path, poses, pts, clr, title='t')
    html = open(path).read()

    assert html.startswith('<!DOCTYPE html>') and '</html>' in html
    assert html.count('<script>') == html.count('</script>') == 1

    m = re.search(r'PTS = "([^"]*)"', html)
    dec = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    dec = dec.reshape(-1, 3)
    # the saver filters non-finite/outlier points; here all survive
    np.testing.assert_array_equal(dec, pts)

    m = re.search(r'TRAJ = "([^"]*)"', html)
    traj = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    np.testing.assert_array_equal(traj.reshape(-1, 3), poses[:, :3])

    m = re.search(r'SEG = "([^"]*)"', html)
    seg = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    assert seg.shape[0] == N * 8 * 2 * 3      # 8 frustum edges per pose


def test_html_viewer_filters_bad_points(tmp_path):
    import base64
    import re

    from dpvo_tpu.viz.html_viewer import save_html_viewer

    pts = np.array([[0, 0, 0], [1, 1, 1], [np.nan, 0, 0], [1e9, 0, 0]],
                   np.float32)
    clr = np.full((4, 3), 128, np.uint8)
    poses = np.array([[0, 0, 0, 0, 0, 0, 1]], np.float32)
    path = str(tmp_path / 'v.html')
    save_html_viewer(path, poses, pts, clr)
    html = open(path).read()
    m = re.search(r'PTS = "([^"]*)"', html)
    dec = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    assert dec.shape[0] == 2 * 3              # nan + outlier dropped
