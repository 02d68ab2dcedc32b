"""End-to-end CLI smoke: demo.py on a generated image directory.

Covers the user-facing wiring (reference entry point demo.py:59-99) that
unit tests miss: the spawn frame-reader process, calib parsing, runtime
construction from CLI flags, terminate, and every artifact writer
(--save_trajectory, --plot, --save_ply, --save_html). Random weights mean
the motion probe never passes — patchify + probe + I/O run end to end and
the trajectory is all-identity, which is exactly the wiring this certifies.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_demo_cli_end_to_end(tmp_path):
    import cv2

    seq = tmp_path / 'seq'
    seq.mkdir()
    rng = np.random.RandomState(0)
    base = cv2.GaussianBlur(
        rng.randint(0, 255, (260, 360, 3)).astype(np.uint8), (0, 0), 2)
    H, W = 120, 160
    for t in range(16):
        cv2.imwrite(str(seq / f'{t:06d}.png'),
                    base[4 * t:4 * t + H, 6 * t:6 * t + W])
    calib = tmp_path / 'calib.txt'
    calib.write_text('120.0 120.0 80.0 60.0')

    out = tmp_path / 'out'
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    r = subprocess.run(
        [sys.executable, 'demo.py',
         '--imagedir', str(seq), '--calib', str(calib),
         '--network', 'none', '--stride', '1', '--name', 'cli_smoke',
         '--save_trajectory', '--plot', '--save_ply', '--save_html',
         '--opts', 'BUFFER_SIZE', '64'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f'stdout:\n{r.stdout}\nstderr:\n{r.stderr}'

    traj = os.path.join(REPO, 'saved_trajectories', 'cli_smoke.txt')
    assert os.path.exists(traj)
    lines = open(traj).read().strip().splitlines()
    assert len(lines) == 16                      # one TUM row per input frame
    assert all(len(ln.split()) == 8 for ln in lines)

    plot = os.path.join(REPO, 'trajectory_plots', 'cli_smoke.pdf')
    assert os.path.exists(plot) and os.path.getsize(plot) > 0

    ply = os.path.join(REPO, 'cli_smoke.ply')
    assert os.path.exists(ply) and os.path.getsize(ply) > 0

    html = os.path.join(REPO, 'cli_smoke.html')
    assert os.path.exists(html)
    body = open(html).read()
    assert 'WebGL' in body or 'webgl' in body or '<canvas' in body

    for f in (ply, html):
        os.remove(f)
