"""Checkpoint compatibility end-to-end: torch .pth -> runtime tracking."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jit-heavy integration (see pytest.ini)

torch = pytest.importorskip('torch')

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.models.checkpoint import load_network, save_params_npz
from dpvo_tpu.models.vonet import init_vonet_params
from dpvo_tpu.runtime import DPVO


def _torch_state_dict_like_reference():
    """Build a state dict with the reference VONet's exact key set by
    round-tripping our init through torch tensors (incl. 'module.' prefixes
    and a legacy update.lmbda key, as dpvo.py:90-101 must handle)."""
    p = init_vonet_params(0)
    sd = {}
    for k, v in p.items():
        a = v
        if a.ndim == 4:                 # HWIO -> torch OIHW
            a = a.transpose(3, 2, 0, 1)
        elif a.ndim == 2 and k.endswith('.weight'):
            a = a.T
        sd['module.' + k] = torch.from_numpy(np.ascontiguousarray(a))
    sd['module.update.lmbda'] = torch.zeros(1)
    return sd, p


def test_pth_roundtrip(tmp_path):
    sd, orig = _torch_state_dict_like_reference()
    path = tmp_path / 'net.pth'
    torch.save(sd, path)
    loaded = load_network(str(path))
    assert set(loaded.keys()) == set(orig.keys())
    for k in orig:
        np.testing.assert_allclose(loaded[k], orig[k], atol=1e-6)


def test_npz_roundtrip(tmp_path):
    p = init_vonet_params(1)
    path = tmp_path / 'net.npz'
    save_params_npz(p, str(path))
    loaded = load_network(str(path))
    for k in p:
        np.testing.assert_array_equal(loaded[k], p[k])


def test_runtime_with_pth_checkpoint(tmp_path):
    sd, _ = _torch_state_dict_like_reference()
    path = tmp_path / 'net.pth'
    torch.save(sd, path)

    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 4
    c.BUFFER_SIZE = 32
    c.REMOVAL_WINDOW = 5
    c.OPTIMIZATION_WINDOW = 4
    c.PATCH_LIFETIME = 3
    c.KEYFRAME_INDEX = 2

    rng = np.random.RandomState(0)
    H, W = 64, 96
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    intr = np.array([60.0, 60.0, W / 2, H / 2], np.float32)

    slam = DPVO(c, str(path), ht=H, wd=W, seed=0)
    slam._static['force_accept'] = True
    for t in range(10):
        slam(t, base[2 * t:2 * t + H, 3 * t:3 * t + W], intr)
    poses, ts = slam.terminate()
    assert poses.shape == (10, 7) and np.isfinite(poses).all()
