"""Multi-stream VO sharded over the 8-device CPU mesh."""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # jit-heavy integration (see pytest.ini)

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.models.vonet import VONetParams, init_vonet_params
from dpvo_tpu.parallel.streams import MultiStreamVO


@pytest.mark.skipif(len(jax.devices()) < 2, reason='needs a multi-device mesh')
def test_multistream_lockstep():
    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 4
    c.BUFFER_SIZE = 32
    c.REMOVAL_WINDOW = 5
    c.OPTIMIZATION_WINDOW = 4
    c.PATCH_LIFETIME = 3
    c.KEYFRAME_INDEX = 2

    H, W = 64, 96
    params = VONetParams.from_f32(init_vonet_params(0))
    intr = np.array([60.0, 60.0, W / 2, H / 2], np.float32)

    mv = MultiStreamVO(c, params, H, W, intr)
    B = mv.B
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)

    for t in range(10):
        imgs = np.stack([base[2 * t:2 * t + H, (3 * t + b):(3 * t + b) + W]
                         for b in range(B)])
        mv(np.full(B, float(t)), imgs)

    n = np.asarray(mv.states.n)
    assert n.shape == (B,)
    assert (n >= 1).all()
    poses = np.asarray(mv.states.poses)
    assert np.isfinite(poses).all()
