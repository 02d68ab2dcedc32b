"""Big-feature-ring gather remap (LOOP_CLOSURE pmem = MAX_EDGE_AGE).

The host remaps edge patch-slots onto a compacted <=REMAP_CAP-frame table
(runtime/dpvo.py:_edge_table) and the device gathers in two stages
(runtime/state.py:_gather_patch_rows). Verifies (a) the remapped gather
returns exactly the same rows as direct indexing, and (b) the hybrid
runtime stays finite end-to-end with the remap engaged.
"""
import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.runtime import HybridVO
from dpvo_tpu.runtime.state import REMAP_CAP, _gather_patch_rows


def test_gather_remap_matches_direct():
    rng = np.random.RandomState(0)
    M, pmem, K = 16, 640, 32          # pmem*M = 10240 > 8192
    buf = jnp.asarray(rng.randn(pmem * M, K).astype(np.float32))

    frames = rng.choice(pmem, 40, replace=False)
    E = 500
    ef = frames[rng.randint(0, len(frames), E)]
    em = rng.randint(0, M, E)
    kk_slot_direct = ef * M + em

    lut = np.zeros(pmem, np.int64)
    uf = np.unique(ef)
    lut[uf] = np.arange(len(uf))
    kk_remap = lut[ef] * M + em
    used = np.zeros(REMAP_CAP, np.int64)
    used[:len(uf)] = uf

    out = _gather_patch_rows(buf, jnp.asarray(kk_remap),
                             jnp.asarray(used), M, True)
    ref = np.asarray(buf)[kk_slot_direct]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_hybrid_lc_runtime_with_remap():
    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 16          # MAX_EDGE_AGE*16 = 16000 -> remap on
    c.BUFFER_SIZE = 64
    c.REMOVAL_WINDOW = 5
    c.OPTIMIZATION_WINDOW = 4
    c.PATCH_LIFETIME = 4
    c.KEYFRAME_INDEX = 2
    c.LOOP_CLOSURE = True
    c.GLOBAL_OPT_FREQ = 6

    H, W = 96, 128
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (H + 80, W + 120, 3)).astype(np.uint8)
    frames = [base[2 * t:2 * t + H, 3 * t:3 * t + W] for t in range(18)]
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)

    slam = HybridVO(c, None, ht=H, wd=W, seed=0)
    assert slam.pmem == c.MAX_EDGE_AGE
    slam.motion_probe = lambda: 100.0
    for t, img in enumerate(frames):
        slam(t, img, intr)
    poses, tstamps = slam.terminate()
    assert poses.shape == (len(frames), 7)
    assert np.isfinite(poses).all()
