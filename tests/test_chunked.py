"""Chunked dispatch (vo_frames lax.scan) == per-frame dispatch (vo_frame).

The scan body is the same traced function as the per-frame path, so feeding
identical images/coords/seeds must produce the same device state up to fp
reassociation. Guards the bench/eval throughput mode (`--chunk`).
"""
import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

from dpvo_tpu.config import cfg as default_cfg
from dpvo_tpu.models.vonet import VONetParams, init_vonet_params
from dpvo_tpu.runtime.device_vo import init_state, vo_frame, vo_frames


def _cfg():
    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 8
    c.BUFFER_SIZE = 64
    c.REMOVAL_WINDOW = 5
    c.OPTIMIZATION_WINDOW = 4
    c.PATCH_LIFETIME = 4
    c.KEYFRAME_INDEX = 2
    return c


def _static(c):
    return dict(
        M=c.PATCHES_PER_FRAME, pmem=36, mem=36,
        W=c.OPTIMIZATION_WINDOW, PCF=c.REMOVAL_WINDOW + 4,
        r=c.PATCH_LIFETIME, kf_index=c.KEYFRAME_INDEX,
        opt_window=c.OPTIMIZATION_WINDOW,
        removal_window=c.REMOVAL_WINDOW,
        kf_thresh=float(c.KEYFRAME_THRESH),
        motion_damping=float(c.MOTION_DAMPING),
        motion_model=c.MOTION_MODEL, mixed_precision=True,
        corr_impl='fused', force_accept=True)


def test_chunked_matches_per_frame():
    c = _cfg()
    H, W, M = 96, 128, c.PATCHES_PER_FRAME
    T, WARM = 18, 10
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (H + 4 * T, W + 6 * T, 3)).astype(np.uint8)
    frames = [base[2 * t:2 * t + H, 3 * t:3 * t + W] for t in range(T)]
    intr = np.array([80.0, 80.0, W / 2, H / 2], np.float32)
    coords = rng.randint(1, W // 4 - 1, (T, M, 2)).astype(np.float32)
    seeds = rng.rand(T, M).astype(np.float32)

    params = VONetParams.from_f32(init_vonet_params(0))
    kw = _static(c)

    sts = []
    for chunked in (False, True):
        st = init_state(c, H, W, intr)
        for t in range(WARM):
            st = vo_frame(params, st, jnp.asarray(frames[t]),
                          jnp.asarray(coords[t]), jnp.asarray(seeds[t]),
                          jnp.float32(t), **kw)
        if chunked:
            st = vo_frames(params, st,
                           jnp.asarray(np.stack(frames[WARM:T])),
                           jnp.asarray(coords[WARM:T]),
                           jnp.asarray(seeds[WARM:T]),
                           jnp.arange(WARM, T, dtype=jnp.float32), **kw)
        else:
            for t in range(WARM, T):
                st = vo_frame(params, st, jnp.asarray(frames[t]),
                              jnp.asarray(coords[t]), jnp.asarray(seeds[t]),
                              jnp.float32(t), **kw)
        sts.append(st)

    a, b = sts
    assert int(a.n) == int(b.n)
    n = int(a.n)
    np.testing.assert_allclose(np.asarray(a.poses[:n]),
                               np.asarray(b.poses[:n]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.depth[:n * M]),
                               np.asarray(b.depth[:n * M]),
                               rtol=1e-3, atol=1e-4)
