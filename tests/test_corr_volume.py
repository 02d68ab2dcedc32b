"""Parity of the all-matmul 'volume' corr path vs the gather path.

The training step uses ops/corr.py with small feature maps, where the
window gather is replaced by one-hot matmuls (gather/scatter lower to
sequential loops on TPU). Forward AND gradients must match the gather
formulation exactly, including out-of-bounds zero-fill.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import importlib

# dpvo_tpu.ops.__init__ re-exports the corr FUNCTION under the same name,
# shadowing the submodule on attribute access
corr_mod = importlib.import_module('dpvo_tpu.ops.corr')


def _setup(seed=0, E=40, F=6, H=16, W=24, C=32, P=3):
    rng = np.random.RandomState(seed)
    gmap = jnp.asarray(rng.randn(F * 4, P, P, C).astype(np.float32))
    fmap = jnp.asarray(rng.randn(F, H, W, C).astype(np.float32))
    # coords straddle the borders: some windows fully inside, some partially
    # or fully outside (negative / beyond H,W)
    cx = rng.uniform(-6, W + 6, (E, P, P)).astype(np.float32)
    cy = rng.uniform(-6, H + 6, (E, P, P)).astype(np.float32)
    coords = jnp.asarray(np.stack([cx, cy], -1))
    ii = jnp.asarray(rng.randint(0, F * 4, E).astype(np.int32))
    jj = jnp.asarray(rng.randint(0, F, E).astype(np.int32))
    return gmap, fmap, coords, ii, jj


def _both_paths(fn):
    """Run fn under the volume gate and with the gate disabled."""
    orig = corr_mod._VOLUME_MAX_HW
    try:
        corr_mod._VOLUME_MAX_HW = 10 ** 9
        vol = fn()
        corr_mod._VOLUME_MAX_HW = 0
        gat = fn()
    finally:
        corr_mod._VOLUME_MAX_HW = orig
    return vol, gat


def test_volume_forward_matches_gather():
    gmap, fmap, coords, ii, jj = _setup()
    vol, gat = _both_paths(
        lambda: np.array(corr_mod.corr(gmap, fmap, coords, ii, jj,
                                       radius=3, chunk=16)))
    assert vol.shape == gat.shape
    np.testing.assert_allclose(vol, gat, rtol=1e-5, atol=1e-4)


def test_volume_gradients_match_gather():
    gmap, fmap, coords, ii, jj = _setup(seed=1, E=24)
    w = jnp.asarray(np.random.RandomState(2).randn(24, 7, 7, 3, 3)
                    .astype(np.float32))

    def loss(g, f):
        out = corr_mod.corr(g, f, coords, ii, jj, radius=3, chunk=8)
        return jnp.sum(out * w)

    grad_fn = jax.grad(loss, argnums=(0, 1))
    (gv, fv), (gg, fg) = _both_paths(lambda: jax.tree.map(
        np.array, grad_fn(gmap, fmap)))
    np.testing.assert_allclose(gv, gg, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(fv, fg, rtol=1e-5, atol=1e-4)
    # gradients actually reach both inputs
    assert np.abs(fv).max() > 0 and np.abs(gv).max() > 0
