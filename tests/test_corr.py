"""Correlation op tests: XLA reference vs NumPy golden + Pallas parity."""
import numpy as np
import jax.numpy as jnp
import pytest

from dpvo_tpu.ops.corr import corr as corr_xla

RNG = np.random.RandomState(5)


def make_inputs(E=12, F=4, H=40, W=48, C=32, Pp=3, spread=1.5):
    gmap = RNG.randn(8, Pp, Pp, C).astype(np.float32)
    fmap = RNG.randn(F, H, W, C).astype(np.float32)
    # coords comfortably inside, patch pixels spread ~spread px
    cx = RNG.uniform(10, W - 10, (E, 1, 1))
    cy = RNG.uniform(10, H - 10, (E, 1, 1))
    dx = np.linspace(-spread, spread, Pp)[None, None, :]
    dy = np.linspace(-spread, spread, Pp)[None, :, None]
    coords = np.stack([cx + dx + RNG.rand(E, Pp, Pp) * 0.5,
                       cy + dy + RNG.rand(E, Pp, Pp) * 0.5], axis=-1)
    ii = RNG.randint(0, 8, E)
    jj = RNG.randint(0, F, E)
    return gmap, fmap, coords.astype(np.float32), ii, jj


def corr_numpy(gmap, fmap, coords, ii, jj, radius=3):
    """Literal reimplementation of correlation_kernel.cu:83-232."""
    E, Pp = coords.shape[0], coords.shape[1]
    D = 2 * radius + 2
    H, W, C = fmap.shape[1:]
    out = np.zeros((E, Pp, Pp, D, D), np.float32)
    for e in range(E):
        g = gmap[ii[e]]
        f = fmap[jj[e]]
        for py in range(Pp):
            for px in range(Pp):
                x, y = coords[e, py, px]
                for wy in range(D):
                    for wx in range(D):
                        i1 = int(np.floor(y)) + wy - radius
                        j1 = int(np.floor(x)) + wx - radius
                        if 0 <= i1 < H and 0 <= j1 < W:
                            out[e, py, px, wy, wx] = np.dot(
                                g[py, px], f[i1, j1])
    # bilinear blend
    fx = (coords[..., 0] - np.floor(coords[..., 0]))[..., None, None]
    fy = (coords[..., 1] - np.floor(coords[..., 1]))[..., None, None]
    d = D - 1
    res = ((1 - fx) * (1 - fy) * out[..., :d, :d] +
           fx * (1 - fy) * out[..., :d, 1:] +
           (1 - fx) * fy * out[..., 1:, :d] +
           fx * fy * out[..., 1:, 1:])
    return res.transpose(0, 4, 3, 1, 2)   # (E, dx, dy, py, px)


def test_xla_corr_matches_numpy():
    gmap, fmap, coords, ii, jj = make_inputs()
    ref = corr_numpy(gmap, fmap, coords, ii, jj)
    out = np.asarray(corr_xla(jnp.asarray(gmap), jnp.asarray(fmap),
                              jnp.asarray(coords), jnp.asarray(ii),
                              jnp.asarray(jj), radius=3, chunk=8))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-4)


def test_xla_corr_out_of_bounds_zero():
    gmap, fmap, coords, ii, jj = make_inputs()
    coords = coords - 25.0  # push part of the windows off the image
    ref = corr_numpy(gmap, fmap, coords, ii, jj)
    out = np.asarray(corr_xla(jnp.asarray(gmap), jnp.asarray(fmap),
                              jnp.asarray(coords), jnp.asarray(ii),
                              jnp.asarray(jj), radius=3, chunk=8))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-4)


