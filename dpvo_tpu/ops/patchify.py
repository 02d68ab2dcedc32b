"""Patch extraction (gather + bilinear) — TPU-native `altcorr.patchify`.

Replaces the reference CUDA patchify kernels
(dpvo/altcorr/correlation_kernel.cu:17-80 and correlation.py:51-68) with an
XLA gather formulation. Feature maps are channels-last (H, W, C) so each
gathered pixel is one contiguous 128/384-float row — the layout XLA/TPU DMAs
like. Out-of-bounds taps contribute zeros, matching the reference's
`within_bounds` guard on a zero-initialized output.

JAX autodiff provides the backward (scatter-add) pass for training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_window(fmap, coords, radius):
    """Gather integer (2R+2)^2 windows around floor(coords).

    fmap: (H, W, C); coords: (M, 2) float [x, y]
    returns (M, D, D, C) with D = 2R+2, zero outside the image.
    """
    H, W, _ = fmap.shape
    D = 2 * radius + 2
    x0 = jnp.floor(coords[:, 0]).astype(jnp.int32) - radius
    y0 = jnp.floor(coords[:, 1]).astype(jnp.int32) - radius
    dy = jnp.arange(D)
    dx = jnp.arange(D)
    yi = y0[:, None] + dy[None, :]            # (M, D)
    xj = x0[:, None] + dx[None, :]            # (M, D)
    valid = ((yi[:, :, None] >= 0) & (yi[:, :, None] < H) &
             (xj[:, None, :] >= 0) & (xj[:, None, :] < W))
    yc = jnp.clip(yi, 0, H - 1)
    xc = jnp.clip(xj, 0, W - 1)
    win = fmap[yc[:, :, None], xc[:, None, :]]  # (M, D, D, C)
    return jnp.where(valid[..., None], win, 0)


def extract_patches(fmap, coords, radius, mode='bilinear'):
    """Extract (2R+1)^2 bilinear patches (or raw (2R+2)^2 integer windows).

    fmap: (H, W, C); coords: (M, 2) float [x, y]
    returns (M, P, P, C) with P = 2R+1 when bilinear, else (M, D, D, C).
    Mirrors reference correlation.py:51-68.
    """
    win = _gather_window(fmap, coords, radius)   # (M, D, D, C)
    if mode != 'bilinear':
        return win
    frac = coords - jnp.floor(coords)
    dx = frac[:, 0][:, None, None, None].astype(win.dtype)
    dy = frac[:, 1][:, None, None, None].astype(win.dtype)
    d = 2 * radius + 1
    out = ((1 - dy) * (1 - dx) * win[:, :d, :d] +
           (1 - dy) * (dx) * win[:, :d, 1:] +
           (dy) * (1 - dx) * win[:, 1:, :d] +
           (dy) * (dx) * win[:, 1:, 1:])
    return out


def avg_pool2d(x, k):
    """k x k average pool, stride k, channels-last (..., H, W, C)."""
    if k == 1:
        return x
    *lead, H, W, C = x.shape
    x = x.reshape(tuple(lead) + (H // k, k, W // k, k, C))
    return x.mean(axis=(-4, -2))


def pyramidify(fmap, lvls=(1, 4)):
    """Average-pool pyramid (reference dpvo/utils.py:65-74), channels-last."""
    return [avg_pool2d(fmap, l) for l in lvls]
