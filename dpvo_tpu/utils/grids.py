"""Coordinate-grid and small tensor helpers (reference dpvo/utils.py:32-87)."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.patchify import avg_pool2d, pyramidify  # noqa: F401 (re-export)


def coords_grid(b, n, h, w):
    """(b, n, 2, h, w) [x, y] grid (reference utils.py:32-37)."""
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing='ij')
    g = jnp.stack([xx, yy])[None, None]
    return jnp.broadcast_to(g, (b, n, 2, h, w))


def coords_grid_with_index(d):
    """(x, y, disp) grid + frame index (reference utils.py:39-54).

    d: (b, n, h, w) disparity. Returns (coords (b, n, 3, h, w), index).
    """
    b, n, h, w = d.shape
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing='ij')
    xx = jnp.broadcast_to(xx[None, None], (b, n, h, w))
    yy = jnp.broadcast_to(yy[None, None], (b, n, h, w))
    coords = jnp.stack([xx, yy, d], axis=2)
    index = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[None, :, None, None, None],
        (b, n, 1, h, w))
    return coords, index


def flatmeshgrid(*args, indexing='ij'):
    grid = jnp.meshgrid(*args, indexing=indexing)
    return tuple(x.reshape(-1) for x in grid)


def all_pairs_exclusive(n):
    ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing='ij')
    k = ii != jj
    return ii[k].reshape(-1), jj[k].reshape(-1)


def set_depth(patches, depth):
    """patches (..., 3, P, P); depth (...,) -> set channel 2."""
    return patches.at[..., 2, :, :].set(depth[..., None, None])
