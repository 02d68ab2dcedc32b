"""Local patch correlation — TPU-native `altcorr.corr`.

Replaces the reference CUDA correlation kernel
(dpvo/altcorr/correlation_kernel.cu:83-232). For every edge e the stored
source patch gmap[ii[e]] (P x P x C) is correlated against a (2R+2)^2 integer
window of the target feature map fmap[jj[e]] around the predicted coords,
then the 4 integer taps are bilinearly combined into a (2R+1)^2 response —
mathematically identical to bilinearly sampling the feature map first.

Output feature ordering matches the reference exactly (corr volume is fed to
an MLP whose weights come from torch checkpoints): per edge the flattened
layout is [dx (2R+1), dy (2R+1), py (P), px (P)] — see the permute at
correlation_kernel.cu:232 and the view at dpvo/dpvo.py:207.

Implementation notes (TPU):
  * channels-last fmap, one gathered pixel = one contiguous C-row.
  * edges are processed in static-size chunks via lax.map so the transient
    (chunk, P*P, D*D, C) window tensor stays small; XLA pipelines the
    gather + dot per chunk.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_DEFAULT_CHUNK = 4096


def _corr_chunk(gmap, fmaps, radius):
    """Correlate one chunk of edges.

    gmap:   (E, P, P, C)   source patches (already gathered for the chunk)
    fmaps:  (E, P, P, D, D, C) target windows
    returns (E, 2R+1, 2R+1, P, P) with (dx, dy) leading, matching reference.
    """
    # dot over channels: (E, P, P, D, D)
    c = jnp.einsum('eijc,eijklc->eijkl', gmap, fmaps)
    return c


def corr(gmap, fmap, coords, ii, jj, radius=3, chunk=_DEFAULT_CHUNK):
    """Edge-wise local correlation.

    gmap:   (Ng, P, P, C)  source patch features (bf16/f32)
    fmap:   (F, H, W, C)   target feature-map ring buffer (one pyramid level)
    coords: (E, P, P, 2)   predicted float coords in this level's pixels
    ii:     (E,) int       index into gmap
    jj:     (E,) int       index into fmap
    returns (E, 2R+1, 2R+1, P, P) float32
    """
    E, P = coords.shape[0], coords.shape[1]
    D = 2 * radius + 2
    H, W = fmap.shape[1], fmap.shape[2]
    C = fmap.shape[3]

    # never pad a small edge set up to the full chunk: the transient window
    # tensor is (chunk, P, P, D, D, C) — at the default 4096 that is 1.2 GB,
    # which dwarfs a 128-edge training-step call (and its gradient) with
    # pure zero-fill traffic. Bucket E to 128s so the chunk tracks the
    # problem size while big runtime calls keep the intended tiling.
    chunk = min(chunk, max(128, -(-E // 128) * 128))

    # pad the edge dim to a multiple of the chunk size
    n_chunks = -(-E // chunk)
    Epad = n_chunks * chunk
    pad = Epad - E
    coords_p = jnp.pad(coords, ((0, pad), (0, 0), (0, 0), (0, 0)))
    ii_p = jnp.pad(ii, (0, pad))
    jj_p = jnp.pad(jj, (0, pad))

    dgrid = jnp.arange(D)

    def one_chunk(args):
        co, ig, jf = args                     # (chunk,P,P,2),(chunk,),(chunk,)
        g = gmap[ig]                          # (chunk, P, P, C)
        x0 = jnp.floor(co[..., 0]).astype(jnp.int32) - radius  # (chunk,P,P)
        y0 = jnp.floor(co[..., 1]).astype(jnp.int32) - radius
        yi = y0[..., None] + dgrid            # (chunk,P,P,D)
        xj = x0[..., None] + dgrid
        valid = ((yi[..., :, None] >= 0) & (yi[..., :, None] < H) &
                 (xj[..., None, :] >= 0) & (xj[..., None, :] < W))
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xj, 0, W - 1)
        # windows: (chunk, P, P, D, D, C)
        win = fmap[jf[:, None, None, None, None],
                   yc[..., :, None], xc[..., None, :]]
        win = jnp.where(valid[..., None], win, 0)
        c = jnp.einsum('eijc,eijklc->eijkl',
                       g.astype(jnp.float32), win.astype(jnp.float32))
        # bilinear combination of the 4 integer taps (correlation_kernel.cu:227-230)
        fx = (co[..., 0] - jnp.floor(co[..., 0]))[..., None, None]
        fy = (co[..., 1] - jnp.floor(co[..., 1]))[..., None, None]
        d = 2 * radius + 1
        out = ((1 - fx) * (1 - fy) * c[..., :d, :d] +
               (fx) * (1 - fy) * c[..., :d, 1:] +
               (1 - fx) * (fy) * c[..., 1:, :d] +
               (fx) * (fy) * c[..., 1:, 1:])
        # out dims: (chunk, py, px, dy, dx) -> reference layout (dx, dy, py, px)
        return out.transpose(0, 4, 3, 1, 2)

    out = jax.lax.map(one_chunk,
                      (coords_p.reshape(n_chunks, chunk, P, P, 2),
                       ii_p.reshape(n_chunks, chunk),
                       jj_p.reshape(n_chunks, chunk)))
    out = out.reshape(Epad, 2 * radius + 1, 2 * radius + 1, P, P)
    return out[:E]
