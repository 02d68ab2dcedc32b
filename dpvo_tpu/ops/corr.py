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
  * for SMALL feature maps (H*W <= _VOLUME_MAX_HW — the training regime)
    the window gather is replaced by an all-matmul "full volume" path:
    one-hot frame select + full-frame MXU dot + one-hot row/col window
    select. A TPU gather's backward is a scatter-add that lowers to a
    SEQUENTIAL while-loop (the reason the training step was ~40 s); every
    op on this path is a matmul whose adjoint is a matmul.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_DEFAULT_CHUNK = 4096
# all-matmul path when H*W <= this: covers the 64x96 training regime
# (fmap1 16x24=384) while excluding runtime pyramids, whose per-chunk
# frame-select transient (chunk x H*W x C) would not fit VMEM/HBM budgets.
# DPVO_CORR_VOLUME_MAX overrides for A/B bisection (0 = gather path).
import os as _os
_VOLUME_MAX_HW = int(_os.environ.get('DPVO_CORR_VOLUME_MAX', 512))
_HIGHEST = jax.lax.Precision.HIGHEST


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

    def one_chunk_volume(args):
        """All-matmul chunk body for small fmaps (differentiable hot path).

        Replaces gather+einsum with:
          1. one-hot frame select        fm[e] = onehot(jf)[e] @ fmap
          2. full-frame correlation      vol[e,p,q,h,w] = g . fm  (MXU)
          3. one-hot window select       rowsel/colsel are 0/1 matrices
             built from floor(coords); out-of-bounds rows/cols are
             all-zero one-hots, reproducing the gather path's zero-fill.
        No gather/scatter appears in either the forward or the VJP.
        """
        co, ig, jf = args
        g = _gather_rows_onehot(gmap, ig)           # (chunk, P, P, C)
        F = fmap.shape[0]
        f_oh = (jf[:, None] == jnp.arange(F, dtype=jf.dtype)
                ).astype(fmap.dtype)
        fm = jnp.einsum('et,thwc->ehwc', f_oh, fmap,
                        precision=_HIGHEST)          # (chunk, H, W, C)
        vol = jnp.einsum('epqc,ehwc->epqhw',
                         g.astype(jnp.float32), fm.astype(jnp.float32),
                         precision=_HIGHEST)         # (chunk, P, P, H, W)
        x0 = jnp.floor(co[..., 0]).astype(jnp.int32) - radius  # (chunk,P,P)
        y0 = jnp.floor(co[..., 1]).astype(jnp.int32) - radius
        yi = y0[..., None] + dgrid                   # (chunk,P,P,D)
        xj = x0[..., None] + dgrid
        rowsel = (yi[..., None] == jnp.arange(H)).astype(jnp.float32)
        colsel = (xj[..., None] == jnp.arange(W)).astype(jnp.float32)
        v1 = jnp.einsum('epqdh,epqhw->epqdw', rowsel, vol,
                        precision=_HIGHEST)          # (chunk,P,P,D,W)
        c = jnp.einsum('epqxw,epqdw->epqdx', colsel, v1,
                       precision=_HIGHEST)           # (chunk,P,P,D,D)
        fx = (co[..., 0] - jnp.floor(co[..., 0]))[..., None, None]
        fy = (co[..., 1] - jnp.floor(co[..., 1]))[..., None, None]
        d = 2 * radius + 1
        out = ((1 - fx) * (1 - fy) * c[..., :d, :d] +
               (fx) * (1 - fy) * c[..., :d, 1:] +
               (1 - fx) * (fy) * c[..., 1:, :d] +
               (fx) * (fy) * c[..., 1:, 1:])
        return out.transpose(0, 4, 3, 1, 2)

    body = one_chunk_volume if H * W <= _VOLUME_MAX_HW else one_chunk
    # remat the chunk body: without it the scan's VJP saves every chunk's
    # (chunk, P, P, D, D, C) gathered window as a residual — for a training
    # unroll that is E x 441 x C floats live across all 14+ steps (OOM on a
    # 16 GB chip); recomputing the gather in the backward is nearly free
    out = jax.lax.map(jax.checkpoint(body),
                      (coords_p.reshape(n_chunks, chunk, P, P, 2),
                       ii_p.reshape(n_chunks, chunk),
                       jj_p.reshape(n_chunks, chunk)))
    out = out.reshape(Epad, 2 * radius + 1, 2 * radius + 1, P, P)
    return out[:E]


def _gather_rows_onehot(buf, idx, max_rows=8192):
    """Row gather as a one-hot matmul (scatter-free VJP); exact selection."""
    N = buf.shape[0]
    if N > max_rows:
        return buf[idx]
    flat = buf.reshape(N, -1)
    oh = (idx[:, None] == jnp.arange(N, dtype=idx.dtype)).astype(flat.dtype)
    out = jnp.matmul(oh, flat, precision=_HIGHEST)
    return out.reshape((idx.shape[0],) + buf.shape[1:])
