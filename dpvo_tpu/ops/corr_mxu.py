"""MXU-formulated local patch correlation (the fast TPU path).

Same op as ops/corr.py (reference CUDA kernel
dpvo/altcorr/correlation_kernel.cu:83-232) but restructured so ALL the MAC
work lands on the MXU and nothing iterates per edge:

  1. ONE window per edge: a (WY, WX, C) slab of the target frame that covers
     all P*P patch pixels and their (2R+2)^2 taps. Extracted with a single
     XLA row gather — contiguous C-rows, no per-edge loop.
  2. correlation plane: einsum('eyxc,epc->epyx') — a batched (WY*WX, C) @
     (C, P2) matmul on the MXU.
  3. tap selection + border masking + bilinear interpolation folded into two
     ONE-HOT contractions over the window axes (one-hot matmuls are the
     TPU-native gather; the bilinear weights become the two nonzeros of each
     row, and out-of-image taps simply have no nonzero).

Exactness: windows are clipped into the image, and the one-hot selection
indexes the UNCLAMPED tap position, so border patches are exact (taps whose
true coords leave the image are zero, exactly like the reference). The only
approximation: a patch whose projected 3x3 spread exceeds (WY-8, WX-8)
pixels gets its overflow taps zeroed (degenerate geometry; the Pallas
kernels clamped these to wrong values, this returns zeros).

Why not the previous Pallas kernels: they looped edge-by-edge inside the
kernel doing (8,16,C)*(C,) VPU reductions over the LANE dimension — ~380 ns
per patch pixel, ~100-230 ms per call. This formulation runs the same math
as dense MXU batched matmuls.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WY = 16     # window rows: 8 taps + 8 rows of patch spread
WX = 24     # window cols: 8 taps + 9 cols of spread (x base 8-aligned)


def _extract_kernel(jslot_ref, y0_ref, x0_ref,    # scalar prefetch
                    fmap_hbm, out_ref, win_ref, sem_ref):
    """DMA-only window extraction: one strided HBM->VMEM copy per edge,
    double-buffered across the grid. No compute — the correlation itself
    runs as dense MXU einsums outside (XLA)."""
    e = pl.program_id(0)
    n_e = pl.num_programs(0)

    def start(idx, slot):
        return pltpu.make_async_copy(
            fmap_hbm.at[jslot_ref[idx],
                        pl.ds(y0_ref[idx], WY),
                        pl.ds(pl.multiple_of(x0_ref[idx], 8), WX), :],
            win_ref.at[slot], sem_ref.at[slot])

    @pl.when(e == 0)
    def _():
        start(0, 0).start()

    @pl.when(e + 1 < n_e)
    def _():
        start(e + 1, (e + 1) % 2).start()

    start(e, e % 2).wait()
    out_ref[0] = win_ref[e % 2]


@jax.jit
def _extract_windows_pallas(fmap, jslot, by, bx):
    """(E, WY, WX, C) windows of fmap at (jslot, by, bx). bx 8-aligned."""
    E = jslot.shape[0]
    C = fmap.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(E,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, WY, WX, C), lambda e, *_: (e, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WY, WX, C), fmap.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _extract_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, WY, WX, C), fmap.dtype),
    )(jslot.astype(jnp.int32), by.astype(jnp.int32), bx.astype(jnp.int32),
      fmap)


def corr_mxu(gmap, fmap, coords, kk_slot, jj_slot, radius=3,
             extract=None):
    """Edge-wise local correlation, MXU formulation.

    gmap:   (Ng, P, P, C)  source patch features (bf16/f32)
    fmap:   (F, H, W, C)   target feature-map ring buffer
    coords: (E, P, P, 2)   predicted float coords in this level's pixels
    kk_slot/jj_slot: (E,) int32 indices into gmap / fmap
    returns (E, 2R+1, 2R+1, P, P) float32 — reference layout (dx, dy, py, px)
    """
    assert radius == 3, 'specialized for radius 3 (D = 8 taps)'
    if extract is None:
        extract = ('pallas' if jax.default_backend() in ('tpu', 'axon')
                   else 'gather')
    E, P = coords.shape[0], coords.shape[1]
    P2 = P * P
    H, W, C = fmap.shape[1], fmap.shape[2], fmap.shape[3]
    D = 2 * radius + 2          # 8 integer taps per axis
    d = 2 * radius + 1          # 7 bilinear outputs per axis

    if H < WY or W < WX:
        from .corr import corr as corr_xla
        return corr_xla(gmap, fmap, coords, kk_slot, jj_slot, radius=radius)

    cf = jnp.floor(coords)
    fx = (coords[..., 0] - cf[..., 0])            # (E, P, P)
    fy = (coords[..., 1] - cf[..., 1])
    xi = cf[..., 0].astype(jnp.int32)
    yi = cf[..., 1].astype(jnp.int32)

    # shared per-edge window base, clipped into the image; the x base is
    # 8-aligned (DMA tile alignment) — WX has 9 columns of slack for it
    by = jnp.clip(jnp.min(yi.reshape(E, -1), axis=1) - radius, 0, H - WY)
    bx = (jnp.clip(jnp.min(xi.reshape(E, -1), axis=1) - radius,
                   0, W - WX) // 8) * 8

    if extract == 'pallas':
        win = _extract_windows_pallas(fmap, jj_slot, by, bx)
    else:
        # XLA row gather (slow on TPU: per-pixel row gather; kept for CPU
        # tests / fallback)
        rows = by[:, None] + jnp.arange(WY)[None, :]          # (E, WY)
        cols = bx[:, None] + jnp.arange(WX)[None, :]          # (E, WX)
        win = fmap[jj_slot[:, None, None], rows[:, :, None], cols[:, None, :]]

    # correlation plane on the MXU: (E, P2, WY, WX)
    g = gmap[kk_slot].reshape(E, P2, C)
    plane = jax.lax.dot_general(
        g, win.reshape(E, WY * WX, C),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(E, P2, WY, WX)

    # one-hot tap selection with folded validity + bilinear weights
    oy = (yi - radius - by[:, None, None]).reshape(E, P2)     # signed
    ox = (xi - radius - bx[:, None, None]).reshape(E, P2)
    ar = jnp.arange(D)
    ty = yi.reshape(E, P2)[..., None] - radius + ar           # (E, P2, D)
    tx = xi.reshape(E, P2)[..., None] - radius + ar
    vy = ((ty >= 0) & (ty < H)).astype(jnp.float32)
    vx = ((tx >= 0) & (tx < W)).astype(jnp.float32)

    posy = oy[..., None] + jnp.arange(d)                      # (E, P2, d)
    posx = ox[..., None] + jnp.arange(d)
    fyr = fy.reshape(E, P2)[..., None]
    fxr = fx.reshape(E, P2)[..., None]
    y_ar = jnp.arange(WY)
    x_ar = jnp.arange(WX)

    # A[e,p,i,y] = (1-fy)*[y==posy_i]*vy_i + fy*[y==posy_i+1]*vy_{i+1}
    A = ((1 - fyr)[..., None] * vy[..., :d, None] *
         (y_ar == posy[..., None]) +
         fyr[..., None] * vy[..., 1:, None] *
         (y_ar == (posy + 1)[..., None])).astype(jnp.float32)  # (E,P2,d,WY)
    B = ((1 - fxr)[..., None] * vx[..., :d, None] *
         (x_ar == posx[..., None]) +
         fxr[..., None] * vx[..., 1:, None] *
         (x_ar == (posx + 1)[..., None])).astype(jnp.float32)  # (E,P2,d,WX)

    # contract the window axes: (E,P2,d,WX) then (E,P2,d,d)
    t1 = jnp.einsum('epyx,epiy->epix', plane, A)
    out = jnp.einsum('epix,epjx->epij', t1, B)                # (E,P2,dy,dx)

    out = out.reshape(E, P, P, d, d)
    # (E, py, px, dy, dx) -> reference layout (E, dx, dy, py, px)
    return out.transpose(0, 4, 3, 1, 2)
