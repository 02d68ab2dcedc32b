"""Pallas TPU kernel for local patch correlation.

Replaces the XLA gather formulation in ops/corr.py for the inference hot
path (the reference's CUDA corr kernel, correlation_kernel.cu:83-136). The
XLA gather moves ~147KB per edge per level through scattered 256B rows; this
kernel DMAs ONE WINxWIN window per edge that covers all 9 patch pixels
(they overlap heavily) — ~2.3x less traffic and sequential DMA instead of
row-gather — with double-buffered HBM->VMEM copies across the edge grid.

Semantics match the reference except windows are clamped so the WINxWIN
region lies inside the image; taps whose true integer coordinates fall
outside the image are zeroed afterwards (exact reference behavior), and in
the rare case a patch projects with spread > WIN-D px the offsets clamp —
and likewise when the window base itself is clipped at an image border
(patch center within ~5 px of the right/bottom edge), so values there can
be shifted by a few pixels. These kernels are KEPT FOR COMPARISON ONLY;
the production paths are ops/corr_fused.py and ops/corr_mxu.py, which are
exact at borders.

Out-of-kernel (XLA, cheap elementwise): floor/frac decomposition, validity
masks, the 4-tap bilinear combination, and the reference's feature layout
transpose.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_Y = 16        # VMEM window height (8-tap window + patch spread)
WIN_X = 24        # VMEM window width: +8 so the base can 8-align (DMA tiling)
D = 8             # integer tap window diameter (2R+2 with R=3)
P2 = 9            # patch pixels (3x3)


def _corr_kernel(jslot_ref, y0_ref, x0_ref, off_ref,     # scalar prefetch
                 gmap_ref,                               # (1, P2, C) VMEM
                 fmap_hbm,                               # (F, H, W, C) ANY
                 out_ref,                                # (1, P2, 64) VMEM
                 win_ref, plane_ref, sem_ref):
    e = pl.program_id(0)
    n_e = pl.num_programs(0)

    def start_dma(idx, slot):
        j = jslot_ref[idx]
        y0 = y0_ref[idx]
        x0 = pl.multiple_of(x0_ref[idx], 8)   # host guarantees 8-alignment
        return pltpu.make_async_copy(
            fmap_hbm.at[j, pl.ds(y0, WIN_Y), pl.ds(x0, WIN_X), :],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    # warm-up: first program starts its own copy
    @pl.when(e == 0)
    def _():
        start_dma(0, 0).start()

    # start next edge's DMA while we process this one
    @pl.when(e + 1 < n_e)
    def _():
        start_dma(e + 1, (e + 1) % 2).start()

    start_dma(e, e % 2).wait()

    win = win_ref[e % 2]                 # (WIN, WIN, C)
    g = gmap_ref[0]                      # (P2, C)

    # correlation plane per patch pixel: lane-reduce win * g[p] over channels
    # (stage through a VMEM scratch: dynamic slicing of VALUES has no Mosaic
    # lowering, but dynamic REF reads via pl.ds do)
    winf = win.astype(jnp.float32)
    for p in range(P2):
        # scratch is 128-lane padded (Mosaic roll needs aligned shapes);
        # only the first WIN_X lanes are ever read back
        plane_ref[p, :, 0:WIN_X] = jnp.sum(
            winf * g[p].astype(jnp.float32), axis=-1)

    for p in range(P2):
        oy = off_ref[2 * P2 * e + 2 * p]
        ox = off_ref[2 * P2 * e + 2 * p + 1]
        # sublane (y) offset: dynamic ref read; lane (x) offset: dynamic
        # rotate (Mosaic can't do unaligned dynamic lane slices)
        rows = plane_ref[p, pl.ds(oy, D), :]          # (D, 128)
        rolled = pltpu.roll(rows, -ox, axis=1)        # x -> x + ox
        out_ref[0, p] = rolled[:, :D]                 # (D, D)


@partial(jax.jit, static_argnames=('interpret',))
def _corr_raw(gmap_g, fmap, jslot, y0, x0, off, interpret=False):
    """Raw 8x8 tap dot-products.

    gmap_g: (E, P2, C) pre-gathered source patches
    fmap:   (F, H, W, C) target ring buffer
    jslot/y0/x0: (E,) int32; off: (E*P2*2,) int32 window-relative offsets
    returns (E, P2, D, D) float32
    """
    E = gmap_g.shape[0]
    C = gmap_g.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, P2, C), lambda e, *_: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, P2, D, D), lambda e, *_: (e, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_Y, WIN_X, C), gmap_g.dtype),
            pltpu.VMEM((P2, WIN_Y, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        _corr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, P2, D, D), jnp.float32),
        interpret=interpret,
    )(jslot, y0, x0, off, gmap_g, fmap)


CHUNK = 128       # edges per program in the grouped kernel


def _make_group_kernel(chunk):
    """Grouped variant: the whole target feature frame is VMEM-resident
    (Pallas re-uses the block when consecutive chunks hit the same frame),
    so per-edge work is pure VMEM reads + VPU reduce — no per-edge DMA.

    fslot_ref: (n_chunks,) frame slot per chunk (scalar prefetch)
    ysox_ref:  (chunk, 3*P2) per-pixel window starts + signed offsets
    xb_ref:    (chunk, P2) 8-aligned x window bases
    gmap_ref:  (chunk, P2, C) source patches for this chunk
    fmap_ref:  (1, H, W, C) the target frame (block)
    out_ref:   (chunk, D, P2*D) packed raw taps
    """
    def _corr_group_kernel(fslot_ref, ysox_ref, xb_ref, gmap_ref, fmap_ref,
                           out_ref, plane_ref):
        c = pl.program_id(0)

        def edge_body(le, _):
            for p in range(P2):
                # per-pixel exact window: ys/xb are clipped into the image,
                # and oy/ox are SIGNED offsets of the true tap origin; valid
                # taps never wrap under the modular rolls (tap in-image =>
                # window index in range); wrapped entries are masked by the
                # caller from true tap coords
                ys = ysox_ref[le, 3 * p]
                oy = ysox_ref[le, 3 * p + 1]
                ox = ysox_ref[le, 3 * p + 2]
                xb = pl.multiple_of(xb_ref[le, p], 8)
                win = fmap_ref[0, pl.ds(ys, D), pl.ds(xb, 2 * D), :]
                g = gmap_ref[le, p].astype(jnp.float32)
                plane = jnp.sum(win.astype(jnp.float32) * g, axis=-1)
                # Mosaic dynamic_rotate needs 128-lane-aligned vectors: stage
                # the plane through a padded scratch, then roll both axes
                plane_ref[:, 0:2 * D] = plane
                s = plane_ref[...]                                 # (8,128)
                rolled = pltpu.roll(pltpu.roll(s, -oy, axis=0), -ox, axis=1)
                # packed output (D, P2*D): an (8,8) lane-padded block per
                # pixel would blow the VMEM budget 16x
                out_ref[le, :, p * D:(p + 1) * D] = rolled[:, :D]
            return 0

        jax.lax.fori_loop(0, chunk, edge_body, 0)

    return _corr_group_kernel


@partial(jax.jit, static_argnames=('interpret', 'chunk'))
def _corr_raw_grouped(gmap_g, fmap, fslot, ysox, xb, interpret=False,
                      chunk=CHUNK):
    """gmap_g (Epad, P2, C); fmap (F, H, W, C); fslot (n_chunks,);
    ysox (Epad, 3*P2) packed [ys, oy, ox]; xb (Epad, P2).
    Requires jj constant within each CHUNK (host groups + pads)."""
    Epad = gmap_g.shape[0]
    C = gmap_g.shape[-1]
    H, W = fmap.shape[1], fmap.shape[2]
    n_chunks = Epad // chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,       # only the tiny chunk->frame-slot map
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, 3 * P2), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, P2), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, P2, C), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda c, fslot: (fslot[c], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, D, P2 * D), lambda c, *_: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((D, 128), jnp.float32)],
    )

    out = pl.pallas_call(
        _make_group_kernel(chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Epad, D, P2 * D), jnp.float32),
        interpret=interpret,
    )(fslot, ysox.reshape(Epad, 3 * P2), xb.reshape(Epad, P2), gmap_g, fmap)
    # (E, dy, p*D+dx) -> (E, P2, dy, dx)
    return out.reshape(Epad, D, P2, D).transpose(0, 2, 1, 3)


def corr_pallas_grouped(gmap, fmap, coords, kk_slot, jj_slot, radius=3,
                        interpret=False, chunk=CHUNK):
    """Grouped-by-target-frame correlation (fast path).

    CONTRACT: edges are sorted by jj_slot and padded so each CHUNK-sized
    block has a single target frame (the host edge table guarantees this).
    Output layout identical to corr_pallas / ops.corr.corr.
    """
    assert radius == 3
    E, Pp = coords.shape[0], coords.shape[1]
    H, W = fmap.shape[1], fmap.shape[2]
    C = fmap.shape[3]
    # W % 8 != 0 would let the 8-aligned window base sit close enough to the
    # right edge that valid taps land in never-written scratch lanes (the
    # mask only covers out-of-image taps) — route to the exact XLA path.
    if H < 2 * D or W < 2 * D or E % chunk != 0 or H % 8 or W % 8:
        from .corr import corr as corr_xla
        return corr_xla(gmap, fmap, coords, kk_slot, jj_slot, radius=radius)

    cf = jnp.floor(coords)
    fx = coords[..., 0] - cf[..., 0]
    fy = coords[..., 1] - cf[..., 1]
    xi = cf[..., 0].astype(jnp.int32)
    yi = cf[..., 1].astype(jnp.int32)

    ys = jnp.clip(yi - radius, 0, H - D)                      # (E, P, P)
    oy = yi - radius - ys                                      # signed
    xb = (jnp.clip(xi - radius, 0, W - 2 * D) // 8) * 8
    ox = xi - radius - xb                                      # signed

    ysox = jnp.stack([ys, oy, ox], axis=-1).reshape(E, Pp * Pp * 3)
    gmap_g = gmap[kk_slot].reshape(E, P2, C)
    fslot = jj_slot.reshape(-1, chunk)[:, 0].astype(jnp.int32)

    raw = _corr_raw_grouped(gmap_g, fmap, fslot,
                            ysox.astype(jnp.int32),
                            xb.reshape(E, P2).astype(jnp.int32),
                            interpret=interpret, chunk=chunk)
    raw = raw.reshape(E, Pp, Pp, D, D)

    dg = jnp.arange(D)
    ty = yi[..., None] - radius + dg
    tx = xi[..., None] - radius + dg
    # in-image taps are exactly the ones the windows captured unwrapped;
    # anything else (OOB or wrapped) is zero, matching the reference
    valid = ((ty[..., :, None] >= 0) & (ty[..., :, None] < H) &
             (tx[..., None, :] >= 0) & (tx[..., None, :] < W))
    raw = jnp.where(valid, raw, 0.0)

    fxb = fx[..., None, None]
    fyb = fy[..., None, None]
    d = D - 1
    out = ((1 - fxb) * (1 - fyb) * raw[..., :d, :d] +
           (fxb) * (1 - fyb) * raw[..., :d, 1:] +
           (1 - fxb) * (fyb) * raw[..., 1:, :d] +
           (fxb) * (fyb) * raw[..., 1:, 1:])
    return out.transpose(0, 4, 3, 1, 2)


def corr_pallas(gmap, fmap, coords, kk_slot, jj_slot, radius=3,
                interpret=False):
    """Drop-in replacement for ops.corr.corr (same output layout).

    gmap: (Ng, P, P, C); fmap: (F, H, W, C); coords: (E, P, P, 2)
    returns (E, 2R+1, 2R+1, P, P) float32
    """
    assert radius == 3, 'kernel is specialized for radius 3'
    E, Pp = coords.shape[0], coords.shape[1]
    H, W = fmap.shape[1], fmap.shape[2]
    C = fmap.shape[3]

    if H < WIN_Y or W < WIN_X:
        # image smaller than the DMA window (tiny test inputs) — XLA path
        from .corr import corr as corr_xla
        return corr_xla(gmap, fmap, coords, kk_slot, jj_slot, radius=radius)

    cf = jnp.floor(coords)                           # (E, P, P, 2)
    fx = (coords[..., 0] - cf[..., 0])               # (E, P, P)
    fy = (coords[..., 1] - cf[..., 1])
    xi = cf[..., 0].astype(jnp.int32)
    yi = cf[..., 1].astype(jnp.int32)

    # window base: min over patch pixels, clamped into the image; the x base
    # additionally aligns DOWN to the 8-sublane DMA tile
    bx = jnp.min(xi.reshape(E, -1), axis=1) - radius
    by = jnp.min(yi.reshape(E, -1), axis=1) - radius
    bx = (jnp.clip(bx, 0, W - WIN_X) // 8) * 8
    by = jnp.clip(by, 0, H - WIN_Y)

    # per-pixel offsets within the window (clamped; spread > WIN-D is rare)
    ox = jnp.clip(xi - radius - bx[:, None, None], 0, WIN_X - D)
    oy = jnp.clip(yi - radius - by[:, None, None], 0, WIN_Y - D)
    off = jnp.stack([oy, ox], axis=-1).reshape(E * Pp * Pp * 2)

    gmap_g = gmap[kk_slot].reshape(E, P2, C)

    raw = _corr_raw(gmap_g, fmap, jj_slot.astype(jnp.int32),
                    by.astype(jnp.int32), bx.astype(jnp.int32),
                    off.astype(jnp.int32), interpret=interpret)
    raw = raw.reshape(E, Pp, Pp, D, D)  # (E*P2, D, D) -> patch grid

    # zero taps whose TRUE integer coords fall outside the image
    dg = jnp.arange(D)
    ty = yi[..., None] - radius + dg                  # (E, P, P, D)
    tx = xi[..., None] - radius + dg
    valid = ((ty[..., :, None] >= 0) & (ty[..., :, None] < H) &
             (tx[..., None, :] >= 0) & (tx[..., None, :] < W))
    raw = jnp.where(valid, raw, 0.0)

    # bilinear 4-tap combination (correlation_kernel.cu:227-230)
    fxb = fx[..., None, None]
    fyb = fy[..., None, None]
    d = D - 1
    out = ((1 - fxb) * (1 - fyb) * raw[..., :d, :d] +
           (fxb) * (1 - fyb) * raw[..., :d, 1:] +
           (1 - fxb) * (fyb) * raw[..., 1:, :d] +
           (fxb) * (fyb) * raw[..., 1:, 1:])
    # (E, py, px, dy, dx) -> reference layout (E, dx, dy, py, px)
    return out.transpose(0, 4, 3, 1, 2)
