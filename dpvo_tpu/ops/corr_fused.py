"""Frame-resident fused correlation — kills the per-edge window HBM traffic.

Same op as ops/corr.py / ops/corr_mxu.py (reference CUDA kernel
dpvo/altcorr/correlation_kernel.cu:83-232), restructured around the measured
bottlenecks of corr_mxu on v5e:

  * corr_mxu extracts an (E, 16, 24, C) window tensor with one DMA per edge:
    ~96 KB x E of HBM round-trip plus ~0.5 us DMA-issue latency per edge —
    measured ~35 ms/frame at E=67k, dwarfing the actual MXU work.
  * this kernel keeps the TARGET FRAME'S feature map resident in VMEM and
    slices each edge's window out of VMEM inside the kernel, feeding the MXU
    directly. The only HBM traffic is one slab DMA per distinct target frame
    (edges must arrive grouped by target slot — the runtimes sort pairs by
    target, see device_vo), the gathered source patches, and the bf16
    correlation planes.
  * window cost is MXU-ingest-bound (each window element pairs with only the
    9 patch pixels), so the window is kept MINIMAL: (WY, WX) = (12, 16).
    A 16-wide window only covers the 8 taps + alignment phase if the base is
    4-aligned, but bf16 VMEM slicing wants 8-aligned starts — so the slab is
    held TWICE, the second copy shifted by 4 px in x. Any 4-aligned base is
    8-aligned in one of the two phase copies.

Both pyramid levels run in one kernel pass (they share the source patches).
Tap selection + bilinear + border masking stay outside as masked static
shifts (pure fused elementwise work; one-hot einsums lower to batched tiny
matmuls and dynamic gathers don't vectorize on TPU).

Exactness: identical to ops/corr.py at image borders (including negative
predicted coords) as long as the patch's projected 3x3 spread stays within
the window budget — y spread <= WY-8 = 4 px, x spread <= WX-8-phase = 5 px
at the 1/4-res feature scale. Overflow taps are zeroed (degenerate
geometry; corr_mxu's policy, with a tighter budget).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WY = 12     # window rows: 8 taps + 4 rows of patch spread (y start is free)
WX = 16     # window cols: 8 taps + up to 3 px phase + 5 cols of spread
EB = 32     # edges per grid step


def _plane_kernel(pa_ref, pb_ref,
                  g_ref, f1a_hbm, f1b_hbm, f2a_hbm, f2b_hbm,
                  out1_ref, out2_ref,
                  f1_vmem, f2_vmem, cur_ref, sem_ref):
    """Per grid step: EB edges. Re-DMA the fmap slabs only when the target
    slot changes (edges are grouped by target); per edge, slice the window
    out of the right phase copy and run one (P2, C) x (C, 2*WY*WX)
    correlation dot on the MXU for both levels. The phase-4-shifted copies
    (f*b) are precomputed outside (HBM memref slices must be tile-aligned,
    so the shift cannot be folded into the DMA).

    Per-edge scalars arrive BIT-PACKED in two int32 streams (pa: jslot 8b |
    by1 10b | bx1s/8 8b | ph1 1b; pb: by2 10b | bx2s/8 8b | ph2 1b) —
    seven separate SMEM-prefetched streams at E=49k would blow the 1 MB
    SMEM budget (7 x 192 KB)."""
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        cur_ref[0] = -1

    def body(e, _):
        gidx = blk * EB + e
        pa = pa_ref[gidx]
        pb = pb_ref[gidx]
        js = pa & 0xFF

        @pl.when(js != cur_ref[0])
        def _():
            cps = [pltpu.make_async_copy(src.at[js], dst, sem_ref.at[k])
                   for k, (src, dst) in enumerate(
                       [(f1a_hbm, f1_vmem.at[0]), (f1b_hbm, f1_vmem.at[1]),
                        (f2a_hbm, f2_vmem.at[0]), (f2b_hbm, f2_vmem.at[1])])]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            cur_ref[0] = js

        g = g_ref[e]                                        # (P2, C)

        w1 = f1_vmem[(pa >> 26) & 1,
                     pl.ds((pa >> 8) & 0x3FF, WY),
                     pl.ds(pl.multiple_of(((pa >> 18) & 0xFF) * 8, 8), WX), :]
        w2 = f2_vmem[(pb >> 18) & 1,
                     pl.ds(pb & 0x3FF, WY),
                     pl.ds(pl.multiple_of(((pb >> 10) & 0xFF) * 8, 8), WX), :]
        w12 = jnp.concatenate(
            [w1.reshape(WY * WX, f1_vmem.shape[-1]),
             w2.reshape(WY * WX, f2_vmem.shape[-1])], axis=0)
        p12 = jax.lax.dot_general(
            g, w12, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out1_ref[e] = p12[:, :WY * WX].astype(out1_ref.dtype)
        out2_ref[e] = p12[:, WY * WX:].astype(out2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, EB, body, 0)


@partial(jax.jit, static_argnames=('interpret',))
def _planes_fused(g9, fmap1, fmap2, pa, pb, interpret=False):
    """(E, P2, WY*WX) bf16 correlation planes for both levels.

    pa/pb: bit-packed per-edge scalars (see _plane_kernel); window bases are
    SLAB-LOCAL 8-aligned, the phase bit selects the 4-px-shifted copy."""
    E, P2, C = g9.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(E // EB,),
        in_specs=[
            pl.BlockSpec((EB, P2, C), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((EB, P2, WY * WX), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((EB, P2, WY * WX), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2,) + fmap1.shape[1:], fmap1.dtype),
            pltpu.VMEM((2,) + fmap2.shape[1:], fmap2.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    # phase-4-shifted copies (B slabs); tail cols are never read (bases are
    # clipped so windows stay inside the image)
    f1b = jnp.pad(fmap1[:, :, 4:, :], ((0, 0), (0, 0), (0, 4), (0, 0)))
    f2b = jnp.pad(fmap2[:, :, 4:, :], ((0, 0), (0, 0), (0, 4), (0, 0)))
    return pl.pallas_call(
        _plane_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, P2, WY * WX), jnp.bfloat16),
                   jax.ShapeDtypeStruct((E, P2, WY * WX), jnp.bfloat16)],
        interpret=interpret,
    )(pa.astype(jnp.int32), pb.astype(jnp.int32), g9, fmap1, f1b, fmap2, f2b)


def _window_base(coords, H, W, radius):
    """Per-edge clipped window base (by free, bx 4-aligned via phase copies)
    + int/frac parts. Returns bx in IMAGE coords (4-aligned)."""
    E = coords.shape[0]
    cf = jnp.floor(coords)
    fx = (coords[..., 0] - cf[..., 0]).reshape(E, -1)
    fy = (coords[..., 1] - cf[..., 1]).reshape(E, -1)
    xi = cf[..., 0].astype(jnp.int32).reshape(E, -1)
    yi = cf[..., 1].astype(jnp.int32).reshape(E, -1)
    by = jnp.clip(jnp.min(yi, axis=1) - radius, 0, H - WY)
    bx = (jnp.clip(jnp.min(xi, axis=1) - radius, 0, W - WX) // 4) * 4
    return xi, yi, fx, fy, by, bx


def _select_taps(plane, xi, yi, fx, fy, by, bx, H, W, radius, P):
    """Tap selection + bilinear + border masking via masked static shifts.

    plane: (E, P2, WY, WX); returns (E, d, d, P, P) float32 in the
    reference layout (dx, dy, py, px) — correlation_kernel.cu:83-232.

    A pixel's 8x8 tap block starts at window-relative (oy, ox). Instead of
    per-pixel one-hot matmuls (batched (7,16)@(16,24) dots — measured
    ~27 ms/level on v5e: tiny-matmul issue overhead), the dynamic offset is
    resolved as a sum of STATICALLY-shifted slices gated by [oy == s]: pure
    elementwise VPU work that XLA fuses into one pass. Border windows give
    oy/ox down to -radius (handled by front-padding); taps outside the
    image are zeroed by the per-tap validity masks, exactly like the
    reference kernel. Patches whose spread overflows the window get zeros.
    """
    E, P2 = xi.shape
    D = 2 * radius + 2          # 8 integer taps per axis
    d = 2 * radius + 1          # 7 bilinear outputs per axis
    cdt = plane.dtype

    oy = yi - radius - by[:, None]                         # (E, P2), >= -3
    ox = xi - radius - bx[:, None]
    ar = jnp.arange(D)
    ty = yi[..., None] - radius + ar
    tx = xi[..., None] - radius + ar
    vy = ((ty >= 0) & (ty < H)).astype(cdt)                # (E, P2, D)
    vx = ((tx >= 0) & (tx < W)).astype(cdt)

    one = jnp.asarray(1, cdt)
    fyc = fy.astype(cdt)
    fxc = fx.astype(cdt)
    # per-tap bilinear coefficients folded with validity
    ay = (one - fyc)[..., None] * vy[..., :d] # weight of row oy+i   (E,P2,d)
    byc = fyc[..., None] * vy[..., 1:]        # weight of row oy+i+1
    axc = (one - fxc)[..., None] * vx[..., :d]
    bxc = fxc[..., None] * vx[..., 1:]

    # Offsets reach [-(D-1), WIN-1]: negative when predicted coords fall at
    # or beyond the image-min border (coords are unclipped reprojections),
    # above WIN-D when the window base is clipped at image-max borders (taps
    # then fall partially outside the window and contribute zero, exactly
    # like the one-hot formulation). Beyond this range every tap is outside
    # the image, so the correct result is zero and no shift term is needed.
    # Front/back padding turns every reachable shift into a valid slice.
    pad = D - 1
    bpy = WY - 1 + 1 + d - WY          # back pad so s_max slice fits
    bpx = WX - 1 + 1 + d - WX
    plane_p = jnp.pad(plane, ((0, 0), (0, 0), (pad, bpy), (pad, bpx)))

    # y pass: t1[e,p,i,x] = ay*plane[oy+i, x] + by*plane[oy+i+1, x]
    t1 = jnp.zeros((E, P2, d, WX), cdt)
    for s in range(-pad, WY):
        m = (oy == s).astype(cdt)[..., None, None]         # (E,P2,1,1)
        lo = jax.lax.slice_in_dim(plane_p, s + pad, s + pad + d, axis=2)
        hi = jax.lax.slice_in_dim(plane_p, s + pad + 1, s + pad + 1 + d,
                                  axis=2)
        t1 = t1 + m * (ay[..., None] * lo[..., pad:pad + WX] +
                       byc[..., None] * hi[..., pad:pad + WX])

    # x pass: out[e,p,i,j] = ax*t1[..., ox+j] + bx*t1[..., ox+j+1]
    t1p = jnp.pad(t1, ((0, 0), (0, 0), (0, 0), (pad, bpx)))
    out = jnp.zeros((E, P2, d, d), jnp.float32)
    for s in range(-pad, WX):
        m = (ox == s).astype(cdt)[..., None, None]
        lo = jax.lax.slice_in_dim(t1p, s + pad, s + pad + d, axis=3)
        hi = jax.lax.slice_in_dim(t1p, s + pad + 1, s + pad + 1 + d, axis=3)
        out = out + (m * (axc[..., None, :] * lo +
                          bxc[..., None, :] * hi)).astype(jnp.float32)

    out = out.reshape(E, P, P, d, d)
    return out.transpose(0, 4, 3, 1, 2)


def corr_fused(gmap, fmap1, fmap2, coords, kk_slot, jj_slot, radius=3,
               interpret=False):
    """Both-level local correlation with frame-resident windows.

    gmap:    (Ng, P, P, C) bf16 source patches
    fmap1/2: (F, H, W, C) bf16 target pyramids (level 2 = level 1 coords / 4)
    coords:  (E, P, P, 2) float level-1 coords; kk_slot/jj_slot (E,) int32.
    Edges MUST be grouped by jj_slot (sorted) — each slot change re-DMAs the
    VMEM slabs. Returns (c1, c2), each (E, 2R+1, 2R+1, P, P) float32.
    """
    assert radius == 3, 'specialized for radius 3'
    E, P = coords.shape[0], coords.shape[1]
    H1, W1 = fmap1.shape[1], fmap1.shape[2]
    H2, W2 = fmap2.shape[1], fmap2.shape[2]

    # small maps, or shapes that overflow the packed bit fields (slot 8b,
    # by 10b, bx/8 8b — see _plane_kernel): exact XLA path instead
    if (min(H1, H2) < WY or min(W1, W2) < WX + 4
            or fmap1.shape[0] > 256 or max(H1, H2) - WY >= 1024
            or (max(W1, W2) - WX) // 8 >= 256):
        from .corr import corr as corr_xla
        c1 = corr_xla(gmap, fmap1, coords, kk_slot, jj_slot, radius=radius)
        c2 = corr_xla(gmap, fmap2, coords / 4.0, kk_slot, jj_slot,
                      radius=radius)
        return c1, c2

    xi1, yi1, fx1, fy1, by1, bx1 = _window_base(coords, H1, W1, radius)
    xi2, yi2, fx2, fy2, by2, bx2 = _window_base(coords / 4.0, H2, W2, radius)

    # phase split: any 4-aligned base is 8-aligned in one of the two copies
    ph1 = (bx1 // 4) % 2
    bx1s = bx1 - 4 * ph1
    ph2 = (bx2 // 4) % 2
    bx2s = bx2 - 4 * ph2

    # bit-pack the per-edge scalars (2 SMEM streams instead of 7; see
    # _plane_kernel). Field widths: slot 8b, by 10b, 8-aligned bx/8 8b,
    # phase 1b — ample for any realistic pyramid resolution.
    jsl32 = jj_slot.astype(jnp.int32)
    pa = (jsl32 | (by1 << 8) | ((bx1s // 8) << 18) | (ph1 << 26))
    pb = (by2 | ((bx2s // 8) << 10) | (ph2 << 18))

    g9 = gmap[kk_slot].reshape(E, P * P, gmap.shape[-1])

    # pad E to a block multiple; padded edges reuse the last slot (no reload)
    Epad = -(-E // EB) * EB
    if Epad != E:
        padn = Epad - E
        g9 = jnp.concatenate([g9, jnp.zeros((padn,) + g9.shape[1:],
                                            g9.dtype)], 0)
        pa = jnp.concatenate([pa, jnp.broadcast_to(pa[-1:], (padn,))])
        pb = jnp.concatenate([pb, jnp.broadcast_to(pb[-1:], (padn,))])

    plane1, plane2 = _planes_fused(g9, fmap1, fmap2, pa, pb,
                                   interpret=interpret)
    plane1 = plane1[:E].reshape(E, P * P, WY, WX)
    plane2 = plane2[:E].reshape(E, P * P, WY, WX)

    c1 = _select_taps(plane1, xi1, yi1, fx1, fy1, by1, bx1, H1, W1, radius, P)
    c2 = _select_taps(plane2, xi2, yi2, fx2, fy2, by2, bx2, H2, W2, radius, P)
    return c1, c2
