"""Frame-resident fused correlation — kills the per-edge window HBM traffic.

Same op as ops/corr.py (reference CUDA kernel
dpvo/altcorr/correlation_kernel.cu:83-232), restructured around the measured
bottlenecks of earlier window-DMA formulations on v5e:

  * extracting an (E, 16, 24, C) window tensor costs one DMA per edge:
    ~96 KB x E of HBM round-trip plus ~0.5 us DMA-issue latency per edge —
    measured ~35 ms/frame at E=67k, dwarfing the actual MXU work.
  * this kernel keeps the TARGET FRAME'S feature map resident in VMEM and
    slices each edge's window out of VMEM inside the kernel, feeding the MXU
    directly. The only HBM traffic is one slab DMA per distinct target frame
    (edges must arrive grouped by target slot — the runtimes sort pairs by
    target, see device_vo), the gathered source patches, and the bf16
    correlation planes.
  * bf16 VMEM slicing wants 8-aligned column starts, so the L1 window is
    (WY, WX) = (12, 24): 8 integer taps + up to 7 px of 8-alignment slack +
    5 px of patch spread in x; 8 taps + 4 px spread in y (rows slice
    freely). Level 2 (4x coarser coords, tiny slab) holds a 4-px-shifted
    PHASE PAIR instead, shrinking its window to (WY2, WX2) = (10, 16).
  * the slabs are PADDED (TY rows top, TX cols left, margins bottom/right)
    and the per-edge integer coords CLAMPED to [-7, dim+7] before the base
    computation. Window bases then never clip against the image borders, so
    the in-window tap offsets collapse to oy in [0,4], ox in [0,12] —
    18 masked static shifts instead of 42, no plane padding, and the
    VMEM scratch fits the 16 MB scoped budget at 640x480 (and KITTI-wide
    1226px frames). Clamping is exact: whenever it binds, every tap of that
    pixel is outside the image and the per-tap validity masks zero it anyway.

Both pyramid levels run in one kernel pass (they share the source patches).
Tap selection + bilinear + border masking stay outside as masked static
shifts (pure fused elementwise work; one-hot einsums lower to batched tiny
matmuls and dynamic gathers don't vectorize on TPU).

Exactness: identical to ops/corr.py at image borders (including negative
predicted coords) as long as the patch's projected 3x3 spread stays within
the window budget — y spread <= 4 px, x spread <= 5 px at the feature
scale. Overflow taps are zeroed (degenerate geometry).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WY = 12     # window rows: 8 taps + 4 rows of patch spread
WX = 24     # L1 window cols: 8 taps + 7 px 8-alignment slack + 5 px spread
WX2 = 16    # L2 window cols: 8 taps + 3 px 4-alignment phase + 5 px budget
WY2 = 10    # L2 window rows: 8 taps + 2 rows of spread (spread/4 at L2)
EB = 32     # edges per grid step
TY = 10     # slab top pad: clamped base min = min(yi)-3 >= -10
TX = 16     # slab left pad (multiple of 8): aligned base >= -16
D_MIN = 16  # below this feature-map size, fall back to the XLA path


def pad_hw(H, W):
    """Padded slab dims for an (H, W) feature level."""
    return H + TY + WY + 4, int(-(-(W + TX + WX + 4) // 8) * 8)


def pad_slab(f):
    """(F, H, W, C) -> (F, Hp, Wp, C): image pixel (y, x) at (y+TY, x+TX)."""
    F, H, W, C = f.shape
    Hp, Wp = pad_hw(H, W)
    return jnp.pad(f, ((0, 0), (TY, Hp - H - TY), (TX, Wp - W - TX), (0, 0)))


def pad_hw2(H, W):
    """Padded level-2 slab dims (phase pair uses the same W padding)."""
    return H + TY + WY2 + 4, int(-(-(W + TX + WX2 + 8) // 8) * 8)


def pad_slab2(f):
    """(F, H, W, C) -> (F, 2, Hp, Wp, C) level-2 phase pair.

    Level-2 windows are (WY2, WX2) = (10, 16): a 16-wide window covers the 8
    taps + spread if the base is 4-aligned, but bf16 VMEM slices need
    8-aligned starts — so the slab is held twice, phase B shifted by 4 px
    in x (any 4-aligned base is 8-aligned in one copy). The L2 slab is
    small (~1 MB), so the pair fits VMEM easily; the same trick on L1
    would blow the 16 MB scoped budget."""
    F, H, W, C = f.shape
    Hp, Wp = pad_hw2(H, W)
    fa = jnp.pad(f, ((0, 0), (TY, Hp - H - TY), (TX, Wp - W - TX), (0, 0)))
    fb = jnp.pad(f, ((0, 0), (TY, Hp - H - TY),
                     (TX - 4, Wp - W - TX + 4), (0, 0)))
    return jnp.stack([fa, fb], axis=1)


def _plane_kernel(pa_ref, pb_ref,
                  g_ref, f1_hbm, f2_hbm,
                  out1_ref, out2_ref,
                  f1_vmem, f2_vmem, cur_ref, sem_ref):
    """Per grid step: EB edges. Re-DMA the fmap slabs only when the target
    slot changes (edges are grouped by target); per edge, slice the window
    out of VMEM and run one (P2, C) x (C, 2*WY*WX) correlation dot on the
    MXU for both levels.

    Per-edge scalars arrive BIT-PACKED in two int32 streams (pa: jslot 8b |
    by1 10b | bx1/8 8b; pb: by2 10b | bx2s/8 8b | ph2 1b) — seven separate
    SMEM-prefetched streams at E=49k would blow the 1 MB SMEM budget."""
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
            cp1 = pltpu.make_async_copy(f1_hbm.at[js], f1_vmem, sem_ref.at[0])
            cp2 = pltpu.make_async_copy(f2_hbm.at[js], f2_vmem, sem_ref.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            cur_ref[0] = js

        g = g_ref[e]                                        # (P2, C)

        w1 = f1_vmem[pl.ds((pa >> 8) & 0x3FF, WY),
                     pl.ds(pl.multiple_of(((pa >> 18) & 0xFF) * 8, 8), WX), :]
        w2 = f2_vmem[(pb >> 18) & 1,
                     pl.ds(pb & 0x3FF, WY2),
                     pl.ds(pl.multiple_of(((pb >> 10) & 0xFF) * 8, 8),
                           WX2), :]
        w12 = jnp.concatenate(
            [w1.reshape(WY * WX, f1_vmem.shape[-1]),
             w2.reshape(WY2 * WX2, f2_vmem.shape[-1])], axis=0)
        p12 = jax.lax.dot_general(
            g, w12, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out1_ref[e] = p12[:, :WY * WX].astype(out1_ref.dtype)
        out2_ref[e] = p12[:, WY * WX:].astype(out2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, EB, body, 0)


@partial(jax.jit, static_argnames=('interpret',))
def _planes_fused(g9, fp1, fp2, pa, pb, interpret=False):
    """(E, P2, WY*WX) bf16 correlation planes for both levels.

    fp1: (F, Hp, Wp, C) padded L1 slab (pad_slab); fp2: (F, 2, Hp2, Wp2, C)
    level-2 phase pair (pad_slab2).
    pa/pb: bit-packed per-edge scalars (see _plane_kernel); window bases
    are SLAB-LOCAL and 8-aligned."""
    E, P2, C = g9.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(E // EB,),
        in_specs=[
            pl.BlockSpec((EB, P2, C), lambda i, *_: (i, 0, 0)),
            # ANY (not explicit HBM): measured 26.2 vs 21.1 FPS — the
            # explicit-HBM constraint costs ~5 FPS end to end
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((EB, P2, WY * WX), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((EB, P2, WY2 * WX2), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM(fp1.shape[1:], fp1.dtype),
            pltpu.VMEM(fp2.shape[1:], fp2.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _plane_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, P2, WY * WX), jnp.bfloat16),
                   jax.ShapeDtypeStruct((E, P2, WY2 * WX2), jnp.bfloat16)],
        interpret=interpret,
    )(pa.astype(jnp.int32), pb.astype(jnp.int32), g9, fp1, fp2)


def _window_base(coords, H, W, radius, align=8, wy=WY):
    """Clamped per-edge window base + int/frac parts + in-window offsets.

    Integer coords are clamped to [-7, dim+7]: whenever the clamp binds,
    every tap of that pixel is out of image (masked to zero), so results
    are unchanged while bases stay within the padded slab and the in-window
    offsets collapse to oy in [0, 4], ox in [0, align-1 + 5].

    Returns xi, yi (clamped ints), fx, fy, by, bx (slab coords, bx
    align-aligned), oy, ox.
    """
    E = coords.shape[0]
    cf = jnp.floor(coords)
    fx = (coords[..., 0] - cf[..., 0]).reshape(E, -1)
    fy = (coords[..., 1] - cf[..., 1]).reshape(E, -1)
    xi = jnp.clip(cf[..., 0].astype(jnp.int32).reshape(E, -1), -7, W + 7)
    yi = jnp.clip(cf[..., 1].astype(jnp.int32).reshape(E, -1), -7, H + 7)
    by_img = jnp.min(yi, axis=1) - radius              # [-10, H+4]
    del wy  # slab bottom margin (pad_hw*) already covers by_img + rows
    bx_img = ((jnp.min(xi, axis=1) - radius) // align) * align
    oy = yi - radius - by_img[:, None]                 # [0, y-spread]
    ox = xi - radius - bx_img[:, None]                 # [0, align-1 + spread]
    return xi, yi, fx, fy, by_img + TY, bx_img + TX, oy, ox


def _select_taps(plane, xi, yi, fx, fy, oy, ox, H, W, radius, P):
    """Tap selection + bilinear + border masking via masked static shifts.

    plane: (E, P2, WY, WX); returns (E, d, d, P, P) float32 in the
    reference layout (dx, dy, py, px) — correlation_kernel.cu:83-232.

    A pixel's 8x8 tap block starts at window-relative (oy, ox), with
    oy in [0, 4], ox in [0, 12] by construction (padded slabs + clamped
    bases). The dynamic offset is resolved as a sum of STATICALLY-shifted
    slices gated by [oy == s]: pure elementwise VPU work XLA fuses into one
    pass (18 terms; dynamic gathers don't vectorize on TPU, and the
    unpadded formulation needed 42 terms plus a padded copy of `plane`).
    Taps outside the image are zeroed by the per-tap validity masks,
    exactly like the reference kernel. Patches whose spread overflows the
    window budget (oy > 4 / ox > 12, degenerate geometry) get zeros.
    """
    E, P2 = xi.shape
    D = 2 * radius + 2          # 8 integer taps per axis
    d = 2 * radius + 1          # 7 bilinear outputs per axis
    Wy = plane.shape[2]         # window rows (WY for L1, WY2 for L2)
    Wx = plane.shape[3]         # window cols (WX for L1, WX2 for L2)
    cdt = plane.dtype

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

    # y pass: t1[e,p,i,x] = ay*plane[oy+i, x] + by*plane[oy+i+1, x]
    t1 = jnp.zeros((E, P2, d, Wx), cdt)
    for s in range(0, Wy - D + 1):                         # oy in [0, Wy-8]
        m = (oy == s).astype(cdt)[..., None, None]         # (E,P2,1,1)
        lo = jax.lax.slice_in_dim(plane, s, s + d, axis=2)
        hi = jax.lax.slice_in_dim(plane, s + 1, s + 1 + d, axis=2)
        t1 = t1 + m * (ay[..., None] * lo + byc[..., None] * hi)

    # x pass: out[e,p,i,j] = ax*t1[..., ox+j] + bx*t1[..., ox+j+1]
    out = jnp.zeros((E, P2, d, d), jnp.float32)
    for s in range(0, Wx - D + 1):                         # ox in [0, Wx-8]
        m = (ox == s).astype(cdt)[..., None, None]
        lo = jax.lax.slice_in_dim(t1, s, s + d, axis=3)
        hi = jax.lax.slice_in_dim(t1, s + 1, s + 1 + d, axis=3)
        out = out + (m * (axc[..., None, :] * lo +
                          bxc[..., None, :] * hi)).astype(jnp.float32)

    out = out.reshape(E, P, P, d, d)
    return out.transpose(0, 4, 3, 1, 2)


def corr_fused(gmap, fmap1, fmap2, coords, kk_slot, jj_slot, radius=3,
               interpret=False, g9=None, prepadded=None,
               select_kernel=None):
    """Both-level local correlation with frame-resident windows.

    gmap:    (Ng, P, P, C) bf16 source patches
    fmap1/2: (F, H, W, C) bf16 target pyramids (level 2 = level 1 coords /4),
             OR (F, Hp, Wp, C) padded slabs when `prepadded` carries the
             valid dims ((H1, W1), (H2, W2)) — runtimes keep the slabs
             padded persistently to skip the per-call pad.
    coords:  (E, P, P, 2) float level-1 coords; kk_slot/jj_slot (E,) int32.
    g9:      optional (E, P*P, C) pre-gathered source patches (pair-blocked
             callers gather at coarse granularity, cheaper than gmap[kk_slot])
    Edges MUST be grouped by jj_slot (sorted) — each slot change re-DMAs the
    VMEM slabs. Returns (c1, c2), each (E, 2R+1, 2R+1, P, P) float32.
    """
    assert radius == 3, 'specialized for radius 3'
    E, P = coords.shape[0], coords.shape[1]
    if prepadded is not None:
        (H1, W1), (H2, W2) = prepadded
        fp1, fp2 = fmap1, fmap2
    else:
        H1, W1 = fmap1.shape[1], fmap1.shape[2]
        H2, W2 = fmap2.shape[1], fmap2.shape[2]

    # small maps, or shapes that overflow the packed bit fields (slot 8b,
    # by 10b, bx/8 8b — see _plane_kernel): exact XLA path instead
    if (min(H1, H2) < D_MIN or min(W1, W2) < D_MIN
            or fmap1.shape[0] > 256 or max(H1, H2) + TY + 4 >= 1024
            or (max(W1, W2) + TX + 4) // 8 >= 256):
        from .corr import corr as corr_xla
        if prepadded is not None:
            # recover the raw maps from the padded slabs
            fmap1 = fp1[:, TY:TY + H1, TX:TX + W1, :]
            fmap2 = fp2[:, 0, TY:TY + H2, TX:TX + W2, :]
        if g9 is not None:
            # pre-gathered patches: kk_slot may be remapped/meaningless
            gmap = g9.reshape(E, P, P, g9.shape[-1])
            kk_slot = jnp.arange(E, dtype=jnp.int32)
        c1 = corr_xla(gmap, fmap1, coords, kk_slot, jj_slot, radius=radius)
        c2 = corr_xla(gmap, fmap2, coords / 4.0, kk_slot, jj_slot,
                      radius=radius)
        return c1, c2

    if prepadded is None:
        fp1 = pad_slab(fmap1)
        fp2 = pad_slab2(fmap2)

    xi1, yi1, fx1, fy1, by1, bx1, oy1, ox1 = \
        _window_base(coords, H1, W1, radius)
    xi2, yi2, fx2, fy2, by2, bx2, oy2, ox2 = \
        _window_base(coords / 4.0, H2, W2, radius, align=4, wy=WY2)

    # L2 phase split: a 4-aligned base is 8-aligned in one of the 2 copies
    ph2 = (bx2 // 4) % 2
    bx2s = bx2 - 4 * ph2

    # bit-pack the per-edge scalars (2 SMEM streams instead of 5+; see
    # _plane_kernel). Field widths: slot 8b, by 10b, aligned bx/8 8b,
    # L2 phase 1b — ample for any realistic pyramid resolution.
    jsl32 = jj_slot.astype(jnp.int32)
    pa = (jsl32 | (by1 << 8) | ((bx1 // 8) << 18))
    pb = (by2 | ((bx2s // 8) << 10) | (ph2 << 18))

    if g9 is None:
        g9 = gmap[kk_slot].reshape(E, P * P, gmap.shape[-1])

    # pad E to a block multiple; padded edges reuse the last slot (no reload)
    Epad = -(-E // EB) * EB
    if Epad != E:
        padn = Epad - E
        g9 = jnp.concatenate([g9, jnp.zeros((padn,) + g9.shape[1:],
                                            g9.dtype)], 0)
        pa = jnp.concatenate([pa, jnp.broadcast_to(pa[-1:], (padn,))])
        pb = jnp.concatenate([pb, jnp.broadcast_to(pb[-1:], (padn,))])

    plane1, plane2 = _planes_fused(g9, fp1, fp2, pa, pb,
                                   interpret=interpret)
    plane1 = plane1[:E].reshape(E, P * P, WY, WX)
    plane2 = plane2[:E].reshape(E, P * P, WY2, WX2)

    if select_kernel is None:
        if not interpret and jax.default_backend() in ('tpu', 'axon'):
            from .corr_select import kernel_available
            select_kernel = kernel_available()   # pre-flights ONCE, cached
        else:
            select_kernel = False
    if select_kernel:
        # VMEM-streamed select kernel: one HBM read of the planes instead
        # of one per masked-shift term (ops/corr_select.py)
        from .corr_select import select_taps_tpu
        c1 = select_taps_tpu(plane1, yi1, xi1, fy1, fx1, oy1, ox1,
                             H=H1, W=W1, radius=radius, interpret=interpret)
        c2 = select_taps_tpu(plane2, yi2, xi2, fy2, fx2, oy2, ox2,
                             H=H2, W=W2, radius=radius, interpret=interpret)
        return c1, c2

    c1 = _select_taps(plane1, xi1, yi1, fx1, fy1, oy1, ox1, H1, W1, radius, P)
    c2 = _select_taps(plane2, xi2, yi2, fx2, fy2, oy2, ox2, H2, W2, radius, P)
    return c1, c2
