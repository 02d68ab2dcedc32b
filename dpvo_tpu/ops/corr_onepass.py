"""One-pass correlation: plane dots + bilinear tap-select in ONE kernel.

The reference CUDA kernel does gather + dot + bilinear in a single pass
(dpvo/altcorr/correlation_kernel.cu:83-232).  Round 2 split that into a
per-edge MXU plane kernel (ops/corr_fused.py) plus a separate VPU select
kernel (ops/corr_select.py), paying for it three ways measured on v5e:

  * the (E, 9, 288)+(E, 9, 160) bf16 planes round-trip through HBM
    (~0.8 GB/frame at E=49k) between the two kernels;
  * the select kernel re-reads them into VMEM and upcasts to fp32 —
    a second full copy of the planes;
  * every edge is processed even when its pair slot is masked off
    (the pair table is a compacted prefix of valid pairs).

This kernel keeps each block's fp32 planes in VMEM scratch, runs the
tap-select epilogue on them in-register, and writes only the final
(E, 9, 49) taps per level.  Per-edge work is gated on a scalar-prefetched
valid-edge count `nv` (valid pairs are a prefix after _compact_pairs,
runtime/device_vo.py) — invalid edges cost one scalar compare.  Outputs for
edges >= nv are exact zeros.

Window geometry, padding, clamping, and masking semantics are identical to
ops/corr_fused.py (shared helpers); math parity with the exact XLA path
(ops/corr.py) is held by tests/test_corr_onepass.py including borders and
spread overflow.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .corr_fused import (WY, WX, WY2, WX2, TY, TX, D_MIN,
                         pad_slab, pad_slab2, _window_base)

EB = 32          # edges per grid step

_AVAILABLE = None


def kernel_available():
    """One-time pre-flight on tiny shapes; degrade to corr_fused on failure."""
    global _AVAILABLE
    if _AVAILABLE is None:
        try:
            rng = np.random.RandomState(0)
            E, H1, W1, F = EB, 64, 96, 2
            gmap = jnp.asarray(rng.randn(F * 4, 3, 3, 128), jnp.bfloat16)
            f1 = jnp.asarray(rng.randn(F, H1, W1, 128), jnp.bfloat16)
            f2 = jnp.asarray(rng.randn(F, H1 // 4, W1 // 4, 128),
                             jnp.bfloat16)
            coords = jnp.asarray(
                8.0 + rng.rand(E, 3, 3, 2) * 40.0, jnp.float32)
            kk = jnp.zeros((E,), jnp.int32)
            jj = jnp.zeros((E,), jnp.int32)
            c1, _ = corr_onepass(gmap, f1, f2, coords, kk, jj)
            _AVAILABLE = bool(np.isfinite(np.asarray(c1[0, 0, 0])).all())
        except Exception as e:                      # compile/execute failure
            import sys
            print(f'corr_onepass kernel unavailable, using corr_fused: '
                  f'{type(e).__name__}: {str(e)[:200]}', file=sys.stderr)
            _AVAILABLE = False
    return _AVAILABLE


def _pack_sel(yi, xi, oy, ox):
    """Per-pixel select scalars packed into one int32 stream.

    Layout: ox 4b | oy 3b | xi+8 10b | yi+8 10b.  oy/ox are clamped INTO
    the never-matching shift range (7 / 15 > Wy-8 / Wx-8) so patches whose
    projected spread overflows the window budget keep producing exact zeros
    (same semantics as corr_fused._select_taps)."""
    return (jnp.minimum(ox, 15) | (jnp.minimum(oy, 7) << 4)
            | ((xi + 8) << 7) | ((yi + 8) << 17)).astype(jnp.int32)


def _select_block(plane, sel, fy, fx, vrow, *, H, W, Wy, Wx, radius):
    """Bilinear tap-select over one block of fp32 planes (VPU epilogue).

    plane (R, Wy, Wx) f32; sel (R,) packed ints; fy/fx (R,) f32;
    vrow (R,) bool row validity.  Returns (R, d*d) f32, zeros where ~vrow.
    Same masked-static-shift math as ops/corr_select.py:_sel_kernel.
    """
    R = plane.shape[0]
    D = 2 * radius + 2
    d = 2 * radius + 1

    sel = sel.reshape(R, 1, 1)
    ox = sel & 0xF
    oy = (sel >> 4) & 0x7
    xi = ((sel >> 7) & 0x3FF) - 8
    yi = ((sel >> 17) & 0x3FF) - 8
    fy = fy.reshape(R, 1, 1)
    fx = fx.reshape(R, 1, 1)
    vm = vrow.reshape(R, 1, 1).astype(jnp.float32)

    ir = jax.lax.broadcasted_iota(jnp.int32, (R, d, 1), 1)
    ty = yi - radius + ir
    ay = (1.0 - fy) * ((ty >= 0) & (ty < H)).astype(jnp.float32)
    by = fy * ((ty + 1 >= 0) & (ty + 1 < H)).astype(jnp.float32)

    t1 = jnp.zeros((R, d, Wx), jnp.float32)
    for s in range(0, Wy - D + 1):
        m = (oy == s).astype(jnp.float32)
        lo = jax.lax.slice_in_dim(plane, s, s + d, axis=1)
        hi = jax.lax.slice_in_dim(plane, s + 1, s + 1 + d, axis=1)
        t1 = t1 + m * (ay * lo + by * hi)

    jr = jax.lax.broadcasted_iota(jnp.int32, (R, 1, d), 2)
    tx = xi - radius + jr
    ax = (1.0 - fx) * ((tx >= 0) & (tx < W)).astype(jnp.float32)
    bx = fx * ((tx + 1 >= 0) & (tx + 1 < W)).astype(jnp.float32)
    ax = ax * vm          # fold row-validity into one coefficient
    bx = bx * vm

    out = jnp.zeros((R, d, d), jnp.float32)
    for s in range(0, Wx - D + 1):
        m = (ox == s).astype(jnp.float32)
        lo = jax.lax.slice_in_dim(t1, s, s + d, axis=2)
        hi = jax.lax.slice_in_dim(t1, s + 1, s + 1 + d, axis=2)
        out = out + m * (ax * lo + bx * hi)
    return out.reshape(R, d * d)


def _onepass_kernel(nv_ref, pa_ref, pb_ref,
                    g_ref, s1_ref, fr1_ref, s2_ref, fr2_ref,
                    f1_hbm, f2_hbm,
                    out1_ref, out2_ref,
                    pl1, pl2, f1_vmem, f2_vmem, cur_ref, sem_ref,
                    *, H1, W1, H2, W2, radius):
    """Per grid step: EB edges' plane dots into fp32 VMEM scratch, then the
    tap-select epilogue for the whole block.  Slabs re-DMA only on target
    slot change (edges grouped by target); per-edge work is skipped for
    edges >= nv (their outputs are masked to exact zeros in the epilogue;
    scratch is zeroed once at block 0 so a short first block never reads
    uninitialized VMEM)."""
    blk = pl.program_id(0)
    nv = nv_ref[0]
    P2 = g_ref.shape[1]
    C = g_ref.shape[2]

    @pl.when(blk == 0)
    def _():
        cur_ref[0] = -1
        pl1[...] = jnp.zeros(pl1.shape, pl1.dtype)
        pl2[...] = jnp.zeros(pl2.shape, pl2.dtype)

    def body(e, _):
        gidx = blk * EB + e
        pa = pa_ref[gidx]
        pb = pb_ref[gidx]
        js = pa & 0xFF

        @pl.when((gidx < nv) & (js != cur_ref[0]))
        def _():
            cp1 = pltpu.make_async_copy(f1_hbm.at[js], f1_vmem, sem_ref.at[0])
            cp2 = pltpu.make_async_copy(f2_hbm.at[js], f2_vmem, sem_ref.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            cur_ref[0] = js

        @pl.when(gidx < nv)
        def _():
            g = g_ref[e]                                    # (P2, C)
            w1 = f1_vmem[pl.ds((pa >> 8) & 0x3FF, WY),
                         pl.ds(pl.multiple_of(((pa >> 18) & 0xFF) * 8, 8),
                               WX), :]
            pl1[e] = jax.lax.dot_general(
                g, w1.reshape(WY * WX, C), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            w2 = f2_vmem[(pb >> 18) & 1,
                         pl.ds(pb & 0x3FF, WY2),
                         pl.ds(pl.multiple_of(((pb >> 10) & 0xFF) * 8, 8),
                               WX2), :]
            pl2[e] = jax.lax.dot_general(
                g, w2.reshape(WY2 * WX2, C), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, EB, body, 0)

    # ---- tap-select epilogue: whole block, vectorized on the VPU ---- #
    R = EB * P2
    vrow = (blk * EB + jax.lax.broadcasted_iota(jnp.int32, (EB, P2), 0)
            ).reshape(R) < nv
    fr1 = fr1_ref[...]
    fr2 = fr2_ref[...]
    out1_ref[...] = _select_block(
        pl1[...].reshape(R, WY, WX), s1_ref[...].reshape(R),
        fr1[..., 0].reshape(R), fr1[..., 1].reshape(R), vrow,
        H=H1, W=W1, Wy=WY, Wx=WX, radius=radius).reshape(EB, P2, -1)
    out2_ref[...] = _select_block(
        pl2[...].reshape(R, WY2, WX2), s2_ref[...].reshape(R),
        fr2[..., 0].reshape(R), fr2[..., 1].reshape(R), vrow,
        H=H2, W=W2, Wy=WY2, Wx=WX2, radius=radius).reshape(EB, P2, -1)


@partial(jax.jit, static_argnames=('H1', 'W1', 'H2', 'W2', 'radius',
                                   'interpret'))
def _onepass_call(g9, fp1, fp2, pa, pb, s1, fr1, s2, fr2, nv,
                  *, H1, W1, H2, W2, radius, interpret=False):
    E, P2, C = g9.shape
    d = 2 * radius + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(E // EB,),
        in_specs=[
            pl.BlockSpec((EB, P2, C), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((EB, P2), lambda i, *_: (i, 0)),
            pl.BlockSpec((EB, P2, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((EB, P2), lambda i, *_: (i, 0)),
            pl.BlockSpec((EB, P2, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((EB, P2, d * d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((EB, P2, d * d), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((EB, P2, WY * WX), jnp.float32),
            pltpu.VMEM((EB, P2, WY2 * WX2), jnp.float32),
            pltpu.VMEM(fp1.shape[1:], fp1.dtype),
            pltpu.VMEM(fp2.shape[1:], fp2.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_onepass_kernel, H1=H1, W1=W1, H2=H2, W2=W2, radius=radius),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, P2, d * d), jnp.float32),
                   jax.ShapeDtypeStruct((E, P2, d * d), jnp.float32)],
        interpret=interpret,
    )(nv.reshape(1).astype(jnp.int32), pa.astype(jnp.int32),
      pb.astype(jnp.int32), g9, s1, fr1, s2, fr2, fp1, fp2)


def corr_onepass(gmap, fmap1, fmap2, coords, kk_slot, jj_slot, radius=3,
                 interpret=False, g9=None, prepadded=None, nv=None):
    """Drop-in replacement for ops/corr_fused.corr_fused with an optional
    valid-edge prefix count `nv` (traced int32; edges >= nv produce exact
    zeros).  Same contract: edges grouped by jj_slot; returns (c1, c2),
    each (E, 2R+1, 2R+1, P, P) float32 in the reference layout."""
    assert radius == 3, 'specialized for radius 3'
    E, P = coords.shape[0], coords.shape[1]
    d = 2 * radius + 1
    if prepadded is not None:
        (H1, W1), (H2, W2) = prepadded
        fp1, fp2 = fmap1, fmap2
    else:
        H1, W1 = fmap1.shape[1], fmap1.shape[2]
        H2, W2 = fmap2.shape[1], fmap2.shape[2]

    # same exact-XLA fallback gates as corr_fused (packed-field overflow)
    if (min(H1, H2) < D_MIN or min(W1, W2) < D_MIN
            or fmap1.shape[0] > 256 or max(H1, H2) + TY + 4 >= 1024
            or (max(W1, W2) + TX + 4) // 8 >= 256):
        from .corr_fused import corr_fused
        return corr_fused(gmap, fmap1, fmap2, coords, kk_slot, jj_slot,
                          radius=radius, interpret=interpret, g9=g9,
                          prepadded=prepadded)

    if prepadded is None:
        fp1 = pad_slab(fmap1)
        fp2 = pad_slab2(fmap2)

    xi1, yi1, fx1, fy1, by1, bx1, oy1, ox1 = \
        _window_base(coords, H1, W1, radius)
    xi2, yi2, fx2, fy2, by2, bx2, oy2, ox2 = \
        _window_base(coords / 4.0, H2, W2, radius, align=4, wy=WY2)

    ph2 = (bx2 // 4) % 2
    bx2s = bx2 - 4 * ph2
    jsl32 = jj_slot.astype(jnp.int32)
    pa = (jsl32 | (by1 << 8) | ((bx1 // 8) << 18))
    pb = (by2 | ((bx2s // 8) << 10) | (ph2 << 18))

    s1 = _pack_sel(yi1, xi1, oy1, ox1)
    s2 = _pack_sel(yi2, xi2, oy2, ox2)
    fr1 = jnp.stack([fy1, fx1], axis=-1).astype(jnp.float32)
    fr2 = jnp.stack([fy2, fx2], axis=-1).astype(jnp.float32)

    if g9 is None:
        g9 = gmap[kk_slot].reshape(E, P * P, gmap.shape[-1])
    if nv is None:
        nv = jnp.asarray(E, jnp.int32)

    Epad = -(-E // EB) * EB
    if Epad != E:
        padn = Epad - E

        def padrows(a):
            return jnp.concatenate(
                [a, jnp.zeros((padn,) + a.shape[1:], a.dtype)], 0)
        g9, s1, fr1, s2, fr2 = map(padrows, (g9, s1, fr1, s2, fr2))
        # padded edges reuse the last real slot word (no slab reload)
        pa = jnp.concatenate([pa, jnp.broadcast_to(pa[-1:], (padn,))])
        pb = jnp.concatenate([pb, jnp.broadcast_to(pb[-1:], (padn,))])
    nv = jnp.minimum(jnp.asarray(nv, jnp.int32), E)

    t1, t2 = _onepass_call(g9, fp1, fp2, pa, pb, s1, fr1, s2, fr2, nv,
                           H1=H1, W1=W1, H2=H2, W2=W2, radius=radius,
                           interpret=interpret)
    c1 = t1[:E].reshape(E, P, P, d, d).transpose(0, 4, 3, 1, 2)
    c2 = t2[:E].reshape(E, P, P, d, d).transpose(0, 4, 3, 1, 2)
    return c1, c2
