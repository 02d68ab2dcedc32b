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
(E, 9, 49) taps per level.

LAYOUT RULE (current Mosaic): in-kernel reshapes must PRESERVE the lane
(last) dimension — collapsing/splitting leading dims is fine, anything
that moves data across lanes ("(32,9)->(288,)", "(R,288)->(R,12,24)") is
rejected with "infer-vector-layout: unsupported shape cast".  The whole
epilogue therefore runs on FLAT (R, Wy*Wx) planes:

  * a window-row shift `s` is the contiguous lane slice [s*Wx, s*Wx+d*Wx);
  * the column pass shifts the flat row-pass result by `s` lanes (group
    crossings land on tap columns k >= d, which are discarded);
  * the final (d*Wx) -> (d*d) tap compaction is d masked static lane
    slices (_compact_taps; scatter-free, and much cheaper than an MXU
    selection matmul, whose operand relayouts dominate).

Work is gated on a scalar-prefetched valid-edge prefix count `nv` (valid
pairs are a prefix after _compact_pairs, runtime/device_vo.py): blocks
wholly past `nv` skip the dots AND the epilogue (they only zero their
output tiles), so cost scales with the live edge count, not the capacity.

Window geometry, padding, clamping, and masking semantics follow
ops/corr_fused.py (shared helpers), except that L1 uses a 4-aligned
16-col window over an in-VMEM phase pair (see WX1 below); math parity with
the exact XLA path (ops/corr.py) is held by tests/test_corr_onepass.py
including borders and spread overflow.  `ox` is packed with 5 bits so the
overflow clamp (31) can never alias a legal in-window shift.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .corr_fused import (WY, WY2, WX2, TY, TX, D_MIN, pad_hw,
                         pad_slab2, _window_base)

EB = 32          # edges per grid step
# L1 window cols: 16 instead of corr_fused's 24.  The slab is held as a
# PHASE PAIR in HBM (phase B shifted 4 px, same trick pad_slab2 plays for
# L2 — DMA slices need 8-aligned sublane starts, so the shift cannot be
# applied at copy time), so any 4-aligned base is 8-aligned in one phase:
# alignment slack drops 7 -> 3, the merged dot shrinks (448 -> 352
# contraction rows) and the column-shift epilogue needs 9 masked passes
# over 112 lanes instead of 17 over 168.  Affordable now that the
# scoped-vmem cap is raised (2x 7.4 MB slab copies at 640x480).  The
# guaranteed x-spread budget is unchanged (5 px; slack 3 + spread 5 + 8
# taps = 16).
WX1 = 16


def pad_slab1pair(f):
    """(F, H, W, C) -> (F, 2, Hp, Wp, C) L1 phase pair (pad_hw dims).

    Phase B is shifted 4 px in x: any 4-aligned window base is 8-aligned
    in one of the two copies (mirrors pad_slab2's L2 trick)."""
    F, H, W, C = f.shape
    Hp, Wp = pad_hw(H, W)
    fa = jnp.pad(f, ((0, 0), (TY, Hp - H - TY), (TX, Wp - W - TX), (0, 0)))
    fb = jnp.pad(f, ((0, 0), (TY, Hp - H - TY),
                     (TX - 4, Wp - W - TX + 4), (0, 0)))
    return jnp.stack([fa, fb], axis=1)

_AVAILABLE = {}      # keyed by feature-map dims: viability is shape-dependent


def kernel_available(H1=120, W1=160):
    """One-time pre-flight; degrade to corr_fused on failure.

    Runs at the CALLER's feature-map resolution (default = the 640x480
    flagship config) with F=2 frames: scoped-VMEM viability depends on the
    padded slab dims, not the frame count, and the round-3 tiny-shape
    preflight green-lit a kernel that OOMed scoped vmem at 640x480 mid-
    bench.  Retries transient remote-compile failures (the axon compile
    helper can 500 sporadically; round 3 nearly lost its fast path to a
    single flake) before declaring the kernel unavailable."""
    key = (int(H1), int(W1))
    if key not in _AVAILABLE:
        import time
        last = None
        for attempt in range(3):
            try:
                rng = np.random.RandomState(0)
                E, F = EB, 2
                gmap = jnp.asarray(rng.randn(F * 4, 3, 3, 128), jnp.bfloat16)
                f1 = jnp.asarray(rng.randn(F, H1, W1, 128), jnp.bfloat16)
                f2 = jnp.asarray(rng.randn(F, H1 // 4, W1 // 4, 128),
                                 jnp.bfloat16)
                coords = jnp.asarray(
                    8.0 + rng.rand(E, 3, 3, 2) * 40.0, jnp.float32)
                kk = jnp.zeros((E,), jnp.int32)
                jj = jnp.zeros((E,), jnp.int32)
                c1, _ = corr_onepass(gmap, f1, f2, coords, kk, jj)
                _AVAILABLE[key] = bool(
                    np.isfinite(np.asarray(c1[0, 0, 0])).all())
                return _AVAILABLE[key]
            except Exception as e:                  # compile/execute failure
                last = e
                time.sleep(2.0 * (attempt + 1))
        import sys
        print(f'corr_onepass kernel unavailable, using corr_fused: '
              f'{type(last).__name__}: {str(last)[:200]}', file=sys.stderr)
        _AVAILABLE[key] = False
    return _AVAILABLE[key]


def _select_flat(plane, yi, xi, fy, fx, oy, ox, vrow,
                 *, H, W, Wy, Wx, radius):
    """Bilinear tap-select over one block of FLAT fp32 planes (VPU epilogue).

    plane (R, Wy*Wx) f32 — window row i at lanes [i*Wx, (i+1)*Wx);
    yi/xi/oy/ox (R, 1) f32 holding exact small ints; fy/fx (R, 1) f32;
    vrow (R, 1) f32 validity.  Rows whose oy/ox fall outside the window
    budget match no shift and produce exact zeros (spread overflow).
    Returns (R, d*Wx) f32 where the tap at (i, k) lives at lane i*Wx + k
    (lanes k >= d are junk, discarded by _compact_taps); rows with
    vrow == 0 are exact zeros.  Lane-dim-preserving throughout.
    """
    R = plane.shape[0]
    D = 2 * radius + 2
    d = 2 * radius + 1
    FW = d * Wx

    # row pass: t1 lane i*Wx + x  =  ay_i * plane[oy+i, x] + by_i * [oy+i+1]
    ir = jax.lax.broadcasted_iota(jnp.int32, (R, FW), 1) // Wx
    ty = yi - radius + ir
    ay = (1.0 - fy) * ((ty >= 0) & (ty < H)).astype(jnp.float32)
    by = fy * ((ty + 1 >= 0) & (ty + 1 < H)).astype(jnp.float32)

    t1 = jnp.zeros((R, FW), jnp.float32)
    for s in range(0, Wy - D + 1):
        m = (oy == s).astype(jnp.float32)
        lo = jax.lax.slice_in_dim(plane, s * Wx, s * Wx + FW, axis=1)
        hi = jax.lax.slice_in_dim(plane, (s + 1) * Wx, (s + 1) * Wx + FW,
                                  axis=1)
        t1 = t1 + m * (ay * lo + by * hi)
    # one junk group of padding so shifted slices stay in bounds
    t1 = jnp.concatenate([t1, jnp.zeros((R, Wx), jnp.float32)], axis=1)

    # column pass: out lane i*Wx + k = ax_k * t1[i*Wx+k+s] + bx_k * [.. +s+1]
    # (k + s <= Wx - 2 for real taps k < d, so shifts never cross groups)
    jr = jax.lax.broadcasted_iota(jnp.int32, (R, FW), 1) % Wx
    tx = xi - radius + jr
    ax = (1.0 - fx) * ((tx >= 0) & (tx < W)).astype(jnp.float32)
    bx = fx * ((tx + 1 >= 0) & (tx + 1 < W)).astype(jnp.float32)
    ax = ax * vrow          # fold row-validity into one coefficient
    bx = bx * vrow

    out = jnp.zeros((R, FW), jnp.float32)
    for s in range(0, Wx - D + 1):
        m = (ox == s).astype(jnp.float32)
        lo = jax.lax.slice_in_dim(t1, s, s + FW, axis=1)
        hi = jax.lax.slice_in_dim(t1, s + 1, s + 1 + FW, axis=1)
        out = out + m * (ax * lo + bx * hi)
    return out


def _compact_taps(w, Wx, radius):
    """(R, d*Wx) -> (R, d*d): flat lane i*Wx + k -> tap i*d + k.

    Seven masked STATIC lane slices (output lane j of piece i reads input
    lane j + (Wx-d)*i; the piece mask j//d == i is a constant).  Replaces a
    (R, d*Wx) x (d*Wx, d*d) f32 selection matmul whose VPU<->MXU operand
    relayouts cost ~6 us per block (~9 ms/frame at E=49k) — far more than
    this pure-VPU form."""
    R = w.shape[0]
    d = 2 * radius + 1
    jl = jax.lax.broadcasted_iota(jnp.int32, (R, d * d), 1) // d
    out = jnp.zeros((R, d * d), jnp.float32)
    for i in range(d):
        piece = jax.lax.slice_in_dim(w, (Wx - d) * i, (Wx - d) * i + d * d,
                                     axis=1)
        out = out + jnp.where(jl == i, piece, 0.0)
    return out


def _onepass_kernel(nv_ref, pa_ref, pb_ref, gb_ref,
                    sxy_ref,
                    g_hbm, f1_hbm, f2_hbm,
                    out1_ref, out2_ref,
                    pl1, pl2, g_vmem, f1_vmem, f2_vmem, cur_ref, sem_ref,
                    *, H1, W1, H2, W2, radius, gated=True):
    """Per grid step: EB edges' plane dots into flat fp32 VMEM scratch, then
    the tap-select epilogue + compaction matmul for the whole block.  Slabs
    re-DMA only on target slot change (edges grouped by target).  The EB
    g-rows DMA per block from `g_hbm` rows [gb, gb+EB) (gb_ref scalar-
    prefetched): the pair-blocked edge tables make each block's gmap rows
    CONTIGUOUS, so the caller never materializes the per-edge (E, P2, C)
    gather (~113 MB + a 0.6 ms relayout at E=49k).  With gated=True, blocks
    wholly past `nv` only zero their output tiles."""
    blk = pl.program_id(0)
    nv = nv_ref[0]
    P2 = out1_ref.shape[0] // EB     # g_vmem dim 1 is P2 PADDED to 16
    C = g_vmem.shape[2]
    R = EB * P2
    d = 2 * radius + 1

    @pl.when(blk == 0)
    def _():
        cur_ref[0] = -1

    active = blk * EB < nv

    def _run_block():
        cpg = pltpu.make_async_copy(
            g_hbm.at[pl.ds(gb_ref[blk], EB)], g_vmem, sem_ref.at[2])
        cpg.start()
        # NO per-edge validity predication inside the loop: a per-edge
        # pl.when around the dot defeats Mosaic's software pipelining
        # (measured 730 ns/edge vs the 250 ns floor).  Edges past nv within
        # the boundary block compute garbage planes — harmless, the
        # epilogue's vrow mask zeroes those rows (slot words are clamped
        # into range upstream, so the slab DMA index is always valid).
        cpg.wait()

        def body(e, _):
            gidx = blk * EB + e
            pa = pa_ref[gidx]
            pb = pb_ref[gidx]
            js = pa & 0xFF

            @pl.when(js != cur_ref[0])
            def _():
                cp1 = pltpu.make_async_copy(f1_hbm.at[js], f1_vmem,
                                            sem_ref.at[0])
                cp2 = pltpu.make_async_copy(f2_hbm.at[js], f2_vmem,
                                            sem_ref.at[1])
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()
                cur_ref[0] = js

            g = g_vmem[e, :P2, :]                           # (P2, C)
            w1 = f1_vmem[(pa >> 26) & 1,
                         pl.ds((pa >> 8) & 0x3FF, WY),
                         pl.ds(pl.multiple_of(((pa >> 18) & 0xFF) * 8, 8),
                               WX1), :]
            w2 = f2_vmem[(pb >> 18) & 1,
                         pl.ds(pb & 0x3FF, WY2),
                         pl.ds(pl.multiple_of(((pb >> 10) & 0xFF) * 8, 8),
                               WX2), :]
            # ONE merged dot per edge (both levels): per-edge MXU issue
            # overhead dominates at 9 rows, so splitting the levels into
            # two dots doubles the ~250 ns/edge floor (v5e, EB sweep).
            w12 = jnp.concatenate(
                [w1.reshape(WY * WX1, C), w2.reshape(WY2 * WX2, C)],
                axis=0)
            p12 = jax.lax.dot_general(
                g, w12, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            pl1[e] = p12[:, :WY * WX1].astype(pl1.dtype)
            pl2[e] = p12[:, WY * WX1:].astype(pl2.dtype)
            return 0

        jax.lax.fori_loop(0, EB, body, 0)

        # ---- tap-select epilogue: whole block, pure VPU ----
        # Per-pixel select scalars are computed HERE from one (EB, 64) f32
        # stream of raw coords + per-edge window bases (natural XLA layout,
        # one DMA).  The round-3 (R, 1)/(R, 2) stream formulation forced
        # XLA to relayout T(1,128)-major producers into pallas's {1,0}
        # operand layout — ~7 ms/frame of copies/reshapes/pack fusions.
        rrow = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        vrow = ((blk * EB + rrow // P2) < nv).astype(jnp.float32)
        Zr = jnp.repeat(sxy_ref[...], P2, axis=0)           # (R, 64)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 64), 1)
        pix = rrow % P2

        def sel(base):
            return jnp.sum(jnp.where(lane == base + pix, Zr, 0.0),
                           axis=1, keepdims=True)

        def derive(x, y, bx, by, H, W):
            xf = jnp.floor(x)
            yf = jnp.floor(y)
            xi = jnp.clip(xf, -7.0, W + 7.0)
            yi = jnp.clip(yf, -7.0, H + 7.0)
            return (yi, xi, y - yf, x - xf,
                    yi - radius - by, xi - radius - bx)

        yi1, xi1, fy1, fx1, oy1, ox1 = derive(
            sel(0), sel(P2), Zr[:, 36:37], Zr[:, 37:38], H1, W1)
        yi2, xi2, fy2, fx2, oy2, ox2 = derive(
            sel(2 * P2), sel(3 * P2), Zr[:, 38:39], Zr[:, 39:40], H2, W2)

        w1 = _select_flat(pl1[...].reshape(R, WY * WX1),
                          yi1, xi1, fy1, fx1, oy1, ox1, vrow,
                          H=H1, W=W1, Wy=WY, Wx=WX1, radius=radius)
        out1_ref[...] = _compact_taps(w1, WX1, radius).astype(out1_ref.dtype)
        w2 = _select_flat(pl2[...].reshape(R, WY2 * WX2),
                          yi2, xi2, fy2, fx2, oy2, ox2, vrow,
                          H=H2, W=W2, Wy=WY2, Wx=WX2, radius=radius)
        out2_ref[...] = _compact_taps(w2, WX2, radius).astype(out2_ref.dtype)

    def _zero_block():
        out1_ref[...] = jnp.zeros((R, d * d), out1_ref.dtype)
        out2_ref[...] = jnp.zeros((R, d * d), out2_ref.dtype)

    if gated:
        pl.when(active)(_run_block)
        pl.when(jnp.logical_not(active))(_zero_block)
    else:
        _run_block()


@partial(jax.jit, static_argnames=('H1', 'W1', 'H2', 'W2', 'radius',
                                   'out_dtype', 'interpret'))
def _onepass_call(g_rows, gb, fp1, fp2, pa, pb, sxy, nv,
                  *, H1, W1, H2, W2, radius, out_dtype=jnp.float32,
                  interpret=False):
    """g_rows: (NR, P2PAD, C) g-row source in HBM, P2 padded to P2PAD=16
    sublanes (DMA slices must be sublane-aligned); gb: (nblocks,) int32 row
    base per grid block (rows [gb, gb+EB) are that block's edges' g9).
    P2 itself rides the `radius`-independent constant 9 (P=3 patches)."""
    E = pa.shape[0]
    _, P2PAD, C = g_rows.shape
    P2 = 9
    d = 2 * radius + 1
    R = EB * P2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(E // EB,),
        in_specs=[
            pl.BlockSpec((EB, 64), lambda i, *_: (i, 0)),   # coords+bases
            pl.BlockSpec(memory_space=pl.ANY),              # g-rows
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((R, d * d), lambda i, *_: (i, 0)),
            pl.BlockSpec((R, d * d), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((EB, P2, WY * WX1), jnp.float32),
            pltpu.VMEM((EB, P2, WY2 * WX2), jnp.float32),
            pltpu.VMEM((EB, P2PAD, C), g_rows.dtype),
            pltpu.VMEM(fp1.shape[1:], fp1.dtype),   # (2, Hp, Wp, C) pair
            pltpu.VMEM(fp2.shape[1:], fp2.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        partial(_onepass_kernel, H1=H1, W1=W1, H2=H2, W2=W2, radius=radius),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E * P2, d * d), out_dtype),
                   jax.ShapeDtypeStruct((E * P2, d * d), out_dtype)],
        # default 16 MB scoped-vmem limit OOMs at 640x480 production shape
        # (frame slabs ~9.5 MB + the unrolled flat-epilogue temporaries =
        # 20.8 MB measured); v5e has 128 MB VMEM, so raise the cap.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(nv.reshape(1).astype(jnp.int32), pa.astype(jnp.int32),
      pb.astype(jnp.int32), gb.astype(jnp.int32), sxy, g_rows, fp1, fp2)


def corr_onepass(gmap, fmap1, fmap2, coords, kk_slot, jj_slot, radius=3,
                 interpret=False, g9=None, prepadded=None, nv=None,
                 layout='reference', out_dtype=jnp.float32,
                 rows_contiguous=False):
    """Drop-in replacement for ops/corr_fused.corr_fused with an optional
    valid-edge prefix count `nv` (traced int32; edges >= nv produce exact
    zeros).  Same contract: edges grouped by jj_slot; returns (c1, c2).

    layout='reference': each (E, 2R+1, 2R+1, P, P) float32 (reference
    altcorr layout) — costs two full-output relayout transposes (~11 ms at
    E=49k, as much as the kernel itself).
    layout='native': each (E, P*P, (2R+1)**2) float32, the kernel's own
    row/tap order (row = py*P+px, col = dy*(2R+1)+dx) with NO device-side
    relayout; consumers absorb the fixed channel permutation into the
    update.corr.0 weight rows (models/vonet.py:corr_native_perm)."""
    assert radius == 3, 'specialized for radius 3'
    E, P = coords.shape[0], coords.shape[1]
    d = 2 * radius + 1
    if prepadded is not None:
        # prepadded fmap1 must be the (F, 2, Hp, Wp, C) L1 PHASE PAIR
        # (pad_slab1pair) — NOT corr_fused's single-phase pad_slab format
        assert fmap1.ndim == 5 and fmap1.shape[1] == 2, \
            'corr_onepass prepadded L1 slab must be a pad_slab1pair'
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
        if prepadded is not None:
            # phase A of the pair IS corr_fused's pad_slab layout (one
            # extra slab copy; only reachable at off-gamut resolutions the
            # driver preflight would not have selected this kernel for)
            fmap1 = fmap1[:, 0]
        c1, c2 = corr_fused(gmap, fmap1, fmap2, coords, kk_slot, jj_slot,
                            radius=radius, interpret=interpret, g9=g9,
                            prepadded=prepadded)
        if layout == 'native':
            c1 = c1.transpose(0, 3, 4, 1, 2).reshape(E, P * P, d * d)
            c2 = c2.transpose(0, 3, 4, 1, 2).reshape(E, P * P, d * d)
        return c1.astype(out_dtype), c2.astype(out_dtype)

    if prepadded is None:
        fp1 = pad_slab1pair(fmap1)
        fp2 = pad_slab2(fmap2)

    # align=4 on BOTH levels: each level has a phase-pair slab
    _, _, _, _, by1, bx1, _, _ = \
        _window_base(coords, H1, W1, radius, align=4)
    _, _, _, _, by2, bx2, _, _ = \
        _window_base(coords / 4.0, H2, W2, radius, align=4, wy=WY2)

    ph1 = (bx1 // 4) % 2
    bx1s = bx1 - 4 * ph1
    ph2 = (bx2 // 4) % 2
    bx2s = bx2 - 4 * ph2
    jsl32 = jj_slot.astype(jnp.int32)
    pa = (jsl32 | (by1 << 8) | ((bx1s // 8) << 18) | (ph1 << 26))
    pb = (by2 | ((bx2s // 8) << 10) | (ph2 << 18))

    # ONE (E, 64) f32 stream of raw per-pixel coords + per-edge window
    # bases (image coords); the kernel derives floor/frac/offset/validity
    # per pixel itself.  Natural {1,0} layout — no relayout copies.
    x1 = coords[..., 0].reshape(E, P * P).astype(jnp.float32)
    y1 = coords[..., 1].reshape(E, P * P).astype(jnp.float32)
    bases = jnp.stack(
        [bx1 - TX, by1 - TY, bx2 - TX, by2 - TY], axis=-1
    ).astype(jnp.float32)
    sxy = jnp.concatenate(
        [x1, y1, x1 / 4.0, y1 / 4.0, bases,
         jnp.zeros((E, 64 - 4 * P * P - 4), jnp.float32)], axis=1)

    if nv is None:
        nv = jnp.asarray(E, jnp.int32)

    # g-row source for the kernel's per-block DMA: with rows_contiguous
    # (the pair-blocked runtime tables: kk_slot = psl*M + arange(M) per
    # pair, EB | M) the kernel reads gmap rows directly and the per-edge
    # (E, P2, C) gather (~113 MB + a 0.6 ms relayout at E=49k) never
    # materializes; otherwise pre-gather g9 rows (then block i's rows are
    # [i*EB, (i+1)*EB) by construction).
    if rows_contiguous and E % EB == 0 and g9 is None:
        g_rows = gmap.reshape(gmap.shape[0], P * P, gmap.shape[-1])
        gb = kk_slot.astype(jnp.int32).reshape(E // EB, EB)[:, 0]
    else:
        if g9 is None:
            g9 = gmap[kk_slot].reshape(E, P * P, gmap.shape[-1])
        g_rows, gb = g9, None

    Epad = -(-E // EB) * EB
    if Epad != E:
        padn = Epad - E

        def padrows(a):
            return jnp.concatenate(
                [a, jnp.zeros((padn,) + a.shape[1:], a.dtype)], 0)
        sxy = padrows(sxy)
        if gb is None:
            g_rows = padrows(g_rows)
        # padded edges reuse the last real slot word (no slab reload)
        pa = jnp.concatenate([pa, jnp.broadcast_to(pa[-1:], (padn,))])
        pb = jnp.concatenate([pb, jnp.broadcast_to(pb[-1:], (padn,))])
    if gb is None:
        gb = jnp.arange(Epad // EB, dtype=jnp.int32) * EB
    nv = jnp.minimum(jnp.asarray(nv, jnp.int32), E)

    # pad the P2 dim to 16 sublanes (kernel DMA slices must be sublane-
    # aligned); ~14 MB/frame on the contiguous path, trivially cheap next
    # to the (E, P2, C) gather it replaces
    g_rows = jnp.pad(g_rows, ((0, 0), (0, 16 - P * P), (0, 0)))

    t1, t2 = _onepass_call(g_rows, gb, fp1, fp2, pa, pb, sxy, nv,
                           H1=H1, W1=W1, H2=H2, W2=W2, radius=radius,
                           out_dtype=out_dtype, interpret=interpret)
    if layout == 'native':
        return (t1.reshape(Epad, P * P, d * d)[:E],
                t2.reshape(Epad, P * P, d * d)[:E])
    c1 = t1.reshape(Epad, P * P, d * d)[:E].reshape(E, P, P, d, d)
    c2 = t2.reshape(Epad, P * P, d * d)[:E].reshape(E, P, P, d, d)
    return c1.transpose(0, 4, 3, 1, 2), c2.transpose(0, 4, 3, 1, 2)
