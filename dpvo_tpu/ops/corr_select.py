"""Tap-select + bilinear as a Pallas kernel — kills the HBM-bound pass.

`corr_fused._select_taps` resolves each patch pixel's 8x8 tap block out of
the kernel-emitted correlation planes with masked static shifts. As XLA
elementwise work that pass re-reads the (E, 9, WY*WX) bf16 planes once per
shift term (18 L1 + 12 L2 = several GB of HBM traffic, ~7 ms/frame at the
default config). This kernel streams each plane block through VMEM ONCE
and does the same shifts on-chip: HBM traffic drops to one read of the
planes + one write of the (E, 9, 49) taps.

Math is identical to _select_taps (reference layout + border masking +
spread-overflow zeroing, correlation_kernel.cu:83-232); the parity test
runs both. Separate kernel (not fused into the plane kernel) so the
per-edge MXU loop keeps its minimal shape and this VPU pass gets
block-level (EBS*9 rows) vectorization instead of per-edge work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EBS = 256      # edges per grid step

_AVAILABLE = None


def kernel_available():
    """One-time pre-flight: compile+run the kernel on tiny shapes.

    Mosaic lowering of sub-lane-width static slices is the one uncertain
    construct here; a compile failure must degrade to the XLA select pass
    (corr_fused._select_taps), not crash the caller's first real dispatch.
    Result is cached for the process.
    """
    global _AVAILABLE
    if _AVAILABLE is None:
        try:
            import numpy as np
            E = EBS
            ints = jnp.zeros((E, 9), jnp.int32)
            frac = jnp.zeros((E, 9), jnp.float32)
            ok = True
            # probe BOTH production window shapes (L1 and L2) — a Mosaic
            # lowering failure specific to one must also degrade
            for wy, wx in ((12, 24), (10, 16)):
                plane = jnp.zeros((E, 9, wy, wx), jnp.bfloat16)
                out = select_taps_tpu(plane, ints, ints, frac, frac, ints,
                                      ints, H=64, W=96, radius=3)
                ok &= bool(np.isfinite(np.asarray(out[0, 0, 0])).all())
            _AVAILABLE = ok
        except Exception as e:              # compile or execute failure
            import sys
            print(f'corr_select kernel unavailable, using XLA select: '
                  f'{type(e).__name__}: {str(e)[:200]}', file=sys.stderr)
            _AVAILABLE = False
    return _AVAILABLE


def _sel_kernel(plane_ref, yi_ref, xi_ref, fy_ref, fx_ref, oy_ref, ox_ref,
                out_ref, *, H, W, Wy, Wx, radius):
    """One block: (EBS, 9, Wy, Wx) planes -> (EBS, 9, d*d) taps."""
    D = 2 * radius + 2
    d = 2 * radius + 1
    EB9 = plane_ref.shape[0] * plane_ref.shape[1]

    plane = plane_ref[...].reshape(EB9, Wy, Wx).astype(jnp.float32)
    yi = yi_ref[...].reshape(EB9, 1, 1)
    xi = xi_ref[...].reshape(EB9, 1, 1)
    fy = fy_ref[...].reshape(EB9, 1, 1).astype(jnp.float32)
    fx = fx_ref[...].reshape(EB9, 1, 1).astype(jnp.float32)
    oy = oy_ref[...].reshape(EB9, 1, 1)
    ox = ox_ref[...].reshape(EB9, 1, 1)

    ir = jax.lax.broadcasted_iota(jnp.int32, (EB9, d, 1), 1)
    ty = yi - radius + ir                               # tap row i
    vy_lo = ((ty >= 0) & (ty < H)).astype(jnp.float32)
    vy_hi = ((ty + 1 >= 0) & (ty + 1 < H)).astype(jnp.float32)
    ay = (1.0 - fy) * vy_lo                             # (EB9, d, 1)
    by = fy * vy_hi

    # y pass: t1[r, i, x] = ay*plane[oy+i, x] + by*plane[oy+i+1, x]
    t1 = jnp.zeros((EB9, d, Wx), jnp.float32)
    for s in range(0, Wy - D + 1):
        m = (oy == s).astype(jnp.float32)
        lo = jax.lax.slice_in_dim(plane, s, s + d, axis=1)
        hi = jax.lax.slice_in_dim(plane, s + 1, s + 1 + d, axis=1)
        t1 = t1 + m * (ay * lo + by * hi)

    jr = jax.lax.broadcasted_iota(jnp.int32, (EB9, 1, d), 2)
    tx = xi - radius + jr
    vx_lo = ((tx >= 0) & (tx < W)).astype(jnp.float32)
    vx_hi = ((tx + 1 >= 0) & (tx + 1 < W)).astype(jnp.float32)
    ax = (1.0 - fx) * vx_lo                             # (EB9, 1, d)
    bx = fx * vx_hi

    # x pass: out[r, i, j] = ax*t1[..., ox+j] + bx*t1[..., ox+j+1]
    out = jnp.zeros((EB9, d, d), jnp.float32)
    for s in range(0, Wx - D + 1):
        m = (ox == s).astype(jnp.float32)
        lo = jax.lax.slice_in_dim(t1, s, s + d, axis=2)
        hi = jax.lax.slice_in_dim(t1, s + 1, s + 1 + d, axis=2)
        out = out + m * (ax * lo + bx * hi)

    out_ref[...] = out.reshape(plane_ref.shape[0], plane_ref.shape[1], d * d)


@partial(jax.jit, static_argnames=('H', 'W', 'radius', 'interpret'))
def select_taps_tpu(plane, yi, xi, fy, fx, oy, ox, *, H, W, radius=3,
                    interpret=False):
    """plane (E, P2, Wy, Wx) bf16; per-pixel ints yi/xi/oy/ox (E, P2) and
    fractions fy/fx (E, P2). Returns (E, d, d, P, P) float32 in the
    reference layout — same contract as corr_fused._select_taps."""
    E, P2, Wy, Wx = plane.shape
    d = 2 * radius + 1
    P = 3

    Epad = -(-E // EBS) * EBS
    if Epad != E:
        pn = Epad - E
        plane = jnp.concatenate(
            [plane, jnp.zeros((pn,) + plane.shape[1:], plane.dtype)], 0)
        pad1 = jnp.zeros((pn, P2), yi.dtype)
        yi, xi = jnp.concatenate([yi, pad1]), jnp.concatenate([xi, pad1])
        oy, ox = jnp.concatenate([oy, pad1]), jnp.concatenate([ox, pad1])
        padf = jnp.zeros((pn, P2), fy.dtype)
        fy, fx = jnp.concatenate([fy, padf]), jnp.concatenate([fx, padf])

    grid = (Epad // EBS,)
    out = pl.pallas_call(
        partial(_sel_kernel, H=H, W=W, Wy=Wy, Wx=Wx, radius=radius),
        grid=grid,
        in_specs=[
            pl.BlockSpec((EBS, P2, Wy, Wx), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((EBS, P2), lambda i: (i, 0)),
            pl.BlockSpec((EBS, P2), lambda i: (i, 0)),
            pl.BlockSpec((EBS, P2), lambda i: (i, 0)),
            pl.BlockSpec((EBS, P2), lambda i: (i, 0)),
            pl.BlockSpec((EBS, P2), lambda i: (i, 0)),
            pl.BlockSpec((EBS, P2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((EBS, P2, d * d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Epad, P2, d * d), jnp.float32),
        interpret=interpret,
    )(plane, yi, xi, fy, fx, oy, ox)

    out = out[:E].reshape(E, P, P, d, d)
    return out.transpose(0, 4, 3, 1, 2)
