"""Parity: frame-resident fused correlation vs the XLA reference path."""
import numpy as np
import pytest

import jax.numpy as jnp

from dpvo_tpu.ops.corr import corr as corr_xla
from dpvo_tpu.ops.corr_fused import corr_fused

P = 3
C = 128


def make_case(E=96, H1=64, W1=96, F=4, seed=0, border_frac=0.2):
    rng = np.random.RandomState(seed)
    gmap = rng.randn(F * 16, P, P, C).astype(np.float32)
    fmap1 = rng.randn(F, H1, W1, C).astype(np.float32)
    fmap2 = rng.randn(F, H1 // 4, W1 // 4, C).astype(np.float32)

    # patch centers: mostly interior, some near borders; pixels spread ±1.3
    n_border = int(E * border_frac)
    cx = np.concatenate([rng.uniform(8, W1 - 9, E - n_border),
                         rng.uniform(0, 4, n_border)])
    cy = np.concatenate([rng.uniform(8, H1 - 9, E - n_border),
                         rng.uniform(H1 - 4, H1 - 1, n_border)])
    off = np.linspace(-1.0, 1.0, P)
    gx = cx[:, None, None] + off[None, None, :] + \
        rng.uniform(-0.3, 0.3, (E, P, P))
    gy = cy[:, None, None] + off[None, :, None] + \
        rng.uniform(-0.3, 0.3, (E, P, P))
    coords = np.stack([gx, gy], -1).astype(np.float32)

    kk = rng.randint(0, F * 16, E).astype(np.int32)
    jj = np.sort(rng.randint(0, F, E)).astype(np.int32)   # grouped by target
    return gmap, fmap1, fmap2, coords, kk, jj


def test_corr_fused_matches_xla_interpret():
    gmap, fmap1, fmap2, coords, kk, jj = make_case()
    g16 = jnp.asarray(gmap, jnp.bfloat16)
    f1 = jnp.asarray(fmap1, jnp.bfloat16)
    f2 = jnp.asarray(fmap2, jnp.bfloat16)

    c1, c2 = corr_fused(g16, f1, f2, jnp.asarray(coords),
                        jnp.asarray(kk), jnp.asarray(jj), interpret=True)

    r1 = corr_xla(g16, f1, jnp.asarray(coords), jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)
    r2 = corr_xla(g16, f2, jnp.asarray(coords) / 4.0, jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)

    # bf16 planes + bf16 one-hot selection: ~1% relative of the |corr| scale
    scale = np.abs(np.asarray(r1)).max()
    np.testing.assert_allclose(np.asarray(c1), np.asarray(r1),
                               atol=0.02 * scale)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(r2),
                               atol=0.02 * scale)


def test_corr_fused_small_map_fallback():
    """Maps smaller than the window route through the exact XLA path."""
    gmap, fmap1, fmap2, coords, kk, jj = make_case(E=16, H1=32, W1=48, F=2)
    g16 = jnp.asarray(gmap, jnp.bfloat16)
    f1 = jnp.asarray(fmap1, jnp.bfloat16)
    f2 = jnp.asarray(fmap2, jnp.bfloat16)
    c1, c2 = corr_fused(g16, f1, f2, jnp.asarray(coords),
                        jnp.asarray(kk), jnp.asarray(jj))
    r1 = corr_xla(g16, f1, jnp.asarray(coords), jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(r1), atol=1e-3)


def test_corr_fused_extreme_borders():
    """Clamp exactness at its boundary (corr_fused.py:188-210): coords far
    outside the image — including negative — must match the XLA path
    bit-for-bit in masking (all such taps are zero in both)."""
    rng = np.random.RandomState(3)
    F, E, H1, W1 = 2, 32, 64, 96
    gmap = rng.randn(F * 16, P, P, C).astype(np.float32)
    fmap1 = rng.randn(F, H1, W1, C).astype(np.float32)
    fmap2 = rng.randn(F, H1 // 4, W1 // 4, C).astype(np.float32)

    # four regimes: deep-negative, straddling 0, straddling max, deep-out
    cx = np.concatenate([rng.uniform(-30, -10, E // 4),
                         rng.uniform(-2, 2, E // 4),
                         rng.uniform(W1 - 2, W1 + 2, E // 4),
                         rng.uniform(W1 + 10, W1 + 30, E // 4)])
    cy = np.concatenate([rng.uniform(-30, -10, E // 4),
                         rng.uniform(-2, 2, E // 4),
                         rng.uniform(H1 - 2, H1 + 2, E // 4),
                         rng.uniform(H1 + 10, H1 + 30, E // 4)])
    off = np.linspace(-1.0, 1.0, P)
    gx = cx[:, None, None] + off[None, None, :]
    gy = cy[:, None, None] + off[None, :, None]
    coords = np.stack([np.broadcast_to(gx, (E, P, P)),
                       np.broadcast_to(gy, (E, P, P))], -1).astype(np.float32)

    kk = rng.randint(0, F * 16, E).astype(np.int32)
    jj = np.sort(rng.randint(0, F, E)).astype(np.int32)

    g16 = jnp.asarray(gmap, jnp.bfloat16)
    f1 = jnp.asarray(fmap1, jnp.bfloat16)
    f2 = jnp.asarray(fmap2, jnp.bfloat16)
    c1, c2 = corr_fused(g16, f1, f2, jnp.asarray(coords),
                        jnp.asarray(kk), jnp.asarray(jj), interpret=True)
    r1 = corr_xla(g16, f1, jnp.asarray(coords), jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)
    r2 = corr_xla(g16, f2, jnp.asarray(coords) / 4.0, jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)
    scale = max(np.abs(np.asarray(r1)).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(r1),
                               atol=0.02 * scale)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(r2),
                               atol=0.02 * scale)
    # the deep-out rows must be fully masked in BOTH paths
    assert np.abs(np.asarray(c1[:E // 4])).max() == 0.0
    assert np.abs(np.asarray(r1[:E // 4])).max() == 0.0


def test_corr_fused_spread_overflow_zeroes():
    """The documented exactness caveat (corr_fused.py:36-38): a patch whose
    projected 3x3 spread exceeds the window budget (y > 4 px or x > 5 px at
    feature scale) gets ZEROED taps for the overflowing pixels, while
    in-budget patches in the same batch stay exact vs the XLA path."""
    rng = np.random.RandomState(4)
    F, H1, W1 = 2, 64, 96
    E = 8
    gmap = rng.randn(F * 16, P, P, C).astype(np.float32)
    fmap1 = rng.randn(F, H1, W1, C).astype(np.float32)
    fmap2 = rng.randn(F, H1 // 4, W1 // 4, C).astype(np.float32)

    # edges 0..3: degenerate geometry, x spread 14 px (> 5 budget)
    # edges 4..7: exactly at the spread budget (x spread 5, y spread 4)
    coords = np.zeros((E, P, P, 2), np.float32)
    base = np.array([40.0, 30.0], np.float32)
    for e in range(4):
        gx = base[0] + np.array([-7.0, 0.0, 7.0])[None, :]
        gy = base[1] + np.array([-1.0, 0.0, 1.0])[:, None]
        coords[e, ..., 0] = gx
        coords[e, ..., 1] = gy
    for e in range(4, 8):
        gx = base[0] + np.array([-2.5, 0.0, 2.5])[None, :]
        gy = base[1] + np.array([-2.0, 0.0, 2.0])[:, None]
        coords[e, ..., 0] = gx
        coords[e, ..., 1] = gy

    kk = rng.randint(0, F * 16, E).astype(np.int32)
    jj = np.zeros(E, np.int32)

    g16 = jnp.asarray(gmap, jnp.bfloat16)
    f1 = jnp.asarray(fmap1, jnp.bfloat16)
    f2 = jnp.asarray(fmap2, jnp.bfloat16)
    c1, _ = corr_fused(g16, f1, f2, jnp.asarray(coords),
                       jnp.asarray(kk), jnp.asarray(jj), interpret=True)
    r1 = corr_xla(g16, f1, jnp.asarray(coords), jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)

    c1, r1 = np.asarray(c1), np.asarray(r1)
    scale = np.abs(r1).max()
    # overflow edges: the outer patch columns exceed the window -> zeros
    # (layout (E, dy, dx, py, px): px = patch x index)
    assert np.abs(c1[:4, :, :, :, 2]).max() == 0.0, \
        'overflowing patch pixels must be zeroed, not garbage'
    # the XLA path keeps real values there (documents the divergence)
    assert np.abs(r1[:4, :, :, :, 2]).max() > 0.0
    # at-budget edges stay exact
    np.testing.assert_allclose(c1[4:], r1[4:], atol=0.02 * scale)


def test_select_kernel_matches_xla_select():
    """ops/corr_select.py (VMEM-streamed select kernel) vs _select_taps
    (XLA masked shifts): same taps, borders, overflow zeroing. The kernel
    accumulates in f32 where the XLA path holds bf16 intermediates, so
    tolerance is the bf16 quantum of the plane scale."""
    from dpvo_tpu.ops import corr_fused as cf
    from dpvo_tpu.ops.corr_select import select_taps_tpu

    rng = np.random.RandomState(11)
    E, H, W = 70, 64, 96          # non-multiple of the block size
    plane = jnp.asarray(rng.randn(E, 9, cf.WY, cf.WX), jnp.bfloat16)

    cx = np.concatenate([rng.uniform(4, W - 5, E - 20),
                         rng.uniform(-3, 3, 10),
                         rng.uniform(W - 3, W + 3, 10)])
    cy = rng.uniform(-2, H + 2, E)
    off = np.linspace(-1.2, 1.2, 3)
    gx = cx[:, None, None] + off[None, None, :] + rng.uniform(-0.5, 0.5,
                                                              (E, 3, 3))
    gy = cy[:, None, None] + off[None, :, None] + rng.uniform(-0.5, 0.5,
                                                              (E, 3, 3))
    coords = jnp.asarray(np.stack([gx, gy], -1), np.float32)
    xi, yi, fx, fy, by, bx, oy, ox = cf._window_base(coords, H, W, 3)

    ref = cf._select_taps(plane, xi, yi, fx, fy, oy, ox, H, W, 3, 3)
    got = select_taps_tpu(plane, yi, xi, fy, fx, oy, ox, H=H, W=W,
                          radius=3, interpret=True)
    scale = max(np.abs(np.asarray(ref)).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.02 * scale)
