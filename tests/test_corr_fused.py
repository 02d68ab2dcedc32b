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
