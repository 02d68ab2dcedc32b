"""Parity: one-pass fused correlation (planes + tap-select in one kernel)
vs the exact XLA path, including the valid-prefix gating semantics."""
import numpy as np

import jax.numpy as jnp

from dpvo_tpu.ops.corr import corr as corr_xla
from dpvo_tpu.ops.corr_onepass import corr_onepass

from test_corr_fused import make_case

P = 3


def _xla_ref(gmap, fmap1, fmap2, coords, kk, jj):
    r1 = corr_xla(gmap, fmap1, jnp.asarray(coords), jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)
    r2 = corr_xla(gmap, fmap2, jnp.asarray(coords) / 4.0, jnp.asarray(kk),
                  jnp.asarray(jj), radius=3)
    return np.asarray(r1), np.asarray(r2)


def test_corr_onepass_matches_xla_interpret():
    gmap, fmap1, fmap2, coords, kk, jj = make_case()
    g16 = jnp.asarray(gmap, jnp.bfloat16)
    f1 = jnp.asarray(fmap1, jnp.bfloat16)
    f2 = jnp.asarray(fmap2, jnp.bfloat16)

    c1, c2 = corr_onepass(g16, f1, f2, jnp.asarray(coords),
                          jnp.asarray(kk), jnp.asarray(jj), interpret=True)
    r1, r2 = _xla_ref(g16, f1, f2, coords, kk, jj)

    scale = np.abs(r1).max()
    np.testing.assert_allclose(np.asarray(c1), r1, atol=0.02 * scale)
    np.testing.assert_allclose(np.asarray(c2), r2, atol=0.02 * scale)


def test_corr_onepass_valid_prefix_gating():
    """Edges >= nv produce exact zeros; edges < nv are untouched by gating."""
    gmap, fmap1, fmap2, coords, kk, jj = make_case(E=96)
    g16 = jnp.asarray(gmap, jnp.bfloat16)
    f1 = jnp.asarray(fmap1, jnp.bfloat16)
    f2 = jnp.asarray(fmap2, jnp.bfloat16)
    nv = 41                                  # straddles a block boundary

    c1, c2 = corr_onepass(g16, f1, f2, jnp.asarray(coords),
                          jnp.asarray(kk), jnp.asarray(jj), interpret=True,
                          nv=jnp.asarray(nv, jnp.int32))
    r1, r2 = _xla_ref(g16, f1, f2, coords, kk, jj)

    scale = np.abs(r1).max()
    np.testing.assert_allclose(np.asarray(c1)[:nv], r1[:nv],
                               atol=0.02 * scale)
    np.testing.assert_allclose(np.asarray(c2)[:nv], r2[:nv],
                               atol=0.02 * scale)
    assert np.all(np.asarray(c1)[nv:] == 0.0)
    assert np.all(np.asarray(c2)[nv:] == 0.0)


def test_corr_onepass_extreme_borders():
    """Far-outside (incl. negative) coords: masking parity with the XLA
    path — every out-of-image tap is zero in both."""
    rng = np.random.RandomState(3)
    F, E, H1, W1 = 2, 32, 64, 96
    gmap = rng.randn(F * 16, P, P, 128).astype(np.float32)
    fmap1 = rng.randn(F, H1, W1, 128).astype(np.float32)
    fmap2 = rng.randn(F, H1 // 4, W1 // 4, 128).astype(np.float32)
    cx = np.concatenate([rng.uniform(-9, 2, E // 2),
                         rng.uniform(W1 - 2, W1 + 9, E - E // 2)])
    cy = rng.uniform(-3, H1 + 3, E)
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
    c1, c2 = corr_onepass(g16, f1, f2, jnp.asarray(coords),
                          jnp.asarray(kk), jnp.asarray(jj), interpret=True)
    r1, r2 = _xla_ref(g16, f1, f2, coords, kk, jj)
    scale = max(np.abs(r1).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(c1), r1, atol=0.02 * scale)
    np.testing.assert_allclose(np.asarray(c2), r2, atol=0.02 * scale)


def test_corr_onepass_spread_overflow_zeros():
    """Patches whose projected 3x3 spread overflows the window budget get
    zeros (degenerate geometry) — the packed-int clamp must preserve it."""
    rng = np.random.RandomState(5)
    F, E, H1, W1 = 1, 32, 64, 96
    gmap = rng.randn(16, P, P, 128).astype(np.float32)
    fmap1 = rng.randn(F, H1, W1, 128).astype(np.float32)
    fmap2 = rng.randn(F, H1 // 4, W1 // 4, 128).astype(np.float32)
    # pixel spread of 20px in y >> the 4px budget
    gx = np.full((E, P, P), 40.0)
    gy = np.full((E, P, P), 30.0)
    gy[:, 0, :] = 10.0
    coords = np.stack([gx, gy], -1).astype(np.float32)
    kk = np.zeros(E, np.int32)
    jj = np.zeros(E, np.int32)

    c1, _ = corr_onepass(jnp.asarray(gmap, jnp.bfloat16),
                         jnp.asarray(fmap1, jnp.bfloat16),
                         jnp.asarray(fmap2, jnp.bfloat16),
                         jnp.asarray(coords), jnp.asarray(kk),
                         jnp.asarray(jj), interpret=True)
    assert np.isfinite(np.asarray(c1)).all()
    # the window base sits at the min row (py=0, y=10): rows at y=30
    # (py=1,2) overflow the 4px budget and produce zeros
    assert np.all(np.asarray(c1)[:, :, :, 1:, :] == 0.0)
    assert np.abs(np.asarray(c1)[:, :, :, 0, :]).max() > 0.0


def test_corr_onepass_max_alignment_slack():
    """ox = 8 is the L1 boundary (3px of 4-alignment slack + the full 5px
    x-spread budget) and must produce CORRECT taps, not zeros.  Pins the
    never-matching overflow clamp against off-by-one regressions (a round-2
    revision aliased the max in-window shift onto the clamp value)."""
    rng = np.random.RandomState(7)
    F, E, H1, W1 = 1, 32, 64, 96
    gmap = rng.randn(16, P, P, 128).astype(np.float32)
    fmap1 = rng.randn(F, H1, W1, 128).astype(np.float32)
    fmap2 = rng.randn(F, H1 // 4, W1 // 4, 128).astype(np.float32)
    # min_xi = 26: alignment slack (26-3) % 4 = 3, plus 5px of spread ->
    # the max-x pixels land exactly on ox = 8 (window budget edge)
    coords = np.zeros((E, P, P, 2), np.float32)
    for e in range(E):
        base = 26.0 + 0.125 * (e % 8)
        xs = np.array([base, base + 2.5, base + 5.0])
        coords[e, :, :, 0] = xs[None, :]
        coords[e, :, :, 1] = 30.0 + 0.3 * np.arange(P)[:, None]
    kk = np.zeros(E, np.int32)
    jj = np.zeros(E, np.int32)

    c1, c2 = corr_onepass(jnp.asarray(gmap, jnp.bfloat16),
                          jnp.asarray(fmap1, jnp.bfloat16),
                          jnp.asarray(fmap2, jnp.bfloat16),
                          jnp.asarray(coords), jnp.asarray(kk),
                          jnp.asarray(jj), interpret=True)
    r1, r2 = _xla_ref(jnp.asarray(gmap, jnp.bfloat16),
                      jnp.asarray(fmap1, jnp.bfloat16),
                      jnp.asarray(fmap2, jnp.bfloat16), coords, kk, jj)
    scale = np.abs(r1).max()
    np.testing.assert_allclose(np.asarray(c1), r1, atol=0.02 * scale)
    np.testing.assert_allclose(np.asarray(c2), r2, atol=0.02 * scale)


def test_corr_onepass_native_layout_and_weight_perm():
    """layout='native' + permuted update.corr.0 rows == reference layout
    corr_feat @ reference weights (the device runtime's fast path)."""
    gmap, fmap1, fmap2, coords, kk, jj = make_case(E=64)
    g16 = jnp.asarray(gmap, jnp.bfloat16)
    f1 = jnp.asarray(fmap1, jnp.bfloat16)
    f2 = jnp.asarray(fmap2, jnp.bfloat16)
    args = (g16, f1, f2, jnp.asarray(coords), jnp.asarray(kk),
            jnp.asarray(jj))

    c1r, c2r = corr_onepass(*args, interpret=True)
    c1n, c2n = corr_onepass(*args, interpret=True, layout='native')
    E = coords.shape[0]
    ref = np.stack([np.asarray(c1r), np.asarray(c2r)], -1).reshape(E, -1)
    nat = np.concatenate([np.asarray(c1n).reshape(E, -1),
                          np.asarray(c2n).reshape(E, -1)], -1)

    from dpvo_tpu.models.vonet import corr_native_perm
    perm = corr_native_perm()
    np.testing.assert_array_equal(ref, nat[:, perm])

    # weight-row permutation commutes with the contraction
    rng = np.random.RandomState(3)
    W = rng.randn(ref.shape[1], 16).astype(np.float32)
    Wn = np.empty_like(W)
    Wn[perm] = W
    # summation order differs between the two contractions -> f32 tolerance
    np.testing.assert_allclose(ref @ W, nat @ Wn, rtol=1e-5, atol=1e-2)
