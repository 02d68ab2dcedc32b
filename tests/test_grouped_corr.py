"""Grouped corr kernel: interpret-mode parity + edge-table grouping rules."""
import numpy as np
import jax.numpy as jnp
import pytest

from dpvo_tpu.ops.corr import corr as corr_xla
from dpvo_tpu.ops.corr_pallas import CHUNK, corr_pallas_grouped


def test_grouped_parity_interpret():
    rng = np.random.RandomState(7)
    F, H, W, C = 3, 48, 64, 128
    E = 2 * CHUNK
    gmap = rng.randn(32, 3, 3, C).astype(np.float32)
    fmap = rng.randn(F, H, W, C).astype(np.float32)
    # two chunks, each a single target frame; coords include border cases
    jj = np.concatenate([np.full(CHUNK, 1), np.full(CHUNK, 2)])
    kk = rng.randint(0, 32, E)
    cx = rng.uniform(-2, W + 2, (E, 1, 1))
    cy = rng.uniform(-2, H + 2, (E, 1, 1))
    lin = np.linspace(-1.2, 1.2, 3)
    gx = np.broadcast_to(cx + lin[None, None, :], (E, 3, 3))
    gy = np.broadcast_to(cy + lin[None, :, None], (E, 3, 3))
    coords = np.stack([gx, gy], -1).astype(np.float32)

    ref = np.asarray(corr_xla(jnp.asarray(gmap), jnp.asarray(fmap),
                              jnp.asarray(coords), jnp.asarray(kk),
                              jnp.asarray(jj), radius=3, chunk=64))
    out = np.asarray(corr_pallas_grouped(
        jnp.asarray(gmap), jnp.asarray(fmap), jnp.asarray(coords),
        jnp.asarray(kk), jnp.asarray(jj), radius=3, interpret=True))
    np.testing.assert_allclose(out, ref, atol=0.2, rtol=2e-2)


def test_edge_table_grouping():
    """Padded table keeps one target slot per CHUNK and maps edges back."""
    from dpvo_tpu.config import cfg as default_cfg
    from dpvo_tpu.runtime import HybridVO as DPVO

    c = default_cfg.clone()
    c.PATCHES_PER_FRAME = 4
    c.BUFFER_SIZE = 64
    slam = DPVO(c, None, ht=64, wd=96, seed=0)

    # synthetic sorted edge set: 3 target slots with odd sizes
    jj = np.concatenate([np.full(5, 3), np.full(7, 4), np.full(2, 5)])
    kk = np.arange(len(jj), dtype=np.int32)
    ii = kk // slam.M
    slam.ii, slam.jj, slam.kk = ii.astype(np.int32), jj.astype(np.int32), kk
    tab, cap, pad_pos, _ = slam._edge_table(slam.ii, slam.jj, slam.kk,
                                         grouped=True)
    tab = np.asarray(tab)
    mask = tab[9].astype(bool)
    assert cap % CHUNK == 0
    # each chunk has a single jj_slot
    jsl = tab[4].reshape(-1, CHUNK)
    for row in jsl:
        assert len(np.unique(row)) == 1
    # real edges land where pad_pos says, with mask set
    assert mask.sum() == len(jj)
    np.testing.assert_array_equal(tab[1][pad_pos], jj)
    np.testing.assert_array_equal(tab[2][pad_pos], kk)
    assert mask[pad_pos].all()
