"""Global BA (pair-block E) must match the dense windowed BA."""
import jax.numpy as jnp
import numpy as np

from dpvo_tpu import ba
from dpvo_tpu.ba_global import build_pair_tables, global_ba
from tests.test_ba import make_problem


def test_pair_tables_consistency():
    p = make_problem(n_frames=6, M=4)
    tabs = build_pair_tables(p['ii'], p['jj'], p['kk'], M=4)
    E = len(p['ii'])
    assert tabs['gx'].shape == (E,)
    # each edge's self pair has i == j
    assert (tabs['pair_i'][tabs['gs']] == tabs['pair_j'][tabs['gs']]).all()
    assert (tabs['pair_i'][tabs['gx']] == p['ii']).all()
    assert (tabs['pair_j'][tabs['gx']] == p['jj']).all()


def test_global_matches_dense():
    p = make_problem(n_frames=8, M=6)
    E = len(p['ii'])

    poses_d, depth_d = ba.bundle_adjust(
        jnp.asarray(p['poses0']), jnp.asarray(p['xy']),
        jnp.asarray(p['depth0']), jnp.asarray(p['intr']),
        jnp.asarray(p['target']), jnp.ones((E, 2), jnp.float32), 1e-4,
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        jnp.ones(E, bool), jnp.int32(1), jnp.int32(8), jnp.int32(0),
        W=8, PC=48, iterations=2)

    poses_g, depth_g = global_ba(
        jnp.asarray(p['poses0']), jnp.asarray(p['xy']),
        jnp.asarray(p['depth0']), jnp.asarray(p['intr']),
        p['target'], np.ones((E, 2), np.float32),
        p['ii'], p['jj'], p['kk'], 1, 8, M=6, iterations=2)

    np.testing.assert_allclose(np.asarray(poses_g)[:8],
                               np.asarray(poses_d)[:8], atol=2e-4)
    np.testing.assert_allclose(np.asarray(depth_g)[:48],
                               np.asarray(depth_d)[:48], atol=2e-3)
