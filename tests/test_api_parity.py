"""Public-API parity checks: lietorch-style class surface, viewer, utils."""
import numpy as np
import jax.numpy as jnp

from dpvo_tpu import lie


def test_lie_class_surface():
    G = lie.SE3.Random(4, sigma=0.3, key=0)
    assert G.vec().shape == (4, 7)
    assert G.translation().shape == (4, 4)
    assert G.matrix().shape == (4, 4, 4)
    xi = jnp.asarray(np.random.RandomState(0).randn(4, 6).astype(np.float32))
    # adj via conjugation identity
    lhs = lie.SE3.exp(G.adj(xi))
    rhs = G * lie.SE3.exp(xi) * G.inv()
    np.testing.assert_allclose(np.asarray(lie.se3_log(lhs.data)),
                               np.asarray(lie.se3_log(rhs.data)), atol=1e-4)
    # Jinv: exp(Jinv(tau)) * X ~= exp_of_(log X + tau) to first order
    tau = xi * 0.001
    X2 = lie.SE3.exp(G.log() + tau[0:4])
    X2b = lie.SE3.exp(G.Jinv(tau)) * G
    np.testing.assert_allclose(np.asarray(X2.data), np.asarray(X2b.data),
                               atol=1e-5)
    # stack + identity-like
    S = lie.stack([G, G.inv()], dim=0)
    assert S.data.shape == (2, 4, 7)
    E = lie.SE3.IdentityLike(G)
    np.testing.assert_allclose(np.asarray((G * E).data), np.asarray(G.data),
                               atol=1e-6)


def test_rxso3_group():
    R = lie.RxSO3.Random(3, sigma=0.2, key=1)
    e = R * R.inv()
    xi = lie.rxso3_log(e.data)
    np.testing.assert_allclose(np.asarray(xi), 0.0, atol=1e-5)


def test_viewer_headless(tmp_path):
    from dpvo_tpu.viz.viewer import Viewer

    v = Viewer(outdir=str(tmp_path), live=False)
    img = np.zeros((32, 48, 3), np.uint8)
    for _ in range(3):
        v.update_image(img)
    v.update_points(np.random.rand(10, 3), np.zeros((10, 3), np.uint8))
    v.join()
    files = list(tmp_path.iterdir())
    assert any(f.suffix == '.jpg' for f in files)
    assert any(f.suffix == '.ply' for f in files)


def test_timer_and_grids():
    from dpvo_tpu.utils import Timer, coords_grid, flatmeshgrid, set_depth

    with Timer('t', enabled=False):
        pass
    g = coords_grid(1, 2, 4, 6)
    assert g.shape == (1, 2, 2, 4, 6)
    a, b = flatmeshgrid(jnp.arange(3), jnp.arange(2))
    assert a.shape == b.shape == (6,)
    p = jnp.zeros((5, 3, 3, 3))
    p2 = set_depth(p, jnp.ones(5))
    np.testing.assert_allclose(np.asarray(p2[:, 2]), 1.0)
