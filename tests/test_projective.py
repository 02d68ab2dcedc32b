"""Golden tests for projective ops: analytic vs autodiff Jacobians."""
import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu import lie, projective as pops

RNG = np.random.RandomState(7)


def make_scene(n_frames=4, n_patches=6, P=3):
    """Random poses + patches with sane depths in a 640x480/4 image."""
    xi = RNG.randn(n_frames, 6).astype(np.float32) * 0.1
    poses = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    intr = np.tile(np.array([120.0, 120.0, 80.0, 60.0], np.float32), (n_frames, 1))
    cx = RNG.uniform(20, 140, (n_patches, 1, 1)).astype(np.float32)
    cy = RNG.uniform(20, 100, (n_patches, 1, 1)).astype(np.float32)
    gx = cx + np.arange(-1, 2, dtype=np.float32)[None, None, :]
    gy = cy + np.arange(-1, 2, dtype=np.float32)[None, :, None]
    gx = np.broadcast_to(gx, (n_patches, P, P))
    gy = np.broadcast_to(gy, (n_patches, P, P))
    d = np.broadcast_to(
        RNG.uniform(0.3, 2.0, (n_patches, 1, 1)).astype(np.float32),
        (n_patches, P, P))
    patches = np.stack([gx, gy, d], axis=1)  # (Np, 3, P, P)
    return jnp.asarray(poses), jnp.asarray(patches), jnp.asarray(intr)


def test_iproj_proj_roundtrip():
    poses, patches, intr = make_scene()
    idx = jnp.zeros(patches.shape[0], jnp.int32)
    X = pops.iproj(patches, intr[idx])
    # X is [xn, yn, 1, d]; dividing out the unit Z and projecting recovers x/y
    x = pops.proj(X, intr[idx])
    np.testing.assert_allclose(np.asarray(x[..., 0]), np.asarray(patches[:, 0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(x[..., 1]), np.asarray(patches[:, 1]), atol=2e-3)


def test_identity_transform_is_noop():
    poses, patches, intr = make_scene()
    ii = jnp.array([0, 1, 2, 3, 0, 1])
    kk = jnp.arange(6)
    coords = pops.transform(poses, patches, intr, ii, ii, kk)
    np.testing.assert_allclose(np.asarray(coords[..., 0]), np.asarray(patches[:, 0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(coords[..., 1]), np.asarray(patches[:, 1]), atol=2e-3)


def _center(poses, patches, intr, ii, jj, kk):
    c = pops.transform(poses, patches, intr, ii, jj, kk)
    P = c.shape[-2]
    return c[..., P // 2, P // 2, :]


def test_analytic_jacobians_match_autodiff():
    poses, patches, intr = make_scene()
    ii = jnp.array([0, 1, 2, 0])
    jj = jnp.array([1, 2, 3, 3])
    kk = jnp.array([0, 1, 2, 3])

    _, v, (Ji, Jj, Jz) = pops.transform(poses, patches, intr, ii, jj, kk, jacobian=True)

    def f_pose(xi_all):
        # left-retraction perturbation of every pose
        p = lie.se3_retr(poses, xi_all)
        return _center(p, patches, intr, ii, jj, kk)

    J_auto = jax.jacobian(f_pose)(jnp.zeros_like(poses[:, :6]))  # (E,2,N,6)
    J_auto = np.asarray(J_auto)
    for e in range(4):
        np.testing.assert_allclose(J_auto[e, :, int(ii[e])], np.asarray(Ji[e]),
                                   atol=1e-2, rtol=1e-3)
        np.testing.assert_allclose(J_auto[e, :, int(jj[e])], np.asarray(Jj[e]),
                                   atol=1e-2, rtol=1e-3)

    def f_depth(d):
        p = patches.at[:, 2].set(d[:, None, None])
        return _center(poses, p, intr, ii, jj, kk)

    Jz_auto = np.asarray(jax.jacobian(f_depth)(patches[:, 2, 1, 1]))  # (E,2,Np)
    for e in range(4):
        np.testing.assert_allclose(Jz_auto[e, :, int(kk[e])], np.asarray(Jz[e, :, 0]),
                                   atol=1e-2, rtol=1e-3)


def test_sim3_jacobians_match_autodiff():
    poses_se3, patches, intr = make_scene()
    # promote to Sim3 with random log-scales
    s = jnp.exp(jnp.asarray(RNG.randn(4, 1).astype(np.float32) * 0.1))
    poses = jnp.concatenate([poses_se3, s], axis=-1)
    ii = jnp.array([0, 1])
    jj = jnp.array([2, 3])
    kk = jnp.array([0, 1])

    _, v, (Ji, Jj, Jz) = pops.transform(poses, patches, intr, ii, jj, kk,
                                        jacobian=True, group='sim3')

    def f_pose(xi_all):
        p = lie.sim3_retr(poses, xi_all)
        return _center_sim3(p)

    def _center_sim3(p):
        c = pops.transform(p, patches, intr, ii, jj, kk, group='sim3')
        return c[..., 1, 1, :]

    J_auto = np.asarray(jax.jacobian(f_pose)(jnp.zeros((4, 7))))
    for e in range(2):
        np.testing.assert_allclose(J_auto[e, :, int(jj[e])], np.asarray(Jj[e]),
                                   atol=1e-2, rtol=1e-3)
        np.testing.assert_allclose(J_auto[e, :, int(ii[e])], np.asarray(Ji[e]),
                                   atol=1e-2, rtol=1e-3)


def test_flow_mag_zero_for_identity():
    poses, patches, intr = make_scene()
    poses_id = jnp.tile(lie.se3_identity((1,)), (4, 1))
    ii = jnp.array([0, 1])
    jj = jnp.array([1, 2])
    kk = jnp.array([0, 1])
    mag, val = pops.flow_mag(poses_id, patches, intr, ii, jj, kk, beta=0.5)
    np.testing.assert_allclose(np.asarray(mag), 0.0, atol=1e-3)
    assert bool(jnp.all(val))


def test_point_cloud_inverts_projection():
    poses, patches, intr = make_scene()
    ix = jnp.arange(4)
    pts = pops.point_cloud(poses, patches[:4], intr, ix)
    # re-project: act with pose, then proj
    Xw = pts[..., :3] / jnp.maximum(pts[..., 3:], 1e-8)
    Xc = lie.se3_act(poses[ix][:, None, None], Xw)
    d = 1.0 / jnp.maximum(Xc[..., 2], 0.1)
    fx, fy, cx, cy = [intr[ix][:, i, None, None] for i in range(4)]
    px = fx * Xc[..., 0] * d + cx
    np.testing.assert_allclose(np.asarray(px), np.asarray(patches[:4, 0]), atol=1e-2)
