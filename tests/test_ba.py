"""Bundle adjustment tests on synthetic scenes with known optima."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpvo_tpu import ba, lie

RNG = np.random.RandomState(3)


def make_problem(n_frames=8, M=6, noise=0.05, seed=3):
    """Synthetic forward-moving camera viewing random 3D points."""
    RNG = np.random.RandomState(seed)  # local: order-independent tests
    intr = np.array([120.0, 120.0, 80.0, 60.0], np.float32)

    # ground-truth world->camera poses along a gentle trajectory
    xis = []
    for i in range(n_frames):
        xi = np.array([0.12 * i, 0.02 * i, 0.0, 0.0, 0.015 * i, 0.0], np.float32)
        xis.append(xi)
    poses_gt = np.asarray(lie.se3_exp(jnp.asarray(np.stack(xis))))

    # patches: pixel centers in frame i with GT inverse depth
    Np = n_frames * M
    xy = np.stack([RNG.uniform(30, 130, Np), RNG.uniform(25, 95, Np)],
                  axis=-1).astype(np.float32)
    depth_gt = RNG.uniform(0.4, 1.2, Np).astype(np.float32)

    # edges: each patch of frame i observed in frames i-2..i+2
    ii, jj, kk = [], [], []
    for i in range(n_frames):
        for m in range(M):
            for j in range(max(0, i - 2), min(n_frames, i + 3)):
                if j == i:
                    continue
                ii.append(i)
                jj.append(j)
                kk.append(i * M + m)
    ii = np.asarray(ii, np.int32)
    jj = np.asarray(jj, np.int32)
    kk = np.asarray(kk, np.int32)

    # perfect targets from GT geometry
    def project(poses, depth):
        Gij = lie.se3_mul(jnp.asarray(poses)[jj], lie.se3_inv(jnp.asarray(poses)[ii]))
        xn = (xy[kk, 0] - intr[2]) / intr[0]
        yn = (xy[kk, 1] - intr[3]) / intr[1]
        Xi = jnp.stack([jnp.asarray(xn), jnp.asarray(yn),
                        jnp.ones(len(kk)), jnp.asarray(depth)[kk]], axis=-1)
        Xj = lie.se3_act4(Gij, Xi)
        x1 = intr[0] * Xj[..., 0] / Xj[..., 2] + intr[2]
        y1 = intr[1] * Xj[..., 1] / Xj[..., 2] + intr[3]
        return jnp.stack([x1, y1], axis=-1)

    target = np.asarray(project(poses_gt, depth_gt))

    # perturbed initialization (first pose anchored)
    poses0 = poses_gt.copy()
    dxi = RNG.randn(n_frames, 6).astype(np.float32) * noise
    dxi[0] = 0
    poses0 = np.asarray(lie.se3_retr(jnp.asarray(poses0), jnp.asarray(dxi)))
    depth0 = depth_gt * (1 + RNG.randn(Np).astype(np.float32) * noise)

    return dict(intr=intr, poses_gt=poses_gt, depth_gt=depth_gt, xy=xy,
                ii=ii, jj=jj, kk=kk, target=target, poses0=poses0,
                depth0=depth0, project=project)


def residual_rms(p, poses, depth):
    pred = np.asarray(p['project'](poses, depth))
    return float(np.sqrt(((pred - p['target']) ** 2).mean()))


@pytest.mark.slow
def test_linearize_matches_autodiff():
    p = make_problem(n_frames=4, M=3)
    poses = jnp.asarray(p['poses0'])
    depth = jnp.asarray(p['depth0'])
    e = slice(0, 10)
    ii, jj, kk = [jnp.asarray(x[e]) for x in (p['ii'], p['jj'], p['kk'])]
    target = jnp.asarray(p['target'][e])
    weight = jnp.ones_like(target)
    mask = jnp.ones(ii.shape, bool)

    r, w, Ji, Jj, Jz = ba._linearize(
        poses, jnp.asarray(p['xy']), depth, jnp.asarray(p['intr']),
        target, weight, ii, jj, kk, mask)

    def coords(xi_all, dz):
        po = lie.se3_retr(poses, xi_all)
        de = depth + dz
        Gij = lie.se3_mul(po[jj], lie.se3_inv(po[ii]))
        xn = (p['xy'][kk, 0] - p['intr'][2]) / p['intr'][0]
        yn = (p['xy'][kk, 1] - p['intr'][3]) / p['intr'][1]
        Xi = jnp.stack([jnp.asarray(xn), jnp.asarray(yn),
                        jnp.ones(len(np.asarray(kk))), de[kk]], axis=-1)
        Xj = lie.se3_act4(Gij, Xi)
        x1 = p['intr'][0] * Xj[..., 0] / Xj[..., 2] + p['intr'][2]
        y1 = p['intr'][1] * Xj[..., 1] / Xj[..., 2] + p['intr'][3]
        return jnp.stack([x1, y1], axis=-1)

    Jp_auto = np.asarray(jax.jacobian(coords, argnums=0)(
        jnp.zeros((4, 6)), jnp.zeros(depth.shape)))
    Jz_auto = np.asarray(jax.jacobian(coords, argnums=1)(
        jnp.zeros((4, 6)), jnp.zeros(depth.shape)))

    for e_idx in range(10):
        np.testing.assert_allclose(Jp_auto[e_idx, :, int(ii[e_idx])],
                                   np.asarray(Ji[e_idx]), atol=5e-2, rtol=1e-3)
        np.testing.assert_allclose(Jp_auto[e_idx, :, int(jj[e_idx])],
                                   np.asarray(Jj[e_idx]), atol=5e-2, rtol=1e-3)
        np.testing.assert_allclose(Jz_auto[e_idx, :, int(kk[e_idx])],
                                   np.asarray(Jz[e_idx]), atol=5e-2, rtol=1e-3)


def test_ba_converges_on_synthetic_scene():
    p = make_problem()
    E = len(p['ii'])
    W, PC = 10, 48

    poses, depth = ba.bundle_adjust(
        jnp.asarray(p['poses0']), jnp.asarray(p['xy']), jnp.asarray(p['depth0']),
        jnp.asarray(p['intr']), jnp.asarray(p['target']),
        jnp.ones((E, 2), jnp.float32), 1e-4,
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        jnp.ones(E, bool), jnp.int32(1), jnp.int32(8), jnp.int32(0),
        W=W, PC=PC, iterations=8)

    rms0 = residual_rms(p, p['poses0'], p['depth0'])
    rms1 = residual_rms(p, np.asarray(poses), np.asarray(depth))
    assert rms1 < 0.05, (rms0, rms1)
    assert rms1 < rms0 * 0.02


def test_ba_respects_window_and_mask():
    """Poses before t0 and masked edges must not move."""
    p = make_problem()
    E = len(p['ii'])
    mask = np.ones(E, bool)
    mask[::3] = False  # disable a third of the edges

    poses, depth = ba.bundle_adjust(
        jnp.asarray(p['poses0']), jnp.asarray(p['xy']), jnp.asarray(p['depth0']),
        jnp.asarray(p['intr']), jnp.asarray(p['target']),
        jnp.ones((E, 2), jnp.float32), 1e-4,
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        jnp.asarray(mask), jnp.int32(3), jnp.int32(8), jnp.int32(0),
        W=10, PC=48, iterations=2)

    poses = np.asarray(poses)
    np.testing.assert_array_equal(poses[:3], p['poses0'][:3])
    # optimized poses did change
    assert np.abs(poses[3:8] - p['poses0'][3:8]).max() > 1e-5


def test_ba_structure_only():
    p = make_problem()
    E = len(p['ii'])
    poses, depth = ba.bundle_adjust(
        jnp.asarray(p['poses_gt']), jnp.asarray(p['xy']), jnp.asarray(p['depth0']),
        jnp.asarray(p['intr']), jnp.asarray(p['target']),
        jnp.ones((E, 2), jnp.float32), 1e-4,
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        jnp.ones(E, bool), jnp.int32(1), jnp.int32(8), jnp.int32(0),
        W=10, PC=48, iterations=8, structure_only=True)

    np.testing.assert_array_equal(np.asarray(poses), p['poses_gt'])
    np.testing.assert_allclose(np.asarray(depth), p['depth_gt'], rtol=0.02)


def test_ba_depth_clamps():
    """Depth reset heuristic d>20 -> 1.0 and floor 1e-4 (ba_cuda.cu:221-222)."""
    p = make_problem(n_frames=4, M=3)
    E = len(p['ii'])
    depth0 = p['depth0'].copy()
    poses, depth = ba.bundle_adjust(
        jnp.asarray(p['poses0']), jnp.asarray(p['xy']), jnp.asarray(depth0),
        jnp.asarray(p['intr']), jnp.asarray(p['target']),
        jnp.ones((E, 2), jnp.float32), 1e-4,
        jnp.asarray(p['ii']), jnp.asarray(p['jj']), jnp.asarray(p['kk']),
        jnp.ones(E, bool), jnp.int32(1), jnp.int32(4), jnp.int32(0),
        W=6, PC=12, iterations=2)
    d = np.asarray(depth)
    assert (d >= 1e-4).all() and (d <= 20.0).all()
