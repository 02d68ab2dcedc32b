"""Projective geometry ops: patch (inverse-)projection and reprojection.

TPU-native rewrite of the reference's dpvo/projective_ops.py:19-130. All
functions are pure jnp, shaped for vmap/jit, and take raw (..., 7)/(..., 8)
pose arrays (SE3/Sim3 layout from dpvo_tpu.lie) rather than wrapper objects.

Patches follow the reference layout: (..., 3, P, P) where channel 0/1 are the
x/y pixel coordinates of the patch grid and channel 2 is inverse depth
(reference dpvo/net.py:148-149, utils.py:39-54).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie

MIN_DEPTH = 0.2  # reference projective_ops.py:6


def iproj(patches, intrinsics):
    """Inverse-project patches to homogeneous points [xn, yn, 1, d].

    patches: (..., 3, P, P); intrinsics: (..., 4) [fx fy cx cy]
    returns (..., P, P, 4). Mirrors reference projective_ops.py:19-29.
    """
    x = patches[..., 0, :, :]
    y = patches[..., 1, :, :]
    d = patches[..., 2, :, :]
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X, intrinsics, depth=False):
    """Pinhole projection of homogeneous points (..., P, P, 4) -> (..., P, P, 2).

    Depth clamped at 0.1 like reference projective_ops.py:43.
    """
    Z = X[..., 2]
    d = 1.0 / jnp.maximum(Z, 0.1)
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    px = fx * (d * X[..., 0]) + cx
    py = fy * (d * X[..., 1]) + cy
    if depth:
        return jnp.stack([px, py, d], axis=-1)
    return jnp.stack([px, py], axis=-1)


def transform(poses, patches, intrinsics, ii, jj, kk,
              jacobian=False, valid=False, tonly=False, group='se3'):
    """Reproject patch kk from frame ii into frame jj.

    poses:      (N, 7) SE3 (or (N, 8) Sim3 when group='sim3')
    patches:    (Np, 3, P, P) flattened patch store
    intrinsics: (N, 4)
    ii, jj, kk: (E,) int32 edge index arrays
    returns coords (E, P, P, 2); optionally (coords, valid, (Ji, Jj, Jz))
    with analytic Jacobians at the patch center, matching reference
    projective_ops.py:53-113.
    """
    if group == 'se3':
        g_inv, g_mul, g_act4, g_adjT, g_matrix = (
            lie.se3_inv, lie.se3_mul, lie.se3_act4, lie.se3_adjT, lie.se3_matrix)
        dof = 6
    else:
        g_inv, g_mul, g_act4, g_adjT, g_matrix = (
            lie.sim3_inv, lie.sim3_mul, lie.sim3_act4, lie.sim3_adjT, lie.sim3_matrix)
        dof = 7

    X0 = iproj(patches[kk], intrinsics[ii])          # (E, P, P, 4)
    Gi = poses[ii]
    Gj = poses[jj]
    Gij = g_mul(Gj, g_inv(Gi))                        # (E, 7|8)

    if tonly:
        # zero out the rotation (reference projective_ops.py:62-63)
        ident_q = jnp.zeros_like(Gij[..., 3:])
        ident_q = ident_q.at[..., 3].set(1.0)
        Gij = jnp.concatenate([Gij[..., :3], ident_q], axis=-1)

    X1 = g_act4(Gij[..., None, None, :], X0)          # (E, P, P, 4)
    x1 = proj(X1, intrinsics[jj])

    if jacobian:
        P = X1.shape[-3]
        c = P // 2
        Xc = X1[..., c, c, :]                         # (E, 4)
        X, Y, Z, H = Xc[..., 0], Xc[..., 1], Xc[..., 2], Xc[..., 3]
        o = jnp.zeros_like(H)

        fx = intrinsics[jj][..., 0]
        fy = intrinsics[jj][..., 1]

        # gated inverse depth (reference projective_ops.py:79-80)
        d = jnp.where(jnp.abs(Z) > 0.2, 1.0 / jnp.where(jnp.abs(Z) > 0.2, Z, 1.0), 0.0)

        if group == 'se3':
            Ja = jnp.stack([
                H, o, o, o, Z, -Y,
                o, H, o, -Z, o, X,
                o, o, H, Y, -X, o,
                o, o, o, o, o, o,
            ], axis=-1).reshape(Xc.shape[:-1] + (4, 6))
        else:
            Ja = jnp.stack([
                H, o, o, o, Z, -Y, X,
                o, H, o, -Z, o, X, Y,
                o, o, H, Y, -X, o, Z,
                o, o, o, o, o, o, o,
            ], axis=-1).reshape(Xc.shape[:-1] + (4, 7))

        Jp = jnp.stack([
            fx * d, o, -fx * X * d * d, o,
            o, fy * d, -fy * Y * d * d, o,
        ], axis=-1).reshape(Xc.shape[:-1] + (2, 4))

        Jj = jnp.einsum('...ij,...jk->...ik', Jp, Ja,
                        precision=jax.lax.Precision.HIGHEST)  # (E, 2, dof)
        Ji = -g_adjT(Gij[..., None, :], Jj)                   # (E, 2, dof)
        Jz = jnp.einsum('...ij,...j->...i', Jp,
                        g_matrix(Gij)[..., :, 3],
                        precision=jax.lax.Precision.HIGHEST)[..., None]  # (E, 2, 1)

        return x1, (Z > 0.2).astype(x1.dtype), (Ji, Jj, Jz)

    if valid:
        return x1, (X1[..., 2] > 0.2).astype(x1.dtype)

    return x1


def point_cloud(poses, patches, intrinsics, ix):
    """Back-project patches to world homogeneous points (reference :115-117)."""
    X = iproj(patches, intrinsics[ix])
    Ginv = lie.se3_inv(poses[ix])
    return lie.se3_act4(Ginv[..., None, None, :], X)


def flow_mag(poses, patches, intrinsics, ii, jj, kk, beta=0.3):
    """Blended full/translation-only flow magnitude (reference :120-130).

    returns (flow (E, P, P), valid (E, P, P) bool)
    """
    coords0 = transform(poses, patches, intrinsics, ii, ii, kk)
    coords1, val = transform(poses, patches, intrinsics, ii, jj, kk, valid=True)
    coords2 = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True)

    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)

    return beta * flow1 + (1 - beta) * flow2, val > 0.5
