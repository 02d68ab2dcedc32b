"""Differentiable bundle adjustment for training.

Mirrors the reference pure-PyTorch training BA (dpvo/ba.py:86-182): center
residuals with validity gating (r < 250 px, bounds, Z > 0.2), damped Schur
complement with ep=10/lm=1e-4, pose retraction with the first `fixedp` poses
anchored, inverse-depth clamp [1e-3, 10].

Differentiability: gradients flow from the GN step back into `target` and
`weight` (the network outputs) through the linear solve — JAX's cho_solve
implements the same adjoint the reference codes by hand in CholeskySolver
(dpvo/ba.py:12-37).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import lie
from ..ba import _gather_blocks
from ..ba_pairs import gather_rows

_HIGHEST = jax.lax.Precision.HIGHEST


def _linearize_train(poses, xy, depth, intrinsics, target, weight,
                     ii, jj, kk, bounds):
    """Training-flavor linearization (validity rules of dpvo/ba.py:92-112)."""
    fx, fy, cx, cy = (intrinsics[..., 0], intrinsics[..., 1],
                      intrinsics[..., 2], intrinsics[..., 3])
    # one-hot row selects: TPU gathers (and their scatter-add VJPs) lower
    # to sequential loops; the pose/patch tables here are tiny vs E edges
    Gij = lie.se3_mul(gather_rows(poses, jj),
                      lie.se3_inv(gather_rows(poses, ii)))
    tij = Gij[..., :3]

    xyk = gather_rows(xy, kk)
    dk = gather_rows(depth[:, None], kk)[:, 0]
    xn = (xyk[..., 0] - cx) / fx
    yn = (xyk[..., 1] - cy) / fy
    Xi = jnp.stack([xn, yn, jnp.ones_like(xn), dk], axis=-1)
    Xj = lie.se3_act4(Gij, Xi)
    X, Y, Z, H = Xj[..., 0], Xj[..., 1], Xj[..., 2], Xj[..., 3]

    dclamp = 1.0 / jnp.maximum(Z, 0.1)
    x1 = fx * X * dclamp + cx
    y1 = fy * Y * dclamp + cy

    r = target - jnp.stack([x1, y1], axis=-1)

    v = (Z > 0.2).astype(jnp.float32)
    v = v * (jnp.linalg.norm(r, axis=-1) < 250).astype(jnp.float32)
    v = v * ((x1 > bounds[0]) & (y1 > bounds[1]) &
             (x1 < bounds[2]) & (y1 < bounds[3])).astype(jnp.float32)

    d = jnp.where(jnp.abs(Z) > 0.2, 1.0 / jnp.where(jnp.abs(Z) > 0.2, Z, 1.0), 0.0)
    d2 = d * d
    o = jnp.zeros_like(X)
    Jj = jnp.stack([
        fx * H * d, o, -fx * X * H * d2, -fx * X * Y * d2,
        fx * (1 + X * X * d2), -fx * Y * d,
        o, fy * H * d, -fy * Y * H * d2, -fy * (1 + Y * Y * d2),
        fy * (X * Y * d2), fy * X * d,
    ], axis=-1).reshape(X.shape + (2, 6))
    Jz = jnp.stack([
        fx * (tij[..., 0] * d - tij[..., 2] * (X * d2)),
        fy * (tij[..., 1] * d - tij[..., 2] * (Y * d2)),
    ], axis=-1)
    Ji = -lie.se3_adjT(Gij[..., None, :], Jj)

    w = v[..., None] * weight
    r = v[..., None] * r
    return r, w, Ji, Jj, Jz


@partial(jax.jit, static_argnames=('W', 'PC', 'fixedp', 'structure_only'))
def bundle_adjust_train(poses, xy, depth, intrinsics, target, weight,
                        ii, jj, kk, bounds, *, W, PC, lmbda=1e-4, ep=10.0,
                        fixedp=1, structure_only=False):
    """One differentiable GN step (the reference applies it twice per
    update iteration, net.py:259-261).

    poses (N,7); xy (Np,2); depth (Np,); target/weight (E,2).
    W >= N - fixedp pose slots; PC >= Np patch slots.
    Returns (poses, depth).
    """
    mask = jnp.ones(ii.shape, bool)
    r, w, Ji, Jj, Jz = _linearize_train(
        poses, xy, depth, intrinsics, target, weight, ii, jj, kk, bounds)

    B, Em, C, v, u, touched = _gather_blocks(
        r, w, Ji, Jj, Jz, ii, jj, kk, jnp.int32(fixedp), jnp.int32(0), W, PC)

    Q = 1.0 / (C + lmbda)

    if structure_only:
        dZ = Q * u
        dZ = jnp.where(jnp.all(jnp.isfinite(dZ)), dZ, 0.0)
        dX = jnp.zeros((W, 6), jnp.float32)
    else:
        S = B.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
        E2 = Em.transpose(0, 2, 1).reshape(6 * W, PC)
        EQ = E2 * Q[None, :]
        S = S - jnp.matmul(EQ, E2.T, precision=_HIGHEST)
        y = v.reshape(6 * W) - jnp.matmul(EQ, u, precision=_HIGHEST)
        # training damping (dpvo/ba.py:73): A += (ep + lm*A) * I
        S = S + jnp.diag(ep + lmbda * jnp.diag(S))
        cf = jax.scipy.linalg.cho_factor(S)
        dX = jax.scipy.linalg.cho_solve(cf, y)
        dZ = Q * (u - jnp.matmul(E2.T, dX, precision=_HIGHEST))
        dX = dX.reshape(W, 6)

        # graceful failure on a non-PSD window: zero update instead of
        # silently propagating NaN through the unrolled training graph
        # (reference dpvo/ba.py:12-37 posture); where() keeps this
        # differentiable on the finite branch.
        ok = jnp.all(jnp.isfinite(dX)) & jnp.all(jnp.isfinite(dZ))
        dX = jnp.where(ok, dX, 0.0)
        dZ = jnp.where(ok, dZ, 0.0)

    # depth retraction + training clamp (dpvo/ba.py:176); requires PC <= Np
    add = jnp.zeros_like(depth).at[:PC].add(jnp.where(touched > 0, dZ, 0.0))
    depth = jnp.clip(depth + add, 1e-3, 10.0)

    if not structure_only:
        slot_idx = fixedp + jnp.arange(W)
        live = (slot_idx < poses.shape[0])[:, None]
        dXm = jnp.where(live, dX, 0.0)
        new_win = lie.se3_retr(poses[jnp.minimum(slot_idx, poses.shape[0] - 1)],
                               dXm)
        poses = poses.at[slot_idx].set(new_win, mode='drop')

    return poses, depth
