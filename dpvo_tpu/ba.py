"""Bundle adjustment, TPU-native.

Replaces the reference's fused CUDA Gauss-Newton kernel
(dpvo/fastba/ba_cuda.cu:232-582). Instead of atomicAdd scatter into a global
Hessian, edges are linearized with vmapped closed-form Jacobians and reduced
with `segment_sum` into a dense window-local block system; the Schur
complement over per-patch inverse depths is solved with a dense Cholesky.

Key design constraints for XLA:
  * all shapes static: the pose window has capacity `W` (slots past `t1-t0`
    receive zero updates), the patch window has capacity `PC` (slot = kk -
    patch_base), the edge table is a fixed-capacity masked array.
  * `t0`, `t1`, `patch_base` are traced scalars so one compiled kernel serves
    every frame.
  * numerics mirror the reference: residual gating at 128 px / Z>0.2 /
    +-64 px bounds (ba_cuda.cu:305-308), damping S += I*(1e-4 S + 1)
    (ba_cuda.cu:546), depth clamp d>20 -> 1.0, d >= 1e-4 (ba_cuda.cu:221-222).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import lie

_HIGHEST = jax.lax.Precision.HIGHEST


def _linearize(poses, xy, depth, intrinsics, target, weight, ii, jj, kk, mask):
    """Residuals + analytic Jacobians at patch centers for every edge.

    poses: (N, 7); xy: (Np, 2) patch-center pixel coords; depth: (Np,) inverse
    depth; intrinsics: (4,) shared [fx fy cx cy] (the reference BA kernel reads
    intrinsics[0] only, ba_cuda.cu:253-259); target/weight: (E, 2).

    Returns r (E,2), w (E,2) gated weights, Ji/Jj (E,2,6), Jz (E,2) with the
    convention coords ~= coords0 + Ji xi_i + Jj xi_j + Jz dz.
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]

    Gi = poses[ii]
    Gj = poses[jj]
    Gij = lie.se3_mul(Gj, lie.se3_inv(Gi))      # (E, 7)
    tij = Gij[..., :3]

    xn = (xy[kk, 0] - cx) / fx
    yn = (xy[kk, 1] - cy) / fy
    Xi = jnp.stack([xn, yn, jnp.ones_like(xn), depth[kk]], axis=-1)  # (E, 4)
    Xj = lie.se3_act4(Gij, Xi)

    X, Y, Z, W = Xj[..., 0], Xj[..., 1], Xj[..., 2], Xj[..., 3]
    d = jnp.where(Z >= 0.2, 1.0 / jnp.where(Z >= 0.2, Z, 1.0), 0.0)
    d2 = d * d

    Zs = jnp.where(jnp.abs(Z) < 1e-8, 1e-8, Z)
    x1 = fx * (X / Zs) + cx
    y1 = fy * (Y / Zs) + cy

    rx = target[..., 0] - x1
    ry = target[..., 1] - y1

    in_bounds = ((jnp.sqrt(rx * rx + ry * ry) < 128) & (Z > 0.2) &
                 (x1 > -64) & (y1 > -64) &
                 (x1 < 2 * cx + 64) & (y1 < 2 * cy + 64))
    gate = (in_bounds & mask).astype(jnp.float32)

    r = jnp.stack([rx, ry], axis=-1)
    w = gate[..., None] * weight

    o = jnp.zeros_like(X)
    # d(proj)/d(xi_j), row-stacked for the two pixel coords (ba_cuda.cu:323,331)
    Jj_rows = jnp.stack([
        fx * W * d, o, -fx * X * W * d2, -fx * X * Y * d2,
        fx * (1 + X * X * d2), -fx * Y * d,
        o, fy * W * d, -fy * Y * W * d2, -fy * (1 + Y * Y * d2),
        fy * (X * Y * d2), fy * X * d,
    ], axis=-1).reshape(X.shape + (2, 6))

    Jz = jnp.stack([
        fx * (tij[..., 0] * d - tij[..., 2] * (X * d2)),
        fy * (tij[..., 1] * d - tij[..., 2] * (Y * d2)),
    ], axis=-1)

    # coords = proj(Gj Gi^-1 X): left-increment on Gi enters through -Ad^T
    Ji_rows = -lie.se3_adjT(Gij[..., None, :], Jj_rows)

    return r, w, Ji_rows, Jj_rows, Jz


def _gather_blocks(r, w, Ji, Jj, Jz, ii, jj, kk, t0, patch_base, W, PC):
    """segment_sum the per-edge normal-equation blocks.

    Pose slots: wi = ii - t0 (valid in [0, W)); patch slots: pk = kk -
    patch_base (valid in [0, PC)). Out-of-window contributions go to an
    overflow segment and are dropped — same effect as the reference kernel's
    `if (ix >= 0)` guards (ba_cuda.cu:341-370).
    """
    E = r.shape[0]
    wi = ii - t0
    wj = jj - t0
    pk = kk - patch_base
    vi = (wi >= 0) & (wi < W)
    vj = (wj >= 0) & (wj < W)
    vk = (pk >= 0) & (pk < PC)

    # CONSISTENT drop: an edge whose patch slot falls outside the depth
    # window must not contribute to the pose blocks either — otherwise its
    # depth is silently treated as fixed while its reprojection still pulls
    # on the poses (long-range loop-closure edges are handled by global BA,
    # not here). Zero its weight everywhere.
    w = w * vk[:, None].astype(w.dtype)

    # segment_sum lowers to a scatter-add — a SEQUENTIAL while-loop on TPU
    # (one iteration per edge). When the one-hot matrix fits a modest budget
    # do the reduction as a (num, E) @ (E, a) MXU matmul instead; exact for
    # f32 inputs (HIGHEST), and its VJP is a matmul, not a gather. The
    # budget keeps the hybrid runtime's large (E*W*PC) cases on segment_sum.
    def seg(vals, ids, valid, num):
        ids = jnp.where(valid, ids, num)
        if E * num <= 8_000_000:
            oh = (ids[:, None] == jnp.arange(num, dtype=ids.dtype)
                  ).astype(vals.dtype)
            flat = vals.reshape(E, -1)
            out = jnp.matmul(oh.T, flat, precision=_HIGHEST)
            return out.reshape((num,) + vals.shape[1:])
        return jax.ops.segment_sum(vals, ids, num_segments=num + 1,
                                   indices_are_sorted=False)[:num]

    # weighted row products; contract the 2 residual rows
    def JtWJ(A, B):  # (E,2,a),(E,2,b) -> (E,a,b)
        return jnp.einsum('era,er,erb->eab', A, w.reshape(E, 2), B,
                          precision=_HIGHEST)

    def JtWr(A):     # (E,2,a) -> (E,a)
        return jnp.einsum('era,er->ea', A, (w * r).reshape(E, 2),
                          precision=_HIGHEST)

    Bii = JtWJ(Ji, Ji)
    Bij = JtWJ(Ji, Jj)
    Bji = JtWJ(Jj, Ji)
    Bjj = JtWJ(Jj, Jj)

    # assemble into (W*W, 6, 6)
    B = seg(Bii, wi * W + wi, vi, W * W)
    B += seg(Bij, wi * W + wj, vi & vj, W * W)
    B += seg(Bji, wj * W + wi, vi & vj, W * W)
    B += seg(Bjj, wj * W + wj, vj, W * W)

    Eik = jnp.einsum('era,er,er->ea', Ji, w.reshape(E, 2), Jz, precision=_HIGHEST)
    Ejk = jnp.einsum('era,er,er->ea', Jj, w.reshape(E, 2), Jz, precision=_HIGHEST)
    Em = seg(Eik, wi * PC + pk, vi & vk, W * PC)
    Em += seg(Ejk, wj * PC + pk, vj & vk, W * PC)

    C = seg(jnp.einsum('er,er,er->e', Jz, w, Jz, precision=_HIGHEST)[:, None],
            pk, vk, PC)[:, 0]
    u = seg(jnp.einsum('er,er->e', Jz, w * r, precision=_HIGHEST)[:, None],
            pk, vk, PC)[:, 0]

    v = seg(JtWr(Ji), wi, vi, W)
    v += seg(JtWr(Jj), wj, vj, W)

    touched = seg(jnp.ones((E, 1), jnp.float32) * (w.sum(-1) > 0)[:, None],
                  pk, vk, PC)[:, 0]

    return (B.reshape(W, W, 6, 6), Em.reshape(W, PC, 6), C, v, u, touched)


@partial(jax.jit, static_argnames=('W', 'PC', 'iterations', 'structure_only'))
def bundle_adjust(poses, xy, depth, intrinsics, target, weight, lmbda,
                  ii, jj, kk, mask, t0, t1, patch_base,
                  *, W, PC, iterations=2, structure_only=False):
    """Windowed Gauss-Newton bundle adjustment (reference fastba.BA).

    poses (N,7) f32, xy (Np,2), depth (Np,), intrinsics (4,),
    target/weight (E,2), ii/jj/kk (E,) int32, mask (E,) bool,
    t0/t1/patch_base traced scalars. W = pose-window capacity,
    PC = patch-window capacity (both static).

    Returns (poses, depth) after `iterations` GN steps.
    """
    lmbda = jnp.float32(lmbda)

    def step(_, state):
        poses, depth = state
        r, w, Ji, Jj, Jz = _linearize(
            poses, xy, depth, intrinsics, target, weight, ii, jj, kk, mask)
        B, Em, C, v, u, touched = _gather_blocks(
            r, w, Ji, Jj, Jz, ii, jj, kk, t0, patch_base, W, PC)

        Q = 1.0 / (C + lmbda)                       # (PC,)

        if structure_only:
            dZ = Q * u
            dZ = jnp.where(jnp.all(jnp.isfinite(dZ)), dZ, 0.0)
            dX = jnp.zeros((W, 6), jnp.float32)
        else:
            # dense Schur complement on the pose block
            S = B.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
            E2 = Em.transpose(0, 2, 1).reshape(6 * W, PC)
            EQ = E2 * Q[None, :]
            S = S - jnp.matmul(EQ, E2.T, precision=_HIGHEST)
            y = v.reshape(6 * W) - jnp.matmul(EQ, u, precision=_HIGHEST)
            # damping identical to ba_cuda.cu:546
            S = S + jnp.diag(1e-4 * jnp.diag(S) + 1.0)
            cf = jax.scipy.linalg.cho_factor(S)
            dX = jax.scipy.linalg.cho_solve(cf, y)
            dZ = Q * (u - jnp.matmul(E2.T, dX, precision=_HIGHEST))
            dX = dX.reshape(W, 6)

            # graceful failure: a non-PSD window (all-masked edges, degenerate
            # geometry) yields NaN from the Cholesky under jit instead of an
            # exception — zero the update like the reference's try/except
            # (dpvo/ba.py:12-37, dpvo/dpvo.py:355-356).
            ok = jnp.all(jnp.isfinite(dX)) & jnp.all(jnp.isfinite(dZ))
            dX = jnp.where(ok, dX, 0.0)
            dZ = jnp.where(ok, dZ, 0.0)

            # retract poses in [t0, t1): slots >= t1-t0 get a zero update
            slot_idx = t0 + jnp.arange(W)
            live = (slot_idx < t1)[:, None]
            dX = jnp.where(live, dX, 0.0)
            new_win = lie.se3_retr(poses[slot_idx], dX)
            poses = poses.at[slot_idx].set(new_win, mode='drop')

        # depth retraction + clamps (ba_cuda.cu:209-229), touched slots only
        dslot = jax.lax.dynamic_slice(depth, (patch_base,), (PC,))
        dnew = dslot + dZ
        dnew = jnp.where(dnew > 20.0, 1.0, dnew)
        dnew = jnp.maximum(dnew, 1e-4)
        dnew = jnp.where(touched > 0, dnew, dslot)
        depth = jax.lax.dynamic_update_slice(depth, dnew, (patch_base,))

        return poses, depth

    return jax.lax.fori_loop(0, iterations, step, (poses, depth))
