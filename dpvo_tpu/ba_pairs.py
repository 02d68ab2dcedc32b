"""Pair-blocked bundle adjustment (device-resident edge table).

The VO edge set has rigid structure the flat formulation ignores: edges are
created per (source frame i, target frame j) PAIR covering all M patches of
frame i (reference dpvo.py:362-375 builds them with meshgrids). Keeping the
table pair-major makes every gather a contiguous M-block and shrinks the
Hessian scatters from O(E) items to O(pairs) items.

Same math/gating/damping as dpvo_tpu.ba (which mirrors ba_cuda.cu).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import lie

_HIGHEST = jax.lax.Precision.HIGHEST


def gather_rows(buf, idx, onehot_max_rows=8192):
    """Row gather via one-hot matmul.

    TPU gathers/vmapped dynamic_slices lower to SEQUENTIAL while-loops
    (measured ~1.4 ms per 512-row gather in the frame step); a (GP, NF)
    one-hot times (NF, K) runs on the MXU in microseconds. Exact for the
    selection (one-hot rows pick a single source row; HIGHEST keeps f32
    values at f32 precision).

    The one-hot is (len(idx), NF) — above `onehot_max_rows` source rows its
    construction/traffic dominates (e.g. the hybrid's MAX_EDGE_AGE=1000
    feature ring: 49k x 96k would be ~9 GB) and the plain gather wins."""
    NF = buf.shape[0]
    if NF > onehot_max_rows:
        return buf[idx]
    flat = buf.reshape(NF, -1)
    oh = (idx[:, None] == jnp.arange(NF, dtype=idx.dtype)[None, :]
          ).astype(flat.dtype)
    out = jnp.matmul(oh, flat, precision=_HIGHEST)
    return out.reshape((idx.shape[0],) + buf.shape[1:])


def pair_centers(centers, pi, M):
    """Gather per-pair patch-center blocks: (GP, M, 2).

    centers is stored FRAME-MAJOR as (NF, 2*M) rows (the (M, 2) block
    flattened m-major): row storage keeps every consumer a plain row
    gather/slice.  The old (NF*M, 2) storage made XLA materialize
    (NF*M,2)<->(NF,2M) relayout copies around this one-hot gather and the
    state-update slices (~1.1 ms/frame at the 640x480 default, profiler
    reshape.3865/3710 + copy.1031/1071)."""
    return gather_rows(centers, jnp.maximum(pi, 0)).reshape(
        pi.shape[0], M, 2)


def pair_depth(depth, pi, M):
    NF = depth.shape[0] // M
    return gather_rows(depth.reshape(NF, M), jnp.maximum(pi, 0))


def _linearize_pairs(poses, centers, depth, intr, target, weight,
                     pi, pj, pvalid, M):
    """Residuals + Jacobians for all pairs at patch centers.

    target/weight: (GP, M, 2). Returns r, w (GP, M, 2), Ji/Jj (GP, M, 2, 6),
    Jz (GP, M, 2). Math identical to ba._linearize (ba_cuda.cu:232-376).
    """
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    Gi = gather_rows(poses, jnp.maximum(pi, 0))
    Gj = gather_rows(poses, jnp.maximum(pj, 0))
    Gij = lie.se3_mul(Gj, lie.se3_inv(Gi))                # (GP, 7)
    tij = Gij[..., :3]

    xy = pair_centers(centers, pi, M)                      # (GP, M, 2)
    d = pair_depth(depth, pi, M)                           # (GP, M)

    xn = (xy[..., 0] - cx) / fx
    yn = (xy[..., 1] - cy) / fy
    Xi = jnp.stack([xn, yn, jnp.ones_like(xn), d], axis=-1)
    Xj = lie.se3_act4(Gij[:, None, :], Xi)

    X, Y, Z, Wh = Xj[..., 0], Xj[..., 1], Xj[..., 2], Xj[..., 3]
    dd = jnp.where(Z >= 0.2, 1.0 / jnp.where(Z >= 0.2, Z, 1.0), 0.0)
    d2 = dd * dd
    Zs = jnp.where(jnp.abs(Z) < 1e-8, 1e-8, Z)
    x1 = fx * (X / Zs) + cx
    y1 = fy * (Y / Zs) + cy

    rx = target[..., 0] - x1
    ry = target[..., 1] - y1
    in_bounds = ((jnp.sqrt(rx * rx + ry * ry) < 128) & (Z > 0.2) &
                 (x1 > -64) & (y1 > -64) &
                 (x1 < 2 * cx + 64) & (y1 < 2 * cy + 64))
    gate = (in_bounds & pvalid[:, None]).astype(jnp.float32)

    r = jnp.stack([rx, ry], axis=-1)
    w = gate[..., None] * weight

    o = jnp.zeros_like(X)
    Jj = jnp.stack([
        fx * Wh * dd, o, -fx * X * Wh * d2, -fx * X * Y * d2,
        fx * (1 + X * X * d2), -fx * Y * dd,
        o, fy * Wh * dd, -fy * Y * Wh * d2, -fy * (1 + Y * Y * d2),
        fy * (X * Y * d2), fy * X * dd,
    ], axis=-1).reshape(X.shape + (2, 6))
    Jz = jnp.stack([
        fx * (tij[:, None, 0] * dd - tij[:, None, 2] * (X * d2)),
        fy * (tij[:, None, 1] * dd - tij[:, None, 2] * (Y * d2)),
    ], axis=-1)
    Ji = -lie.se3_adjT(Gij[:, None, None, :], Jj)

    return r, w, Ji, Jj, Jz


@partial(jax.jit, static_argnames=('M', 'W', 'PCF', 'iterations'))
def bundle_adjust_pairs(poses, centers, depth, intr, target, weight, lmbda,
                        pi, pj, pvalid, t0, t1, fbase,
                        *, M, W, PCF, iterations=2):
    """Windowed GN over a pair-blocked edge table.

    poses (N,7); centers (N,2*M) frame-major (see pair_centers);
    depth (N*M,); intr (4,);
    target/weight (GP, M, 2); pi/pj (GP,) frame ids; pvalid (GP,) bool;
    t0/t1 pose window [t0, t1); fbase: first patch FRAME of the optimized
    patch window (PCF frames). Static: M, W (pose slots), PCF (patch frames).
    """
    lmbda = jnp.float32(lmbda)
    GP = pi.shape[0]

    def step(_, state):
        poses, depth = state
        r, w, Ji, Jj, Jz = _linearize_pairs(
            poses, centers, depth, intr, target, weight, pi, pj, pvalid, M)

        wi = pi - t0
        wj = pj - t0
        vi = (wi >= 0) & (wi < W) & pvalid
        vj = (wj >= 0) & (wj < W) & pvalid
        fi = pi - fbase
        vk = (fi >= 0) & (fi < PCF) & pvalid

        # per-pair 6x6 blocks: reduce over M patches and the 2 residual rows
        def JtWJ(A, B):
            return jnp.einsum('gmra,gmr,gmrb->gab', A, w, B,
                              precision=_HIGHEST)

        Bii = JtWJ(Ji, Ji)
        Bij = JtWJ(Ji, Jj)
        Bjj = JtWJ(Jj, Jj)

        def seg(vals, ids, valid, num):
            """Segment-sum via one-hot MXU matmul: TPU scatter-adds lower
            to serial per-item loops, while a (num+1, GP) x (GP, K) dot is
            microseconds (same reasoning as gather_rows above; num <= W*PCF
            = 260 here so the one-hot is tiny). Exact: f32 HIGHEST."""
            ids = jnp.where(valid, ids, num)
            oh = (ids[None, :] == jnp.arange(num + 1, dtype=ids.dtype)
                  [:, None]).astype(jnp.float32)
            flat = vals.reshape(ids.shape[0], -1).astype(jnp.float32)
            out = jnp.matmul(oh, flat, precision=_HIGHEST)[:num]
            return out.reshape((num,) + vals.shape[1:])

        B = seg(Bii, wi * W + wi, vi, W * W)
        B += seg(Bij, wi * W + wj, vi & vj, W * W)
        B += seg(jnp.swapaxes(Bij, -1, -2), wj * W + wi, vi & vj, W * W)
        B += seg(Bjj, wj * W + wj, vj, W * W)
        B = B.reshape(W, W, 6, 6)

        # E blocks: per pair, per patch (M, 6) on the i- and j-side
        Eik = jnp.einsum('gmra,gmr,gmr->gma', Ji, w, Jz, precision=_HIGHEST)
        Ejk = jnp.einsum('gmra,gmr,gmr->gma', Jj, w, Jz, precision=_HIGHEST)
        Em = seg(Eik, wi * PCF + fi, vi & vk, W * PCF)
        Em += seg(Ejk, wj * PCF + fi, vj & vk, W * PCF)
        Em = Em.reshape(W, PCF * M, 6)

        C = seg(jnp.einsum('gmr,gmr,gmr->gm', Jz, w, Jz, precision=_HIGHEST),
                fi, vk, PCF).reshape(PCF * M)
        u = seg(jnp.einsum('gmr,gmr->gm', Jz, w * r, precision=_HIGHEST),
                fi, vk, PCF).reshape(PCF * M)
        touched = seg((w.sum(-1) > 0).astype(jnp.float32), fi, vk,
                      PCF).reshape(PCF * M)

        v = seg(jnp.einsum('gmra,gmr->ga', Ji, w * r, precision=_HIGHEST),
                wi, vi, W)
        v += seg(jnp.einsum('gmra,gmr->ga', Jj, w * r, precision=_HIGHEST),
                 wj, vj, W)

        Q = 1.0 / (C + lmbda)
        PC = PCF * M
        S = B.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
        E2 = Em.transpose(0, 2, 1).reshape(6 * W, PC)
        EQ = E2 * Q[None, :]
        S = S - jnp.matmul(EQ, E2.T, precision=_HIGHEST)
        y = v.reshape(6 * W) - jnp.matmul(EQ, u, precision=_HIGHEST)
        S = S + jnp.diag(1e-4 * jnp.diag(S) + 1.0)
        cf = jax.scipy.linalg.cho_factor(S)
        dX = jax.scipy.linalg.cho_solve(cf, y)
        dZ = Q * (u - jnp.matmul(E2.T, dX, precision=_HIGHEST))
        dX = dX.reshape(W, 6)

        # graceful failure on a non-PSD window: zero update instead of
        # silently propagating NaN (reference dpvo/ba.py:12-37 posture)
        ok = jnp.all(jnp.isfinite(dX)) & jnp.all(jnp.isfinite(dZ))
        dX = jnp.where(ok, dX, 0.0)
        dZ = jnp.where(ok, dZ, 0.0)

        slot_idx = t0 + jnp.arange(W)
        live = (slot_idx < t1)[:, None]
        dX = jnp.where(live, dX, 0.0)
        new_win = lie.se3_retr(poses[slot_idx], dX)
        poses = poses.at[slot_idx].set(new_win, mode='drop')

        dslot = jax.lax.dynamic_slice(depth, (fbase * M,), (PC,))
        dnew = dslot + dZ
        dnew = jnp.where(dnew > 20.0, 1.0, dnew)
        dnew = jnp.maximum(dnew, 1e-4)
        dnew = jnp.where(touched > 0, dnew, dslot)
        depth = jax.lax.dynamic_update_slice(depth, dnew, (fbase * M,))

        return poses, depth

    # iterations is STATIC: unroll instead of lax.fori_loop — the XLA
    # while op blocks cross-iteration fusion and adds loop overhead for
    # what is always 2 GN steps here
    state = (poses, depth)
    for it in range(iterations):
        state = step(it, state)
    return state
