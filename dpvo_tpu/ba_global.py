"""Global bundle adjustment with pair-block-compressed E (DPV-SLAM backend).

TPU-native equivalent of the reference's `eff_impl=True` path
(dpvo/fastba/block_e.cu:43-300 + ba_cuda.cu:538-550): the pose-depth
coupling matrix E is never materialized densely. Edges come in groups that
share a (source frame i, target frame j) pair and cover at most M patches of
frame i, so E is stored as per-(pair, patch-slot) 6-vectors:

    E_lookup[g, k, :]  —  column block for pair g and patch slot k

EQE^T reduces to a batch of tiny (6 x M) @ (M x 6) products over the
host-precomputed (i, j1, j2, g1, g2) index table (the reference's
`index_tensor`, block_e.cu:104-125) — MXU-shaped batched matmuls +
segment_sum instead of atomicAdd scatter.

Hessian (B), C, v, u are accumulated by chunked lax.map over the (possibly
millions of) edges so transients stay bounded.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import lie
from .ba import _linearize

_HIGHEST = jax.lax.Precision.HIGHEST


def build_pair_tables(ii, jj, kk, M):
    """Host-side index construction (mirrors EfficentE's CPU setup,
    block_e.cu:43-145).

    Returns dict with:
      gx, gs       (E,)  per-edge pair ids: (i,j) block and (i,i) block
      pair_i/pair_j (G,) frame ids per pair (j == i for self pairs)
      trip_i, trip_j1, trip_j2, trip_g1, trip_g2 (R,) EQE^T index table
      n_pairs G, n_rows R
    """
    ii = np.asarray(ii, np.int64)
    jj = np.asarray(jj, np.int64)
    n_frames = int(max(ii.max(), jj.max())) + 1 if len(ii) else 1
    key_x = ii * n_frames + jj
    key_s = ii * n_frames + ii
    uniq, inv = np.unique(np.concatenate([key_x, key_s]), return_inverse=True)
    E = len(ii)
    gx = inv[:E].astype(np.int32)
    gs = inv[E:].astype(np.int32)
    pair_i = (uniq // n_frames).astype(np.int32)
    pair_j = (uniq % n_frames).astype(np.int32)

    # frame -> set of pair ids with source i (including self pair)
    G = len(uniq)
    rows_i, rows_j1, rows_j2, rows_g1, rows_g2 = [], [], [], [], []
    by_src = {}
    for g in range(G):
        by_src.setdefault(int(pair_i[g]), []).append(g)
    for i, gl in by_src.items():
        for g1 in gl:
            for g2 in gl:
                rows_i.append(i)
                rows_j1.append(int(pair_j[g1]))
                rows_j2.append(int(pair_j[g2]))
                rows_g1.append(g1)
                rows_g2.append(g2)

    return dict(
        gx=gx, gs=gs, pair_i=pair_i, pair_j=pair_j,
        trip_i=np.asarray(rows_i, np.int32),
        trip_j1=np.asarray(rows_j1, np.int32),
        trip_j2=np.asarray(rows_j2, np.int32),
        trip_g1=np.asarray(rows_g1, np.int32),
        trip_g2=np.asarray(rows_g2, np.int32),
        n_pairs=G, n_rows=len(rows_i))


def _chunked_edge_accumulate(poses, xy, depth, intrinsics, target, weight,
                             ii, jj, kk, mask, gx, gs, t0, W, PC, GM, M,
                             chunk=16384):
    """Linearize edges in chunks; accumulate B, C, v, u and E_lookup."""
    E = ii.shape[0]
    n_chunks = max(1, -(-E // chunk))
    Epad = n_chunks * chunk

    def pad(x, fill=0):
        return jnp.pad(x, [(0, Epad - E)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    ii_p, jj_p, kk_p = pad(ii), pad(jj), pad(kk)
    gx_p, gs_p = pad(gx), pad(gs)
    mask_p = pad(mask, False)
    tgt_p, wgt_p = pad(target), pad(weight)

    def seg(vals, ids, valid, num):
        ids = jnp.where(valid, ids, num)
        return jax.ops.segment_sum(vals, ids, num_segments=num + 1)[:num]

    def body(carry, xs):
        B, El, C, v, u, touched = carry
        ci, cj, ck, cgx, cgs, cm, ct, cw = xs
        r, w, Ji, Jj, Jz = _linearize(
            poses, xy, depth, intrinsics, ct, cw, ci, cj, ck, cm)

        wi = ci - t0
        wj = cj - t0
        vi = (wi >= 0) & (wi < W)
        vj = (wj >= 0) & (wj < W)
        pk = ck
        vk = (pk >= 0) & (pk < PC)
        w2 = w.reshape(-1, 2)

        def JtWJ(A_, B_):
            return jnp.einsum('era,er,erb->eab', A_, w2, B_,
                              precision=_HIGHEST)

        B = B.at[jnp.where(vi, wi * W + wi, W * W)].add(
            JtWJ(Ji, Ji), mode='drop')
        B = B.at[jnp.where(vi & vj, wi * W + wj, W * W)].add(
            JtWJ(Ji, Jj), mode='drop')
        B = B.at[jnp.where(vi & vj, wj * W + wi, W * W)].add(
            JtWJ(Jj, Ji), mode='drop')
        B = B.at[jnp.where(vj, wj * W + wj, W * W)].add(
            JtWJ(Jj, Jj), mode='drop')

        Eik = jnp.einsum('era,er,er->ea', Ji, w2, Jz, precision=_HIGHEST)
        Ejk = jnp.einsum('era,er,er->ea', Jj, w2, Jz, precision=_HIGHEST)
        slot = ck % M
        El = El.at[jnp.where(cm, cgs * M + slot, GM)].add(Eik, mode='drop')
        El = El.at[jnp.where(cm, cgx * M + slot, GM)].add(Ejk, mode='drop')

        C = C.at[jnp.where(vk, pk, PC)].add(
            jnp.einsum('er,er,er->e', Jz, w, Jz, precision=_HIGHEST),
            mode='drop')
        u = u.at[jnp.where(vk, pk, PC)].add(
            jnp.einsum('er,er->e', Jz, w * r, precision=_HIGHEST),
            mode='drop')
        v = v.at[jnp.where(vi, wi, W)].add(
            jnp.einsum('era,er->ea', Ji, (w * r).reshape(-1, 2),
                       precision=_HIGHEST), mode='drop')
        v = v.at[jnp.where(vj, wj, W)].add(
            jnp.einsum('era,er->ea', Jj, (w * r).reshape(-1, 2),
                       precision=_HIGHEST), mode='drop')
        touched = touched.at[jnp.where(vk, pk, PC)].add(
            (w.sum(-1) > 0).astype(jnp.float32), mode='drop')
        return (B, El, C, v, u, touched), None

    init = (jnp.zeros((W * W + 1, 6, 6)), jnp.zeros((GM + 1, 6)),
            jnp.zeros(PC + 1), jnp.zeros((W + 1, 6)), jnp.zeros(PC + 1),
            jnp.zeros(PC + 1))
    xs = tuple(x.reshape((n_chunks, chunk) + x.shape[1:]) for x in
               (ii_p, jj_p, kk_p, gx_p, gs_p, mask_p, tgt_p, wgt_p))
    (B, El, C, v, u, touched), _ = jax.lax.scan(body, init, xs)
    return (B[:W * W].reshape(W, W, 6, 6), El[:GM], C[:PC], v[:W], u[:PC],
            touched[:PC])


def _eqet(El, Q, trip, t0, W, M, chunk=8192):
    """EQE^T via the pair-triple table (block_e.cu:147-202)."""
    R = trip['trip_i'].shape[0]
    n_chunks = max(1, -(-R // chunk))
    Rpad = n_chunks * chunk

    def pad(x):
        return jnp.pad(x, (0, Rpad - x.shape[0]), constant_values=-1)

    ti = pad(trip['trip_i'])
    tj1 = pad(trip['trip_j1'])
    tj2 = pad(trip['trip_j2'])
    tg1 = pad(trip['trip_g1'])
    tg2 = pad(trip['trip_g2'])

    ElM = El.reshape(-1, M, 6)

    def body(acc, xs):
        ci, cj1, cj2, cg1, cg2 = xs
        valid = ci >= 0
        E1 = ElM[jnp.maximum(cg1, 0)]               # (chunk, M, 6)
        E2 = ElM[jnp.maximum(cg2, 0)]
        q = Q[jnp.maximum(ci, 0)[:, None] * M + jnp.arange(M)[None]]
        out = jnp.einsum('rmi,rm,rmj->rij', E1, q, E2, precision=_HIGHEST)
        w1 = cj1 - t0
        w2 = cj2 - t0
        ok = valid & (w1 >= 0) & (w1 < W) & (w2 >= 0) & (w2 < W)
        acc = acc.at[jnp.where(ok, w1 * W + w2, W * W)].add(out, mode='drop')
        return acc, None

    init = jnp.zeros((W * W + 1, 6, 6))
    xs = tuple(x.reshape(n_chunks, chunk) for x in (ti, tj1, tj2, tg1, tg2))
    acc, _ = jax.lax.scan(body, init, xs)
    return acc[:W * W].reshape(W, W, 6, 6)


@partial(jax.jit, static_argnames=('W', 'PC', 'GM', 'M', 'iterations'))
def _global_ba_jit(poses, xy, depth, intrinsics, target, weight, lmbda,
                   ii, jj, kk, mask, gx, gs, pair_i, pair_j,
                   trip_i, trip_j1, trip_j2, trip_g1, trip_g2,
                   t0, t1, *, W, PC, GM, M, iterations=2):
    trip = dict(trip_i=trip_i, trip_j1=trip_j1, trip_j2=trip_j2,
                trip_g1=trip_g1, trip_g2=trip_g2)

    def step(_, state):
        poses, depth = state
        B, El, C, v, u, touched = _chunked_edge_accumulate(
            poses, xy, depth, intrinsics, target, weight, ii, jj, kk, mask,
            gx, gs, t0, W, PC, GM, M)

        Q = 1.0 / (C + lmbda)

        EQEt = _eqet(El, Q, trip, t0, W, M)
        S = (B - EQEt).transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)

        # EQu: per-pair j-row gets E_lookup[g] . (Q*u) over its patches
        Qu = Q * u
        ElM = El.reshape(-1, M, 6)
        qrow = Qu[pair_i[:, None] * M + jnp.arange(M)[None]]     # (G, M)
        ev = jnp.einsum('gmi,gm->gi', ElM, qrow, precision=_HIGHEST)
        wj = pair_j - t0
        EQu = jax.ops.segment_sum(
            jnp.where((wj >= 0) & (wj < W), 1.0, 0.0)[:, None] * ev,
            jnp.where((wj >= 0) & (wj < W), wj, W), num_segments=W + 1)[:W]

        y = (v - EQu).reshape(6 * W)
        S = S + jnp.diag(1e-4 * jnp.diag(S) + 1.0)
        cf = jax.scipy.linalg.cho_factor(S)
        dX = jax.scipy.linalg.cho_solve(cf, y).reshape(W, 6)

        # EtdX: per patch k of pair g: E_lookup[g,k] . dX[j-t0]
        dxg = jnp.where(((wj >= 0) & (wj < W))[:, None],
                        dX[jnp.clip(wj, 0, W - 1)], 0.0)        # (G, 6)
        etv_g = jnp.einsum('gmi,gi->gm', ElM, dxg, precision=_HIGHEST)
        EtdX = jax.ops.segment_sum(
            etv_g.reshape(-1),
            (pair_i[:, None] * M + jnp.arange(M)[None]).reshape(-1),
            num_segments=PC)
        dZ = Q * (u - EtdX)

        # graceful failure on a non-PSD system: zero update instead of
        # silently propagating NaN (reference dpvo/ba.py:12-37 posture)
        ok = jnp.all(jnp.isfinite(dX)) & jnp.all(jnp.isfinite(dZ))
        dX = jnp.where(ok, dX, 0.0)
        dZ = jnp.where(ok, dZ, 0.0)

        slot_idx = t0 + jnp.arange(W)
        live = (slot_idx < t1)[:, None]
        dXm = jnp.where(live, dX, 0.0)
        new_win = lie.se3_retr(poses[slot_idx], dXm)
        poses = poses.at[slot_idx].set(new_win, mode='drop')

        dnew = depth[:PC] + dZ
        dnew = jnp.where(dnew > 20.0, 1.0, dnew)
        dnew = jnp.maximum(dnew, 1e-4)
        dnew = jnp.where(touched > 0, dnew, depth[:PC])
        depth = depth.at[:PC].set(dnew)

        return poses, depth

    return jax.lax.fori_loop(0, iterations, step, (poses, depth))


def _bucket(n, step):
    return max(step, -(-n // step) * step)


def edge_cap(n_edges):
    """The Eb bucket global_ba pads the full edge set to — callers that
    pre-assemble device target/weight rows must pad to exactly this."""
    return _bucket(n_edges, 16384)


def global_ba(poses, xy, depth, intrinsics, target, weight, ii, jj, kk,
              t0, t1, M, iterations=2, lmbda=1e-4):
    """Host wrapper: builds pair tables, buckets capacities, runs the jit.

    ii/jj/kk/target/weight: FULL edge set (active + inactive), numpy.
    Mirrors fastba.BA(..., eff_impl=True) (ba_cuda.cu:433-582).
    """
    E = len(ii)
    if E == 0:
        return poses, depth
    tabs = build_pair_tables(ii, jj, kk, M)

    Eb = _bucket(E, 16384)
    W = _bucket(int(t1 - t0), 128)
    PC = _bucket(int(t1) * M, 128 * M)
    PC = min(PC, depth.shape[0])
    G = tabs['n_pairs']
    GM = _bucket(G, 512) * M
    Rb = _bucket(tabs['n_rows'], 8192)

    def padi(x, n, fill=0):
        return jnp.asarray(np.pad(np.asarray(x), (0, n - len(x)),
                                  constant_values=fill), jnp.int32)

    mask = np.zeros(Eb, bool)
    mask[:E] = True
    if isinstance(target, jnp.ndarray):
        # pre-assembled device rows (runtime/dpvo.py keeps the retired-edge
        # target/weight store ON DEVICE; shipping it through numpy would
        # cost a blocking D2H per global BA). Must already be padded to the
        # same Eb bucket (edge_cap below).
        assert target.shape[0] == Eb and weight.shape[0] == Eb, \
            (target.shape, Eb)
        tgt, wgt = target, weight
    else:
        tgt = np.zeros((Eb, 2), np.float32)
        tgt[:E] = target
        wgt = np.zeros((Eb, 2), np.float32)
        wgt[:E] = weight

    Gb = GM // M
    pair_i = padi(tabs['pair_i'], Gb)
    pair_j = padi(tabs['pair_j'], Gb, fill=-(10 ** 6))

    return _global_ba_jit(
        poses, xy, depth, intrinsics, jnp.asarray(tgt), jnp.asarray(wgt),
        jnp.float32(lmbda),
        padi(ii, Eb), padi(jj, Eb), padi(kk, Eb), jnp.asarray(mask),
        padi(tabs['gx'], Eb, fill=Gb - 1), padi(tabs['gs'], Eb, fill=Gb - 1),
        pair_i, pair_j,
        padi(tabs['trip_i'], Rb, fill=-1), padi(tabs['trip_j1'], Rb, fill=-1),
        padi(tabs['trip_j2'], Rb, fill=-1), padi(tabs['trip_g1'], Rb, fill=0),
        padi(tabs['trip_g2'], Rb, fill=0),
        jnp.int32(t0), jnp.int32(t1),
        W=W, PC=PC, GM=GM, M=M, iterations=iterations)
