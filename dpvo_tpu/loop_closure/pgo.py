"""Sim3 pose-graph optimization (classical loop-closure backend).

Mirrors the reference PGO (dpvo/loop_closure/optim_utils.py:152-243 +
the Eigen sparse solver in dpvo/fastba/ba.cpp:99-180):

  * states: global-tangent coordinates X of the INVERSE Sim3 poses,
    updated ADDITIVELY (X += dx), exactly like the reference's
    `Ginv = Log(Sim3(poses).Inv())` parametrization;
  * residuals: r_e = Log(C_e * Exp(X_i) * Exp(X_j)^-1) with constants C_e =
    odometry chain factors + measured loop Sim3s;
  * Jacobians: forward-mode autodiff through dpvo_tpu.lie (replacing
    pypose's torch.autograd.functional.jacobian);
  * LM loop with accept/reject and lambda doubling/halving, normal
    equations solved with scipy.sparse (replacing Eigen SimplicialCholesky).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

import jax
import jax.numpy as jnp

from .. import lie


def se3_to_sim3(poses):
    """(.., 7) SE3 -> (.., 8) Sim3 with unit scale."""
    s = np.ones(poses.shape[:-1] + (1,), poses.dtype)
    return np.concatenate([poses, s], axis=-1)


def _residual_one(C, Gi, Gj):
    """Log(C * Exp(Gi) * Exp(Gj)^-1) for one edge (optim_utils.py:158-161)."""
    T = lie.sim3_mul(C, lie.sim3_mul(lie.sim3_exp(Gi),
                                     lie.sim3_inv(lie.sim3_exp(Gj))))
    return lie.sim3_log(T)


@jax.jit
def residual_and_jacobian(X, constants, iii, jjj):
    """r (E,7), J_i (E,7,7), J_j (E,7,7)."""
    Gi = X[iii]
    Gj = X[jjj]
    r = jax.vmap(_residual_one)(constants, Gi, Gj)
    Ji, Jj = jax.vmap(jax.jacfwd(_residual_one, argnums=(1, 2)))(
        constants, Gi, Gj)
    return r, Ji, Jj


@jax.jit
def residual_only(X, constants, iii, jjj):
    return jax.vmap(_residual_one)(constants, X[iii], X[jjj])


def solve_system(J_i, J_j, ii, jj, res, ep, lm, freen):
    """Sparse normal-equations solve (mirrors ba.cpp:120-172).

    Returns delta (n, 7). If freen >= 0, only the first freen poses move.
    """
    J_i = np.asarray(J_i, np.float64)
    J_j = np.asarray(J_j, np.float64)
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    res = np.asarray(res, np.float64).reshape(-1)

    r = J_i.shape[0]
    n = int(max(ii.max(), jj.max())) + 1

    rows = np.repeat(np.arange(r * 7).reshape(r, 7), 7, axis=-1).reshape(-1)
    cols_i = ((ii[:, None, None] * 7) +
              np.broadcast_to(np.arange(7)[None, None, :], (r, 7, 7))).reshape(-1)
    cols_j = ((jj[:, None, None] * 7) +
              np.broadcast_to(np.arange(7)[None, None, :], (r, 7, 7))).reshape(-1)

    J = scipy.sparse.csr_matrix(
        (np.concatenate([J_i.reshape(-1), J_j.reshape(-1)]),
         (np.concatenate([rows, rows]), np.concatenate([cols_i, cols_j]))),
        shape=(r * 7, n * 7))

    b = -(J.T @ res)
    A = (J.T @ J).tocsc()
    diag = A.diagonal()
    A = A + scipy.sparse.diags(diag * lm + ep)

    if freen >= 0:
        k = freen * 7
        A_sub = A[:k, :k]
        b_sub = b[:k]
        delta = np.zeros(n * 7)
        delta[:k] = scipy.sparse.linalg.spsolve(A_sub.tocsc(), b_sub)
    else:
        delta = scipy.sparse.linalg.spsolve(A, b)

    return delta.reshape(n, 7).astype(np.float32)


def perform_updates(input_poses, dSloop, ii_loop, jj_loop, iters=30, ep=0.0,
                    lmbda=1e-6, fix_opt_window=False):
    """LM loop (optim_utils.py:211-243).

    input_poses: (n, 7) SE3 world-to-camera (numpy)
    dSloop: (L, 8) measured Sim3 loop constraints
    Returns (n, 8) optimized Sim3 poses (world-to-camera, i.e. Exp(X).Inv()).
    """
    input_poses = np.asarray(input_poses, np.float32)
    n = input_poses.shape[0]

    freen = int(max(ii_loop.max(), jj_loop.max())) + 1 if fix_opt_window \
        else -1

    # X = Log(Sim3(poses).Inv())
    Ginv_group = np.asarray(lie.sim3_inv(jnp.asarray(se3_to_sim3(input_poses))))
    X = np.asarray(lie.sim3_log(jnp.asarray(Ginv_group)))

    # odometry chain constants from the current estimate
    kk = np.arange(1, n)
    ll = kk - 1
    Ti = Ginv_group[kk]
    Tj = Ginv_group[ll]
    dSij = np.asarray(lie.sim3_mul(jnp.asarray(Tj),
                                   lie.sim3_inv(jnp.asarray(Ti))))

    constants = np.concatenate([dSij, np.asarray(dSloop, np.float32)], axis=0)
    iii = np.concatenate([kk, np.asarray(ii_loop)])
    jjj = np.concatenate([ll, np.asarray(jj_loop)])

    constants_j = jnp.asarray(constants)
    iii_j = jnp.asarray(iii)
    jjj_j = jnp.asarray(jjj)

    history = []
    for itr in range(iters):
        r, Ji, Jj = residual_and_jacobian(jnp.asarray(X), constants_j,
                                          iii_j, jjj_j)
        r = np.asarray(r)
        history.append(float((r ** 2).mean()))

        delta = solve_system(Ji, Jj, iii, jjj, r, ep, lmbda, freen)
        X_new = X + delta
        r_new = np.asarray(residual_only(jnp.asarray(X_new), constants_j,
                                         iii_j, jjj_j))
        if (r_new ** 2).mean() < history[-1]:
            X = X_new
            lmbda /= 2
        else:
            lmbda *= 2

        if history[-1] < 1e-5 and itr >= 4 and \
                history[-5] / max(history[-1], 1e-30) < 1.5:
            break

    # Exp(X).Inv() — optimized world-to-camera Sim3
    return np.asarray(lie.sim3_inv(lie.sim3_exp(jnp.asarray(X))))


def run_DPVO_PGO(pred_poses, loop_poses, loop_ii, loop_jj, queue):
    """Async worker entry (optim_utils.py:202-209): re-anchor the result at
    the first pose after the last loop endpoint."""
    final_est = perform_updates(pred_poses, loop_poses, loop_ii, loop_jj,
                                iters=30)
    safe_i = int(np.asarray(loop_ii).max()) + 1
    aa = se3_to_sim3(np.asarray(pred_poses, np.float32))
    anchor = np.asarray(lie.sim3_mul(
        jnp.asarray(aa[safe_i]),
        lie.sim3_inv(jnp.asarray(final_est[safe_i]))))
    out = np.asarray(lie.sim3_mul(jnp.asarray(anchor)[None],
                                  jnp.asarray(final_est)))
    queue.put(out[:safe_i])
