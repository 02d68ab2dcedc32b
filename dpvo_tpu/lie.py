"""TPU-native Lie-group library (SO3 / RxSO3 / SE3 / Sim3) on JAX arrays.

Functional replacement for the reference's native `lietorch_backends` extension
(reference: dpvo/lietorch/groups.py:51-322 and dpvo/lietorch/src/*.cpp/.cu).
Instead of hand-written analytic backward kernels we express every op in pure
jnp; XLA fuses the elementwise quaternion math and JAX autodiff supplies
gradients. Small-angle regimes use Taylor guards written in the
`jnp.where(safe, exact, series)` style so both value and gradient are finite.

Data layouts (identical to the reference so checkpoints/trajectories interop):
    SO3   (..., 4): [qx, qy, qz, qw]
    RxSO3 (..., 5): [qx, qy, qz, qw, s]
    SE3   (..., 7): [tx, ty, tz, qx, qy, qz, qw]
    Sim3  (..., 8): [tx, ty, tz, qx, qy, qz, qw, s]

Tangent layouts:
    so3 (...,3)=[phi]; rxso3 (...,4)=[phi,sigma];
    se3 (...,6)=[tau,phi]; sim3 (...,7)=[tau,phi,sigma]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
# TPU matmul defaults round fp32 operands toward bf16; Lie algebra 3x3 math is
# tiny and precision-critical, so always contract at full precision.
_HIGHEST = jax.lax.Precision.HIGHEST


def _matvec3(M, v):
    return jnp.einsum('...ij,...j->...i', M, v, precision=_HIGHEST)


def _outer3(a, b):
    return a[..., :, None] * b[..., None, :]


# ---------------------------------------------------------------------------
# quaternion primitives (Hamilton, [x, y, z, w])
# ---------------------------------------------------------------------------

def quat_mul(q1, q2):
    """Hamilton product q1 * q2, layout [x,y,z,w]."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
        w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_inv(q):
    """Conjugate (== inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Same 2-cross-product formulation as the reference CUDA `actSO3`
    (dpvo/fastba/ba_cuda.cu:36-46) — cheap and fusion-friendly.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q):
    """Unit quaternion -> rotation matrix (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (y2 + z2), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (x2 + z2), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (x2 + y2),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def _hat(phi):
    """so3 hat operator (..., 3) -> (..., 3, 3)."""
    a, b, c = jnp.moveaxis(phi, -1, 0)
    o = jnp.zeros_like(a)
    m = jnp.stack([o, -c, b, c, o, -a, -b, a, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def so3_exp(phi):
    """so3 -> SO3 quaternion. Taylor-guarded like ba_cuda.cu:88-110.

    Both jnp.where branches are evaluated under autodiff, so the exact branch
    must use a *safe* denominator (the classic where-NaN-grad rule).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    imag = jnp.where(small,
                     0.5 - theta_sq / 48.0 + theta_p4 / 3840.0,
                     jnp.sin(0.5 * theta) / theta)
    real = jnp.where(small,
                     1.0 - theta_sq / 8.0 + theta_p4 / 384.0,
                     jnp.cos(0.5 * theta))
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q):
    """SO3 quaternion -> so3 tangent."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # ensure w >= 0 (q and -q are the same rotation)
    sgn = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sgn
    qw = qw * sgn
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n_sq < 1e-12
    n = jnp.sqrt(jnp.where(small, jnp.ones_like(n_sq), n_sq))
    theta = 2.0 * jnp.arctan2(n, qw)
    qw_safe = jnp.maximum(qw, _EPS)
    # phi = theta * qv / n; for small n use series 2/w * (1 - n^2/(3 w^2))
    scale = jnp.where(small,
                      2.0 / qw_safe * (1.0 - n_sq / (3.0 * qw_safe * qw_safe)),
                      theta / n)
    return scale * qv


def so3_inv(q):
    return quat_inv(q)


def so3_mul(q1, q2):
    return quat_mul(q1, q2)


def so3_act(q, p):
    return quat_rotate(q, p)


def so3_adj(q, phi):
    return quat_rotate(q, phi)


def so3_adjT(q, phi):
    return quat_rotate(quat_inv(q), phi)


def _so3_left_jacobian(phi):
    """V(phi): integral of exp; J_l = I + a*hat + b*hat^2 (..., 3, 3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    # (1-cos t)/t^2 = 2 sin^2(t/2)/t^2 — cancellation-free in fp32
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  2.0 * jnp.sin(0.5 * theta) ** 2 / theta_sq_safe)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / (theta_sq_safe * theta))
    hat = _hat(phi)
    # exact closed form: hat^2 = phi phi^T - theta^2 I  (avoids low-precision matmul)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), hat.shape)
    hat2 = _outer3(phi, phi) - theta_sq * eye
    return eye + a * hat + b * hat2


def _so3_left_jacobian_inv(phi):
    """V(phi)^-1 = I - 1/2 hat + c hat^2."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    half = 0.5 * theta
    sin_half = jnp.sin(half)
    sin_half_safe = jnp.where(jnp.abs(sin_half) < _EPS,
                              jnp.ones_like(sin_half), sin_half)
    c = jnp.where(small,
                  1.0 / 12.0 + theta_sq / 720.0,
                  (1.0 - half * jnp.cos(half) / sin_half_safe) / theta_sq_safe)
    hat = _hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), hat.shape)
    hat2 = _outer3(phi, phi) - theta_sq * eye
    return eye - 0.5 * hat + c * hat2


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32):
    data = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return data.at[..., 6].set(1.0)


def se3_exp(xi):
    """se3 tangent [tau, phi] -> SE3 [t, q]."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = _matvec3(V, tau)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(data):
    t, q = data[..., :3], data[..., 3:7]
    phi = so3_log(q)
    Vinv = _so3_left_jacobian_inv(phi)
    tau = _matvec3(Vinv, t)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_inv(data):
    t, q = data[..., :3], data[..., 3:7]
    qinv = quat_inv(q)
    tinv = -quat_rotate(qinv, t)
    return jnp.concatenate([tinv, qinv], axis=-1)


def se3_mul(a, b):
    """Composition a * b (apply b first, then a)."""
    ta, qa = a[..., :3], a[..., 3:7]
    tb, qb = b[..., :3], b[..., 3:7]
    q = quat_mul(qa, qb)
    t = ta + quat_rotate(qa, tb)
    return jnp.concatenate([t, q], axis=-1)


def se3_act(data, p):
    """Act on 3D points (..., 3)."""
    t, q = data[..., :3], data[..., 3:7]
    return quat_rotate(q, p) + t


def se3_act4(data, p4):
    """Act on homogeneous points [x, y, z, w]: X' = R x + w t (ba_cuda.cu:48-55)."""
    t, q = data[..., :3], data[..., 3:7]
    x, w = p4[..., :3], p4[..., 3:4]
    return jnp.concatenate([quat_rotate(q, x) + w * t, w], axis=-1)


def se3_adjT(data, X):
    """Transpose-adjoint Ad_G^T applied to (..., 6) covectors.

    Mirrors the reference device routine adjSE3 (ba_cuda.cu:57-72):
      Y[:3] = R^T X[:3];  Y[3:] = R^T X[3:] + R^T (X[:3] x t)
    """
    t, q = data[..., :3], data[..., 3:7]
    qinv = quat_inv(q)
    Xa, Xb = X[..., :3], X[..., 3:6]
    Ya = quat_rotate(qinv, Xa)
    Yb = quat_rotate(qinv, Xb) + quat_rotate(qinv, jnp.cross(Xa, t))
    return jnp.concatenate([Ya, Yb], axis=-1)


def se3_adj(data, xi):
    """Adjoint Ad_G applied to (..., 6) tangent vectors [tau, phi]."""
    t, q = data[..., :3], data[..., 3:7]
    tau, phi = xi[..., :3], xi[..., 3:6]
    Rphi = quat_rotate(q, phi)
    Rtau = quat_rotate(q, tau)
    return jnp.concatenate([Rtau + jnp.cross(t, Rphi), Rphi], axis=-1)


def se3_retr(data, xi):
    """Left-multiplicative retraction: exp(xi) * data (ba_cuda.cu:156-174)."""
    return se3_mul(se3_exp(xi), data)


def se3_matrix(data):
    """(..., 4, 4) homogeneous matrix."""
    t, q = data[..., :3], data[..., 3:7]
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=data.dtype),
        t.shape[:-1] + (4,))[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_scale(data, s):
    """Scale translation (lietorch SE3.scale, groups.py:282)."""
    t, q = data[..., :3], data[..., 3:7]
    return jnp.concatenate([t * s, q], axis=-1)


# ---------------------------------------------------------------------------
# RxSO3
# ---------------------------------------------------------------------------

def rxso3_exp(xi):
    """[phi, sigma] -> [q, s]."""
    phi, sigma = xi[..., :3], xi[..., 3:4]
    q = so3_exp(phi)
    return jnp.concatenate([q, jnp.exp(sigma)], axis=-1)


def rxso3_log(data):
    q, s = data[..., :4], data[..., 4:5]
    return jnp.concatenate([so3_log(q), jnp.log(s)], axis=-1)


def rxso3_inv(data):
    q, s = data[..., :4], data[..., 4:5]
    return jnp.concatenate([quat_inv(q), 1.0 / s], axis=-1)


def rxso3_mul(a, b):
    qa, sa = a[..., :4], a[..., 4:5]
    qb, sb = b[..., :4], b[..., 4:5]
    return jnp.concatenate([quat_mul(qa, qb), sa * sb], axis=-1)


def rxso3_act(data, p):
    q, s = data[..., :4], data[..., 4:5]
    return s * quat_rotate(q, p)


def rxso3_act4(data, p4):
    """Act on homogeneous points [x, y, z, w]: X' = s R x (w unchanged)."""
    x, w = p4[..., :3], p4[..., 3:4]
    return jnp.concatenate([rxso3_act(data, x), w], axis=-1)


def rxso3_adj(data, xi):
    """Adjoint on (..., 4) tangents [phi, sigma]: rotation part rotated,
    scale part invariant (reference include/rxso3.h Adj)."""
    q = data[..., :4]
    phi, sigma = xi[..., :3], xi[..., 3:4]
    return jnp.concatenate([quat_rotate(q, phi), sigma], axis=-1)


def rxso3_adjT(data, X):
    """Transpose adjoint: <adjT(G) X, xi> == <X, adj(G) xi>."""
    q = data[..., :4]
    a, b = X[..., :3], X[..., 3:4]
    return jnp.concatenate([quat_rotate(quat_inv(q), a), b], axis=-1)


def rxso3_matrix(data):
    """(..., 3, 3) scaled rotation matrix s*R."""
    return quat_to_matrix(data[..., :4]) * data[..., 4:5, None]


# ---------------------------------------------------------------------------
# Sim3
# ---------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32):
    data = jnp.zeros(tuple(shape) + (8,), dtype=dtype)
    return data.at[..., 6].set(1.0).at[..., 7].set(1.0)


def _sim3_W(phi, sigma):
    """The Sim3 'W' matrix: integral of exp(sigma t) R(phi t) dt over [0,1].

    W = A*I + B*hat(phi) + C*hat(phi)^2. All branches are written in
    cancellation-free fp32 forms: expm1 instead of e^s - 1, 2 sin^2(t/2)
    instead of 1 - cos t, and series fallbacks switched at thresholds sized
    for fp32 (naive forms like ((s-1)e^s + 1) lose ALL significant bits for
    s ~ 1e-5).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small_theta = theta_sq < 1e-6          # theta < 1e-3
    theta_sq_s = jnp.where(small_theta, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_s)
    sig = sigma[..., None]
    scale = jnp.exp(sig)
    em1 = jnp.expm1(sig)                   # e^s - 1, stable near 0
    small_sig = jnp.abs(sig) < 1e-4
    sig_safe = jnp.where(small_sig, jnp.ones_like(sig), sig)

    # A = expm1(s)/s (exact limit 1); series only guards s == 0 exactly
    A = jnp.where(jnp.abs(sig) < 1e-8, 1.0 + sig / 2.0, em1 / jnp.where(
        jnp.abs(sig) < 1e-8, jnp.ones_like(sig), sig))

    s2t2 = sig * sig + theta_sq
    s2t2 = jnp.where(s2t2 < _EPS, jnp.ones_like(s2t2), s2t2)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    half_sin_sq = 2.0 * jnp.sin(0.5 * theta) ** 2   # = 1 - cos(t), stable

    # general branch (both finite):  a = e^s sin t;  b - 1 = e^s cos t - 1
    a = scale * sin_t
    b_m1 = em1 * cos_t - half_sin_sq               # = e^s cos t - 1, stable
    B_gen = (a * sig - b_m1 * theta) / (theta * s2t2)
    C_gen = (A - (b_m1 * sig + a * theta) / s2t2) / theta_sq_s

    # sigma -> 0 limit: B = (1-cos t)/t^2 = 2 sin^2(t/2)/t^2, C = (t-sin t)/t^3
    B_sig0 = half_sin_sq / theta_sq_s
    C_sig0 = (theta - sin_t) / (theta_sq_s * theta)

    # theta -> 0 limit, written cancellation-free:
    #   B = (s e^s - expm1(s))/s^2;  C = (s^2/2 e^s - s e^s + expm1(s))/s^3
    sig_sq_safe = jnp.where(small_sig, jnp.ones_like(sig), sig * sig)
    B_th0 = (sig * scale - em1) / sig_sq_safe
    C_th0 = (0.5 * sig * sig * scale - sig * scale + em1) / \
        (sig_sq_safe * sig_safe)

    # both small: second-order series
    B_00 = 0.5 + sig / 6.0 + sig * sig / 24.0
    C_00 = 1.0 / 6.0 + sig / 24.0 - theta_sq / 120.0

    B = jnp.where(small_theta, jnp.where(small_sig, B_00, B_th0),
                  jnp.where(small_sig, B_sig0, B_gen))
    C = jnp.where(small_theta, jnp.where(small_sig, C_00, C_th0),
                  jnp.where(small_sig, C_sig0, C_gen))

    hat = _hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), hat.shape)
    hat2 = _outer3(phi, phi) - theta_sq * eye
    return A * eye + B * hat + C * hat2


def sim3_exp(xi):
    """[tau, phi, sigma] -> [t, q, s]."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = _matvec3(W, tau)
    return jnp.concatenate([t, q, jnp.exp(sigma)], axis=-1)


def _inv3(M):
    """Closed-form 3x3 inverse (adjugate) — elementwise, full fp32 precision
    (jnp.linalg.solve routes through low-precision matmuls on TPU)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack([
        A, -(b * i - c * h), (b * f - c * e),
        B, (a * i - c * g), -(a * f - c * d),
        C, -(a * h - b * g), (a * e - b * d),
    ], axis=-1).reshape(M.shape)
    return adj * inv_det[..., None, None]


def sim3_log(data):
    t, q, s = data[..., :3], data[..., 3:7], data[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(s)
    W = _sim3_W(phi, sigma)
    tau = _matvec3(_inv3(W), t)
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_inv(data):
    t, q, s = data[..., :3], data[..., 3:7], data[..., 7:8]
    qinv = quat_inv(q)
    tinv = -quat_rotate(qinv, t) / s
    return jnp.concatenate([tinv, qinv, 1.0 / s], axis=-1)


def sim3_mul(a, b):
    ta, qa, sa = a[..., :3], a[..., 3:7], a[..., 7:8]
    tb, qb, sb = b[..., :3], b[..., 3:7], b[..., 7:8]
    q = quat_mul(qa, qb)
    t = ta + sa * quat_rotate(qa, tb)
    return jnp.concatenate([t, q, sa * sb], axis=-1)


def sim3_act(data, p):
    t, q, s = data[..., :3], data[..., 3:7], data[..., 7:8]
    return s * quat_rotate(q, p) + t


def sim3_act4(data, p4):
    """Homogeneous action: [s R x + w t, w] (matches lietorch Sim3 act4)."""
    t, q, s = data[..., :3], data[..., 3:7], data[..., 7:8]
    x, w = p4[..., :3], p4[..., 3:4]
    return jnp.concatenate([s * quat_rotate(q, x) + w * t, w], axis=-1)


def sim3_retr(data, xi):
    return sim3_mul(sim3_exp(xi), data)


def sim3_matrix(data):
    t, q, s = data[..., :3], data[..., 3:7], data[..., 7:8]
    R = quat_to_matrix(q) * s[..., None]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=data.dtype),
        t.shape[:-1] + (4,))[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_adjT(data, X):
    """Ad_G^T on (..., 7) covectors [tau*, phi*, sigma*] (mirrors lietorch Sim3).

    Sim3 adjoint (tangent order [tau, phi, sigma]):
        Ad = [ sR   [t]x R   -t ]
             [ 0      R       0 ]
             [ 0      0       1 ]
    """
    t, q, s = data[..., :3], data[..., 3:7], data[..., 7:8]
    Xa, Xb, Xc = X[..., :3], X[..., 3:6], X[..., 6:7]
    qinv = quat_inv(q)
    Ya = s * quat_rotate(qinv, Xa)
    Yb = quat_rotate(qinv, Xb) + quat_rotate(qinv, jnp.cross(Xa, t))
    Yc = Xc - jnp.sum(t * Xa, axis=-1, keepdims=True)
    return jnp.concatenate([Ya, Yb, Yc], axis=-1)


# ---------------------------------------------------------------------------
# Thin OO wrappers for API parity with the reference's lietorch classes
# (reference dpvo/lietorch/groups.py). Registered as pytrees so they pass
# through jit/vmap transparently.
# ---------------------------------------------------------------------------

class _LieGroup:
    embedded_dim = None  # set by subclass
    _fns = {}

    def __init__(self, data):
        self.data = jnp.asarray(data)

    # pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # generic ops ----------------------------------------------------------
    def __getitem__(self, idx):
        return type(self)(self.data[idx])

    @property
    def shape(self):
        return self.data.shape[:-1]

    def inv(self):
        return type(self)(self._fns['inv'](self.data))

    def log(self):
        return self._fns['log'](self.data)

    @classmethod
    def exp(cls, xi):
        return cls(cls._fns['exp'](xi))

    def __mul__(self, other):
        if isinstance(other, _LieGroup):
            a, b = jnp.broadcast_arrays(self.data, other.data)
            return type(self)(self._fns['mul'](a, b))
        # act on points
        other = jnp.asarray(other)
        if other.shape[-1] == 3:
            return self._fns['act'](self.data, other)
        return self._fns['act4'](self.data, other)

    def retr(self, xi):
        return type(self)(self._fns['retr'](self.data, xi))

    def matrix(self):
        return self._fns['matrix'](self.data)

    def adjT(self, X):
        return self._fns['adjT'](self.data, X)

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        data = jnp.zeros(tuple(shape) + (cls.embedded_dim,), dtype=dtype)
        data = data.at[..., 6 if cls.embedded_dim >= 7 else 3].set(1.0)
        if cls.embedded_dim == 8:
            data = data.at[..., 7].set(1.0)
        if cls.embedded_dim == 5:
            data = data.at[..., 4].set(1.0)
        return cls(data)

    @classmethod
    def IdentityLike(cls, other):
        return cls.Identity(*other.shape)

    @classmethod
    def Random(cls, *shape, sigma=1.0, key=None):
        """Random group elements (reference groups.py Random)."""
        import numpy as _np
        dof = {4: 3, 5: 4, 7: 6, 8: 7}[cls.embedded_dim]
        rng = _np.random if key is None else _np.random.RandomState(key)
        xi = jnp.asarray(rng.randn(*shape, dof) * sigma, jnp.float32)
        return cls.exp(xi)

    def vec(self):
        return self.data

    def translation(self):
        """Homogeneous translation [t, 1] (reference groups.py:214-218)."""
        t = self.data[..., :3]
        return jnp.concatenate([t, jnp.ones_like(t[..., :1])], axis=-1)

    def adj(self, xi):
        fn = self._fns.get('adj')
        if fn is None:
            # generic: Ad_X xi = d/deps log(X exp(eps xi) X^-1)
            return jax.jvp(
                lambda e: self._fns['log'](self._fns['mul'](
                    self._fns['mul'](self.data, self._fns['exp'](e)),
                    self._fns['inv'](self.data))),
                (jnp.zeros_like(xi),), (xi,))[1]
        return fn(self.data, xi)

    def Jinv(self, tau):
        """Inverse left Jacobian applied to tau: J_l^{-1}(Log X) tau."""
        def f(e):
            return self._fns['log'](
                self._fns['mul'](self._fns['exp'](e), self.data))
        # d log(exp(e) X)/de at 0 equals J_l^{-1}(Log X)
        return jax.jvp(f, (jnp.zeros_like(tau),), (tau,))[1]

    def detach(self):
        return type(self)(jax.lax.stop_gradient(self.data))


def stack(groups, dim=0):
    """lietorch.stack equivalent."""
    cls = type(groups[0])
    return cls(jnp.stack([g.data for g in groups], axis=dim))


@jax.tree_util.register_pytree_node_class
class SO3(_LieGroup):
    embedded_dim = 4
    _fns = dict(exp=so3_exp, log=so3_log, inv=so3_inv, mul=so3_mul,
                act=so3_act, act4=None, retr=lambda d, xi: so3_mul(so3_exp(xi), d),
                matrix=quat_to_matrix, adjT=so3_adjT, adj=so3_adj)


@jax.tree_util.register_pytree_node_class
class RxSO3(_LieGroup):
    embedded_dim = 5
    _fns = dict(exp=rxso3_exp, log=rxso3_log, inv=rxso3_inv, mul=rxso3_mul,
                act=rxso3_act, act4=rxso3_act4,
                retr=lambda d, xi: rxso3_mul(rxso3_exp(xi), d),
                matrix=rxso3_matrix, adj=rxso3_adj, adjT=rxso3_adjT)


@jax.tree_util.register_pytree_node_class
class SE3(_LieGroup):
    embedded_dim = 7
    _fns = dict(exp=se3_exp, log=se3_log, inv=se3_inv, mul=se3_mul,
                act=se3_act, act4=se3_act4, retr=se3_retr,
                matrix=se3_matrix, adjT=se3_adjT, adj=se3_adj)

    def scale(self, s):
        return SE3(se3_scale(self.data, s))


@jax.tree_util.register_pytree_node_class
class Sim3(_LieGroup):
    embedded_dim = 8
    _fns = dict(exp=sim3_exp, log=sim3_log, inv=sim3_inv, mul=sim3_mul,
                act=sim3_act, act4=sim3_act4, retr=sim3_retr,
                matrix=sim3_matrix, adjT=sim3_adjT)
