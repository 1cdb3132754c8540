"""SE(3) rigid-transform operations as pure jnp functions.

Replaces the reference ``Transformation`` class (types.hpp:74-136: from_rt /
R / t / apply / compose / inverse) plus the Rodrigues rotation-vector-to-matrix
conversion used by the ICP solver (icp.hpp:126-141), and adds the exp/log maps
required by the from-scratch pose-graph optimizer (the reference gets these
from GTSAM's Pose3).

Conventions:
- Transforms are (…, 4, 4) homogeneous matrices [R t; 0 1].
- Tangent vectors are 6-vectors [omega, v] (rotation first) — matching the
  reference solver's unknown ordering x = [r; t] (icp.hpp:123-124) and GTSAM.
- All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# f32-accurate matmuls on TPU (the default bf16 MXU mode loses ~0.3 m at 80 m
# range — unacceptable for geometry). These contractions are tiny; the
# multi-pass mode is free in practice.
_PREC = jax.lax.Precision.HIGHEST


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble [R t; 0 1] (reference types.hpp:84-92)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def trans(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply to (…, N, 3) points row-wise: P R^T + t (reference types.hpp:110-115)."""
    rotated = jnp.matmul(pts, jnp.swapaxes(rot(T), -1, -2), precision=_PREC)
    return rotated + trans(T)[..., None, :]


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A * B — A applied after B (reference types.hpp:118-124)."""
    return jnp.matmul(A, B, precision=_PREC)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Rigid inverse via R-transpose fast path (reference types.hpp:128-132)."""
    Rt = jnp.swapaxes(rot(T), -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, trans(T))
    return from_rt(Rt, t_inv)


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint (…, 6, 6) for the [omega, v] twist ordering:
    Ad_T = [[R, 0], [hat(t) R, R]] — transports right-perturbation twists,
    X Exp(d) = X ... Exp(Ad_{Y^{-1}} d) ... commutation (used by the pose
    graph's hand-linearized relative-parameterization Jacobian)."""
    R = rot(T)
    tR = jnp.matmul(hat(trans(T)), R, precision=_PREC)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x of (…, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sin_cos_coeffs(theta2: jnp.ndarray):
    """Safe (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3).

    f32-safe: (1-cos t) and (t - sin t) cancel catastrophically for small t
    (at t ~ 2e-4, 1-cos t underflows f32 entirely, which poisoned the
    pose-graph translation log). B uses the cancellation-free half-angle form
    2 sin^2(t/2)/t^2; C switches to a Taylor series below t = 0.1 where the
    direct form has >1e-2 relative error in f32.
    """
    tiny = theta2 < 1e-12
    theta2_safe = jnp.where(tiny, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(tiny, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    # B = 2 sin^2(t/2) / t^2 = 0.5 * (sin(t/2)/(t/2))^2 — no cancellation.
    half_sinc = jnp.where(tiny, 1.0 - theta2 / 24.0, jnp.sin(theta * 0.5) / (theta * 0.5))
    B = 0.5 * half_sinc * half_sinc
    small_c = theta2 < 0.01  # t < 0.1
    C = jnp.where(
        small_c,
        1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    return A, B, C


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula (mirrors the reference's ICP delta-rotation path,
    icp.hpp:126-141: R = I + sin(t) K + (1-cos(t)) K^2 with K = hat(axis))."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sin_cos_coeffs(theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of Rodrigues, robust near theta = 0 and theta = pi.

    Written to be differentiable-safe: this feeds the pose-graph optimizer's
    jvp/vjp products, so *both* sides of every ``where`` must have finite
    primals AND tangents at every evaluated input (a NaN in the untaken
    branch of a ``where`` still poisons reverse-mode gradients). Inputs to
    each branch are sanitized before any sqrt/atan2/asin.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    anti = vee(R - jnp.swapaxes(R, -1, -2))  # 2 sin(theta) * axis
    s2 = jnp.sum(anti * anti, axis=-1) * 0.25  # sin(theta)^2
    near_pi = cos_t < -1.0 + 1e-4

    # Generic branch: w = theta / (2 sin theta) * anti, Taylor near theta=0.
    # theta via atan2(sin, cos) — no arccos (its tangent blows up at |c|=1).
    small = s2 < 1e-12
    s2_g = jnp.where(small, 1.0, s2)  # sanitized: sqrt tangent finite
    s_g = jnp.sqrt(s2_g)
    theta_g = jnp.arctan2(s_g, cos_t)
    scale = jnp.where(small, 0.5 + s2 / 12.0, theta_g / (2.0 * s_g))
    w_generic = scale[..., None] * anti

    # Near pi: axis from the symmetric part S = (R + I)/2 = aa^T at theta=pi;
    # theta = pi - asin(sin) with a branch-sanitized asin argument.
    s_pi = jnp.sqrt(jnp.where(near_pi, s2, 0.0) + 1e-20)
    theta_pi = jnp.pi - jnp.arcsin(jnp.minimum(s_pi, 1.0))
    S = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), _EPS)
    # Fix the sign so that axis agrees with the antisymmetric part when nonzero.
    sign = jnp.where(jnp.sum(axis * anti, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = (sign * theta_pi)[..., None] * axis

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map of (…, 6) tangent [omega, v]."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _sin_cos_coeffs(theta2)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + A[..., None, None] * W + B[..., None, None] * WW
    V = I + B[..., None, None] * W + C[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, v)
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm map to (…, 6) tangent [omega, v]."""
    R, t = rot(T), trans(T)
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sin_cos_coeffs(theta2)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + coef * W^2, coef = (1 - A/(2B)) / theta^2, -> 1/12 at 0.
    # 1 - A/(2B) cancels below theta ~ 0.1 in f32 -> Taylor there.
    small = theta2 < 0.01
    theta2_safe = jnp.where(small, 1.0, theta2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        (1.0 - A / (2.0 * B)) / theta2_safe,
    )
    Vinv = I - 0.5 * W + coef[..., None, None] * WW
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) (Gram-Schmidt); guards f32 drift
    from long compose chains (no reference analog — Eigen ran in f64)."""
    R = rot(T)
    x = R[..., :, 0]
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), _EPS)
    y = R[..., :, 1]
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), _EPS)
    z = jnp.cross(x, y)
    Rn = jnp.stack([x, y, z], axis=-1)
    return from_rt(Rn, trans(T))
