"""SE(3) utilities as pure jnp functions.

The reference scatters this math across OpenCV Rodrigues calls
(src/frontend/OdometryProvider.h:42-68), a hand-rolled SVD log map
(src/frontend/KintinuousTracker.cpp:1210-1255 `rodrigues2`) and Eigen
compositions. Here it is one module, jit/vmap-friendly, used both on
device (inside the tracking Gauss-Newton loop) and on host.

Poses are 4x4 row-major matrices T = [[R, t], [0, 1]] mapping points
from the local frame into the parent frame. Twists are 6-vectors
[omega, v] (rotation first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w):
    """3-vector -> skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w):
    """Rodrigues' formula, exp: so(3) -> SO(3). Safe at theta ~ 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near zero
    small = theta2 < 1e-4  # f32: Taylor beats 1-cos cancellation below here
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log_so3(R):
    """log: SO(3) -> so(3) (axis-angle vector). Safe near identity/pi.

    Plays the role of the reference's `rodrigues2`
    (KintinuousTracker.cpp:1210-1255) without the SVD re-projection.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # antisymmetric part
    w_raw = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-6
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t + 1e-32))
    w = w_raw * scale[..., None]
    # near pi the antisymmetric part vanishes; recover axis from diagonal
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + 1e-32), 0.0, None)
    axis = jnp.sqrt(axis2)
    # fix signs from off-diagonals
    sign = jnp.sign(
        jnp.stack(
            [
                w_raw[..., 0],
                w_raw[..., 1],
                w_raw[..., 2],
            ],
            axis=-1,
        )
        + 1e-32
    )
    w_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def exp_se3(xi):
    """exp: se(3) -> SE(3). xi = [omega, v] -> 4x4."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-4  # f32: Taylor beats 1-cos cancellation below here
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2
    )
    eye = jnp.eye(3, dtype=xi.dtype)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_T(R, t)


def log_se3(T):
    """log: SE(3) -> se(3) twist [omega, v]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-4  # f32: Taylor beats 1-cos cancellation below here
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b)) / theta2,
    )
    eye = jnp.eye(3, dtype=T.dtype)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def make_T(R, t):
    """Assemble 4x4 from (...,3,3) and (...,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T, pts):
    """Apply (...,4,4) to points (...,N,3) or (...,3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, jnp.atleast_2d(pts)) + t[..., None, :]


def rotate_vectors(T, vecs):
    R = T[..., :3, :3]
    return jnp.einsum("...ij,...nj->...ni", R, jnp.atleast_2d(vecs))
