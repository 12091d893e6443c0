import numpy as np
import pytest

import jax.numpy as jnp

from kintinuous_tpu.geometry import se3


def random_twist(rng, rot_scale=1.0, trans_scale=1.0):
    w = rng.normal(size=3) * rot_scale
    v = rng.normal(size=3) * trans_scale
    return np.concatenate([w, v]).astype(np.float32)


def test_exp_log_so3_roundtrip():
    rng = np.random.default_rng(0)
    for scale in [1e-8, 1e-4, 0.1, 1.0, 2.5]:
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * scale
        R = se3.exp_so3(jnp.array(w, dtype=jnp.float32))
        w2 = np.array(se3.log_so3(R))
        np.testing.assert_allclose(w2, w, atol=2e-3)  # f32 near theta=pi


def test_exp_so3_is_rotation():
    rng = np.random.default_rng(1)
    for _ in range(10):
        R = np.array(se3.exp_so3(jnp.array(random_twist(rng)[:3])))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_exp_log_se3_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        xi = random_twist(rng, rot_scale=0.8, trans_scale=2.0)
        T = se3.exp_se3(jnp.array(xi))
        xi2 = np.array(se3.log_se3(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_small_angle_stability():
    xi = jnp.array([1e-9, -1e-9, 1e-9, 0.5, -0.2, 0.1], dtype=jnp.float32)
    T = se3.exp_se3(xi)
    np.testing.assert_allclose(np.array(T[:3, 3]), [0.5, -0.2, 0.1], atol=1e-6)
    np.testing.assert_allclose(np.array(T[:3, :3]), np.eye(3), atol=1e-6)


def test_inverse_compose():
    rng = np.random.default_rng(3)
    T = se3.exp_se3(jnp.array(random_twist(rng)))
    I = np.array(T @ se3.inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_transform_points():
    T = se3.make_T(jnp.eye(3), jnp.array([1.0, 2.0, 3.0]))
    pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    out = np.array(se3.transform_points(T, pts))
    np.testing.assert_allclose(out, [[1, 2, 3], [2, 3, 4]], atol=1e-6)
