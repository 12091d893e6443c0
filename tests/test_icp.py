import numpy as np
import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics, tiny_test_config
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.io.synth import Scene, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.tracking.odometry import (
    GroundTruthOdometry,
    build_map_pyramid,
    icp_odometry,
)

# bigger camera than tiny config for better conditioning
CAM = CameraIntrinsics(fx=140.0, fy=140.0, cx=80.0, cy=60.0, width=160, height=120)
SCENE = Scene.default()
LEVELS = 3
ITERS = (6, 5, 4)


def maps_for_pose(T_wc):
    depth_mm, _ = render_frame(SCENE, CAM, T_wc)
    depth = pp.depth_to_metres(jnp.array(depth_mm.astype(np.float32)))
    return build_map_pyramid(CAM, depth, LEVELS)


def run_icp(T_a, T_b):
    """Estimate T taking frame-b camera points into frame-a camera frame."""
    pyr_a = maps_for_pose(T_a)
    pyr_b = maps_for_pose(T_b)
    f = jax.jit(lambda ca, cb: icp_odometry(CAM, cb, ca, ITERS))
    T, count, res = f(pyr_a, pyr_b)
    return np.array(T), float(count)


def twist_pose(xi):
    return np.array(se3.exp_se3(jnp.array(xi, dtype=jnp.float32)))


def check_recovery(xi, tol_t=0.004, tol_r=0.004):
    T_a = np.eye(4)
    T_b = twist_pose(xi)  # ground-truth camera motion a->b in world frame
    T_est, count = run_icp(T_a, T_b)
    T_gt = np.linalg.inv(T_a) @ T_b  # b-cam -> a-cam
    err = np.array(se3.log_se3(jnp.array(np.linalg.inv(T_gt) @ T_est, dtype=jnp.float32)))
    assert count > 1000, f"too few inliers: {count}"
    assert np.linalg.norm(err[3:]) < tol_t, f"trans err {err}"
    assert np.linalg.norm(err[:3]) < tol_r, f"rot err {err}"


def test_icp_identity():
    T_est, count = run_icp(np.eye(4), np.eye(4))
    np.testing.assert_allclose(T_est, np.eye(4), atol=1e-4)


def test_icp_small_translation():
    check_recovery([0, 0, 0, 0.01, -0.015, 0.02])


def test_icp_small_rotation():
    check_recovery([0.02, -0.015, 0.01, 0, 0, 0])


def test_icp_combined_motion():
    check_recovery([0.015, 0.01, -0.01, 0.02, 0.01, -0.015])


def test_icp_larger_motion_converges():
    # ~3 deg + 4 cm — typical inter-frame at 30 Hz is far smaller
    check_recovery([0.05, 0.0, 0.02, 0.03, -0.02, 0.01], tol_t=0.01, tol_r=0.01)


def test_ground_truth_odometry():
    stamps = np.array([0.0, 1 / 30, 2 / 30])
    T0 = np.eye(4)
    d1 = twist_pose([0.01, 0, 0, 0.02, 0, 0])
    d2 = twist_pose([0, 0.01, 0, 0, 0.015, 0])
    poses = np.stack([T0, T0 @ d1, T0 @ d1 @ d2])
    gt = GroundTruthOdometry(stamps, poses)
    np.testing.assert_allclose(gt.delta(0), np.eye(4), atol=1e-7)  # first frame
    np.testing.assert_allclose(gt.delta(int(1e6 / 30)), d1, atol=1e-6)
    np.testing.assert_allclose(gt.delta(int(2e6 / 30)), d2, atol=1e-6)
    # missing stamp -> identity, keeps last known pose
    assert not gt.has_pose(int(0.5e6))
    np.testing.assert_allclose(gt.delta(int(0.5e6)), np.eye(4))


def test_icp_covariance_shape_and_informativeness():
    """A^-1 odometry covariance (ICPOdometry.cpp:188-191 role): SPD, and
    a geometry-rich frame pair is far better conditioned than a
    fronto-parallel wall (which leaves x/y slide + roll loose)."""
    import jax.numpy as jnp
    from kintinuous_tpu.config import CameraIntrinsics
    from kintinuous_tpu.io.synth import Scene, render_frame
    from kintinuous_tpu.ops import preprocess as pp
    from kintinuous_tpu.ops.maps import create_nmap, create_vmap
    from kintinuous_tpu.tracking.odometry import icp_covariance

    cam = CameraIntrinsics(fx=70.0, fy=70.0, cx=40.0, cy=30.0, width=80, height=60)

    def maps_of(scene):
        d, _ = render_frame(scene, cam, np.eye(4))
        dm = pp.depth_to_metres(jnp.asarray(d, jnp.float32), 6.0)
        v = create_vmap(cam, dm)
        return v, create_nmap(v)

    v1, n1 = maps_of(Scene.default())
    cov_rich = np.asarray(
        icp_covariance(cam, jnp.eye(4), v1, n1, v1, n1)
    )
    assert cov_rich.shape == (6, 6)
    assert np.allclose(cov_rich, cov_rich.T, atol=1e-8)
    assert np.all(np.linalg.eigvalsh(cov_rich) > 0)

    # bare room (fronto-parallel wall dominates): much larger
    # uncertainty in the loose directions
    wall = Scene()  # no spheres/cuboids
    v2, n2 = maps_of(wall)
    cov_wall = np.asarray(icp_covariance(cam, jnp.eye(4), v2, n2, v2, n2))
    assert np.trace(cov_wall) > 10.0 * np.trace(cov_rich)


def test_prior_increment_recovers_small_motion():
    from kintinuous_tpu.geometry import se3
    from kintinuous_tpu.ops.reduce import prior_increment

    xi = jnp.asarray([0.02, -0.05, 0.01, 0.03, -0.01, 0.02], jnp.float32)
    T_prior = se3.exp_se3(xi)
    out = np.asarray(prior_increment(jnp.eye(4, dtype=jnp.float32), T_prior))
    np.testing.assert_allclose(out, np.asarray(xi), atol=2e-3)


def test_motion_prior_pins_null_direction_only():
    """A system with one near-null direction (the pivot-end
    rotation/lateral ambiguity): the prior must supply the prior's
    component along the null direction while leaving well-observed
    directions essentially untouched (<2% bias at weight 0.01)."""
    from kintinuous_tpu.geometry import se3
    from kintinuous_tpu.ops.reduce import add_motion_prior, solve_gn

    rng = np.random.default_rng(0)
    # data term: strong in 5 directions, near-null in one mixed
    # direction u = (w_y + v_x/z) / norm with z = 2 m lever
    z = 2.0
    u = np.zeros(6)
    u[1] = 1.0  # omega_y
    u[3] = z    # v_x (image-equivalent mixing)
    u /= np.linalg.norm(u)
    Q = np.linalg.qr(
        np.concatenate([u[:, None], rng.normal(size=(6, 5))], axis=1)
    )[0]
    evals = np.array([1e-6, 3.0, 2.5, 2.0, 1.0, 0.8]) * 1e4
    A = (Q * evals) @ Q.T
    # true motion: pure rotation about y (pivot), 3.5 deg
    xi_true = np.array([0.0, 0.061, 0.0, 0.0, 0.0, 0.0], np.float32)
    b = A @ xi_true
    # corrupt b along the null direction (noise-induced slide pressure)
    b_noisy = b + u * 2.0 * 1e-2 * evals[0] * 50

    A_j = jnp.asarray(A, jnp.float32)
    b_j = jnp.asarray(b_noisy, jnp.float32)
    T_prior = se3.exp_se3(jnp.asarray(xi_true))
    T_id = jnp.eye(4, dtype=jnp.float32)

    xi_no, _ = solve_gn(A_j, b_j)
    Ap, bp = add_motion_prior(A_j, b_j, T_id, T_prior, 0.01)
    xi_p, _ = solve_gn(Ap, bp)

    err_no = np.linalg.norm(np.asarray(xi_no) - xi_true)
    err_p = np.linalg.norm(np.asarray(xi_p) - xi_true)
    assert err_p < 0.1 * err_no, (err_no, err_p)
    # well-observed components stay within 2%
    proj = np.eye(6) - np.outer(u, u)
    obs_err = np.linalg.norm(proj @ (np.asarray(xi_p) - xi_true))
    assert obs_err < 0.02 * np.linalg.norm(xi_true)
