"""Odometry providers.

Mirrors the provider split of src/frontend/OdometryProvider.h:42-68:
  icp_odometry / ICPOdometry      <- src/frontend/ICPOdometry.{h,cpp}
  GroundTruthOdometry             <- src/frontend/GroundTruthOdometry.{h,cpp}
  (photometric RGB-D odometry lives in tracking/rgbd.py)

The whole coarse-to-fine Gauss-Newton runs inside one XLA program —
levels unrolled, iterations as fori_loops, the 6x6 solve on device —
in contrast to the reference's ~19 kernel launches + per-iteration
29-float downloads (ICPOdometry.cpp:68-179, reduce.cu:401-418).

All odometry returns T_curr_to_prev: the transform taking current-frame
camera points into the previous camera frame. The tracker composes
pose_new = pose_prev @ T_curr_to_prev.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.ops import maps as map_ops
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.reduce import icp_solve_level

MapPyramid = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # ((vmap,nmap),...) fine->coarse


def build_map_pyramid(
    cam: CameraIntrinsics, depth_m: jnp.ndarray, levels: int
) -> MapPyramid:
    """Depth (already bilateral-filtered, metres) -> per-level (vmap, nmap).

    Depth is downsampled discontinuity-aware (pyr_down_depth) and maps
    are recomputed per level, like KintinuousTracker.cpp:465-479.
    """
    out = []
    d = depth_m
    for l in range(levels):
        cam_l = cam.at_level(l)
        vmap = map_ops.create_vmap(cam_l, d)
        nmap = map_ops.create_nmap(vmap)
        out.append((vmap, nmap))
        if l + 1 < levels:
            d = pp.pyr_down_depth(d, sigma=0.09)  # 3*30mm in metres
    return tuple(out)


def pyramid_from_maps(
    vmap: jnp.ndarray, nmap: jnp.ndarray, levels: int
) -> MapPyramid:
    """Downsample existing (raycast-predicted) maps into a pyramid
    (reference resizeVMap/NMap calls, KintinuousTracker.cpp:892-899)."""
    out = [(vmap, nmap)]
    v, n = vmap, nmap
    for _ in range(levels - 1):
        v = map_ops.resize_vmap(v)
        n = map_ops.resize_nmap(n)
        out.append((v, n))
    return tuple(out)


def icp_odometry(
    cam: CameraIntrinsics,
    curr_pyr: MapPyramid,
    pred_pyr: MapPyramid,
    iterations: Sequence[int],
    dist_thresh: float = 0.10,
    angle_thresh_deg: float = 20.0,
    T_init: Optional[jnp.ndarray] = None,
    reassoc_every: int = 1,
    T_prior: Optional[jnp.ndarray] = None,
    prior_weight: float = 0.0,
):
    """Coarse-to-fine frame-to-model point-to-plane ICP.

    iterations[l] = GN steps at level l (0 = finest), matching the
    reference schedule convention (ICPOdometry.cpp:44-55).
    Returns (T_curr_to_prev, inlier_count_finest, residual_finest).

    T_prior with prior_weight > 0 regularises every GN step toward the
    given transform (constant-velocity prior — see
    ops/reduce.add_motion_prior); pass it as T_init too so association
    starts from the predicted motion.
    """
    from kintinuous_tpu.ops.reduce import pack_maps

    levels = len(curr_pyr)
    T = T_init if T_init is not None else jnp.eye(4, dtype=jnp.float32)
    sin_t = math.sin(math.radians(angle_thresh_deg))
    count = jnp.float32(0.0)
    residual = jnp.float32(0.0)
    for l in range(levels - 1, -1, -1):
        iters = int(iterations[l]) if l < len(iterations) else 0
        if iters == 0:
            continue
        vc, nc = curr_pyr[l]
        vp, np_ = pred_pyr[l]
        # pack once per level; association inside the GN loop is then a
        # single row gather per pixel per iteration
        packed = pack_maps(vp, np_)
        # stale correspondences are only safe once the estimate is
        # sub-pixel accurate: group GN steps at the finest level only,
        # re-associate every iteration while motion is still large
        T, count, residual = icp_solve_level(
            cam.at_level(l), T, vc, nc, vp, np_, iters, dist_thresh, sin_t,
            packed_prev=packed, reassoc_every=reassoc_every if l == 0 else 1,
            T_prior=T_prior, prior_weight=prior_weight,
        )
    return T, count, residual


class GroundTruthOdometry:
    """Replays a loaded trajectory (reference
    GroundTruthOdometry.cpp:42-110): the inter-frame delta in the
    previous camera's frame, independent of the world basis. Frames
    missing a pose reuse the last delta = identity."""

    def __init__(self, stamps_s: np.ndarray, poses: np.ndarray, max_dt: float = 0.02):
        self._stamps = np.asarray(stamps_s)
        self._poses = np.asarray(poses)
        self._max_dt = max_dt
        self._last: Optional[np.ndarray] = None

    def _lookup(self, timestamp_us: int) -> Optional[np.ndarray]:
        t = timestamp_us / 1e6
        i = int(np.argmin(np.abs(self._stamps - t)))
        if abs(self._stamps[i] - t) > self._max_dt:
            return None
        return self._poses[i]

    def delta(self, timestamp_us: int) -> np.ndarray:
        """T_curr_to_prev for this frame (identity if pose missing)."""
        T = self._lookup(timestamp_us)
        if T is None or self._last is None:
            if T is not None:
                self._last = T
            return np.eye(4, dtype=np.float32)
        d = np.linalg.inv(self._last) @ T
        self._last = T
        return d.astype(np.float32)

    def has_pose(self, timestamp_us: int) -> bool:
        return self._lookup(timestamp_us) is not None


def icp_covariance(
    cam: CameraIntrinsics,
    T: jnp.ndarray,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    vmap_prev: jnp.ndarray,
    nmap_prev: jnp.ndarray,
    dist_thresh: float = 0.10,
    angle_thresh_deg: float = 20.0,
):
    """6x6 odometry covariance = A^-1 of the final-level GN system at
    the converged pose (ICPOdometry.cpp:188-191 / OdometryProvider.h:42-68
    role; twist order [w, v]). Damped so degenerate scenes return a
    large-but-finite covariance instead of inf."""
    from kintinuous_tpu.ops.reduce import icp_step

    sys_ = icp_step(
        cam, T, vmap_curr, nmap_curr, vmap_prev, nmap_prev,
        dist_thresh, math.sin(math.radians(angle_thresh_deg)),
    )
    A = sys_.A + 1e-6 * jnp.eye(6, dtype=sys_.A.dtype)
    return jnp.linalg.inv(A)
