"""Tracking reductions (jnp → MXU).

TPU-native equivalent of src/frontend/cuda/reduce.cu — the three
Gauss-Newton system builders used by odometry:

  icp_step          <- icpStep (:347-419): point-to-plane ICP with
                       projective data association against the raycast
                       prediction, distance 0.10 m / angle sin 20 deg
                       gating (:211-254)
  rgb_step          <- rgbStep (:555-607): sigma-weighted photometric
                       least squares over precomputed correspondences
  rgb_residual      <- computeRgbResidual (:668-791): correspondence
                       search + residual statistics

The reference reduces its 29-float upper-triangle accumulator through
warp shuffles + a two-stage block tree (:89-184) and downloads it to
the host for an Eigen solve every iteration (:401-418). Here each
per-pixel Jacobian row is a masked (N,6) matrix and JtJ/Jtr fall out of
one `einsum` on the MXU; the 6x6 solve stays on device, so a whole
multi-level GN run is a single XLA program with zero host syncs.

Twist convention: xi = [omega, v]; updates compose as
T <- exp(xi) @ T with residual r = n . (d - s) (see icp_solve).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics
from kintinuous_tpu.geometry import se3


class GNSystem(NamedTuple):
    A: jnp.ndarray  # (6,6) JtJ
    b: jnp.ndarray  # (6,)  Jtr
    count: jnp.ndarray  # () f32 inliers
    residual: jnp.ndarray  # () f32 sum of squared residuals


def pack_maps(vmap: jnp.ndarray, nmap: jnp.ndarray) -> jnp.ndarray:
    """(3,H,W) vertex+normal maps -> (H*W, 8) rows [vx,vy,vz,nx,ny,nz,0,0].

    A single 8-wide row gather replaces six scalar gathers during
    projective association — contiguous 32B rows amortise the fetch."""
    HW = vmap.shape[1] * vmap.shape[2]
    return jnp.concatenate(
        [
            vmap.reshape(3, -1),
            nmap.reshape(3, -1),
            jnp.zeros((2, HW), vmap.dtype),
        ],
        axis=0,
    ).T


def icp_step(
    cam: CameraIntrinsics,
    T_curr_to_prev: jnp.ndarray,  # (4,4) current estimate
    vmap_curr: jnp.ndarray,  # (3,H,W) current-frame vertices (camera frame)
    nmap_curr: jnp.ndarray,  # (3,H,W) current-frame normals
    vmap_prev: jnp.ndarray,  # (3,H,W) predicted vertices (prev camera frame)
    nmap_prev: jnp.ndarray,  # (3,H,W) predicted normals
    dist_thresh: float = 0.10,
    angle_thresh_sin: float = math.sin(math.radians(20.0)),
    packed_prev: jnp.ndarray | None = None,  # (H*W,8) from pack_maps
) -> GNSystem:
    """One point-to-plane ICP normal-equation build at one pyramid level.

    vmap_curr may hold only a row-block of the frame (multi-chip row
    sharding); association bounds come from the full target maps.
    When packed_prev is given the association is a single row gather
    (vmap_prev/nmap_prev still provide the target shape).
    """
    H, W = vmap_prev.shape[1:]
    R = T_curr_to_prev[:3, :3]
    t = T_curr_to_prev[:3, 3]

    s = jnp.einsum("ij,jhw->ihw", R, vmap_curr) + t[:, None, None]  # (3,H,W)
    n_rot = jnp.einsum("ij,jhw->ihw", R, nmap_curr)

    # projective association into the previous frame (reduce.cu:211-232)
    z = jnp.maximum(s[2], 1e-6)
    u = s[0] / z * cam.fx + cam.cx
    v = s[1] / z * cam.fy + cam.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_img = (s[2] > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)

    if packed_prev is not None:
        rows = packed_prev[idx.reshape(-1)]  # (N,8) single row gather
        d = jnp.moveaxis(rows[:, 0:3], -1, 0).reshape(3, *idx.shape)
        n = jnp.moveaxis(rows[:, 3:6], -1, 0).reshape(3, *idx.shape)
    else:
        d = vmap_prev.reshape(3, -1)[:, idx.reshape(-1)].reshape(3, *idx.shape)
        n = nmap_prev.reshape(3, -1)[:, idx.reshape(-1)].reshape(3, *idx.shape)

    finite = (
        jnp.isfinite(vmap_curr).all(axis=0)
        & jnp.isfinite(d).all(axis=0)
        & jnp.isfinite(n).all(axis=0)
        & jnp.isfinite(n_rot).all(axis=0)
    )
    diff = d - s
    dist2 = jnp.sum(jnp.where(finite, diff * diff, 0.0), axis=0)
    cross = jnp.stack(
        [
            n_rot[1] * n[2] - n_rot[2] * n[1],
            n_rot[2] * n[0] - n_rot[0] * n[2],
            n_rot[0] * n[1] - n_rot[1] * n[0],
        ],
        axis=0,
    )
    sine = jnp.sqrt(jnp.sum(jnp.where(finite, cross * cross, 0.0), axis=0))
    mask = (
        in_img
        & finite
        & (dist2 < dist_thresh * dist_thresh)
        & (sine < angle_thresh_sin)
    )

    # rows a = [s x n, n], residual r = n . (d - s)   (reduce.cu:256-316)
    sxn = jnp.stack(
        [
            s[1] * n[2] - s[2] * n[1],
            s[2] * n[0] - s[0] * n[2],
            s[0] * n[1] - s[1] * n[0],
        ],
        axis=0,
    )
    a = jnp.concatenate([sxn, n], axis=0)  # (6,H,W)
    r = jnp.sum(n * diff, axis=0)  # (H,W)

    # NaN-poisoned rows must be zeroed with where (NaN * 0 == NaN)
    a = jnp.where(mask[None], a, 0.0).reshape(6, -1)
    r = jnp.where(mask, r, 0.0).reshape(-1)
    m = mask.astype(jnp.float32)
    A = jnp.einsum("in,jn->ij", a, a)
    b = jnp.einsum("in,n->i", a, r)
    return GNSystem(A=A, b=b, count=m.sum(), residual=jnp.sum(r * r))


def _cholesky_solve6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 6x6 Cholesky solve. XLA's general LU (jnp.linalg.solve)
    launches a full factorisation kernel costing ~0.5 ms per call on
    TPU — at 15+ GN iterations per frame that dominates odometry. The
    unrolled scalar form is a few hundred fused VPU ops."""
    n = 6
    L = [[jnp.float32(0.0)] * n for _ in range(n)]
    for i in range(n):
        s = A[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
        inv = 1.0 / L[i][i]
        for j in range(i + 1, n):
            s = A[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv
    # forward substitution L y = b
    y = [jnp.float32(0.0)] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [jnp.float32(0.0)] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def solve_gn(A: jnp.ndarray, b: jnp.ndarray, damping: float = 1e-6):
    """Damped 6x6 solve; returns (xi, ok). Stays on device (the
    reference round-trips to an Eigen LDLT on host, ICPOdometry.cpp:131)."""
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(A))), 1e-12)
    Ad = A + damping * scale * jnp.eye(6, dtype=A.dtype)
    xi = _cholesky_solve6(Ad, b)
    ok = jnp.isfinite(xi).all()
    return jnp.where(ok, xi, 0.0), ok


def prior_increment(T: jnp.ndarray, T_prior: jnp.ndarray) -> jnp.ndarray:
    """First-order se3 increment xi_p = log(T_prior @ T^-1) in the
    [omega, v] layout of the GN systems (exp_se3(xi_p) @ T ~= T_prior).
    Both transforms are within a frame's motion of each other, so the
    small-angle vee of the skew part is exact to O(theta^2)."""
    E = T_prior @ se3.inverse(T)
    w = 0.5 * jnp.stack(
        [E[2, 1] - E[1, 2], E[0, 2] - E[2, 0], E[1, 0] - E[0, 1]]
    )
    return jnp.concatenate([w, E[:3, 3]])


def add_motion_prior(
    A: jnp.ndarray,
    b: jnp.ndarray,
    T: jnp.ndarray,
    T_prior: jnp.ndarray,
    weight: float,
):
    """Tikhonov prior pulling the GN step toward T_prior (constant-
    velocity regularisation; no reference counterpart — the pivot-end
    rotation/lateral-slide ambiguity this fixes is below the noise
    floor of the reference's sensors-and-scenes regime).

    The prior strength is PER-BLOCK RELATIVE: lambda_rot/trans =
    weight * mean(diag of that 3x3 block), so a weight of 0.01 biases
    well-observed directions by ~1% while fully pinning near-null
    directions (data eigenvalue << block mean) to the prior — this is
    exactly the observability-selective behaviour wanted at the end of
    an in-place pivot, where rotation about y and lateral translation
    collapse into one flat cost valley for far-heavy depth and the
    solver otherwise picks a confident ~0.2 m/frame slide."""
    lam_r = weight * (A[0, 0] + A[1, 1] + A[2, 2]) / 3.0
    lam_t = weight * (A[3, 3] + A[4, 4] + A[5, 5]) / 3.0
    w6 = jnp.concatenate(
        [jnp.full((3,), lam_r, A.dtype), jnp.full((3,), lam_t, A.dtype)]
    )
    xi_p = prior_increment(T, T_prior)
    return A + jnp.diag(w6), b + w6 * xi_p


def icp_associate(
    cam: CameraIntrinsics,
    T_curr_to_prev: jnp.ndarray,
    vmap_curr: jnp.ndarray,  # (3,H,W)
    packed_prev: jnp.ndarray,  # (H*W,8) target rows from pack_maps
    target_hw: tuple,
):
    """Projective data association only (the gather half of icp_step).

    Returns frozen correspondence targets (d, n) as (3,h,w) plus the
    in-image mask. The gather is the expensive part of a GN iteration
    (~1 ms vs ~0.16 ms for the system build at 320x240 — measured), so
    the solver re-associates only every `reassoc_every` iterations and
    runs the cheap elementwise build in between."""
    H, W = target_hw
    R = T_curr_to_prev[:3, :3]
    t = T_curr_to_prev[:3, 3]
    s = jnp.einsum("ij,jhw->ihw", R, vmap_curr) + t[:, None, None]
    z = jnp.maximum(s[2], 1e-6)
    u = s[0] / z * cam.fx + cam.cx
    v = s[1] / z * cam.fy + cam.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_img = (s[2] > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
    rows = packed_prev[idx.reshape(-1)]  # (N,8) single row gather
    d = jnp.moveaxis(rows[:, 0:3], -1, 0).reshape(3, *idx.shape)
    n = jnp.moveaxis(rows[:, 3:6], -1, 0).reshape(3, *idx.shape)
    return d, n, in_img


def icp_build_from_assoc(
    T_curr_to_prev: jnp.ndarray,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    d: jnp.ndarray,
    n: jnp.ndarray,
    in_img: jnp.ndarray,
    dist_thresh: float,
    angle_thresh_sin: float,
) -> GNSystem:
    """GN normal-equation build on frozen correspondences — pure
    elementwise + one MXU reduction, no gathers. Same math and gating
    as icp_step (reduce.cu:211-316); only the association is stale by
    up to reassoc_every-1 sub-iterations."""
    R = T_curr_to_prev[:3, :3]
    t = T_curr_to_prev[:3, 3]
    s = jnp.einsum("ij,jhw->ihw", R, vmap_curr) + t[:, None, None]
    n_rot = jnp.einsum("ij,jhw->ihw", R, nmap_curr)
    finite = (
        jnp.isfinite(vmap_curr).all(axis=0)
        & jnp.isfinite(d).all(axis=0)
        & jnp.isfinite(n).all(axis=0)
        & jnp.isfinite(n_rot).all(axis=0)
    )
    diff = d - s
    dist2 = jnp.sum(jnp.where(finite, diff * diff, 0.0), axis=0)
    cross = jnp.stack(
        [
            n_rot[1] * n[2] - n_rot[2] * n[1],
            n_rot[2] * n[0] - n_rot[0] * n[2],
            n_rot[0] * n[1] - n_rot[1] * n[0],
        ],
        axis=0,
    )
    sine = jnp.sqrt(jnp.sum(jnp.where(finite, cross * cross, 0.0), axis=0))
    mask = (
        in_img
        & finite
        & (dist2 < dist_thresh * dist_thresh)
        & (sine < angle_thresh_sin)
    )
    sxn = jnp.stack(
        [
            s[1] * n[2] - s[2] * n[1],
            s[2] * n[0] - s[0] * n[2],
            s[0] * n[1] - s[1] * n[0],
        ],
        axis=0,
    )
    a = jnp.concatenate([sxn, n], axis=0)
    r = jnp.sum(n * diff, axis=0)
    a = jnp.where(mask[None], a, 0.0).reshape(6, -1)
    r = jnp.where(mask, r, 0.0).reshape(-1)
    A = jnp.einsum("in,jn->ij", a, a)
    b = jnp.einsum("in,n->i", a, r)
    return GNSystem(A=A, b=b, count=mask.sum().astype(jnp.float32),
                    residual=jnp.sum(r * r))


def icp_solve_level(
    cam: CameraIntrinsics,
    T_init: jnp.ndarray,
    vmap_curr,
    nmap_curr,
    vmap_prev,
    nmap_prev,
    iterations: int,
    dist_thresh: float = 0.10,
    angle_thresh_sin: float = math.sin(math.radians(20.0)),
    min_inliers: float = 30.0,
    axis_name: str | None = None,
    packed_prev: jnp.ndarray | None = None,
    reassoc_every: int = 1,
    T_prior: jnp.ndarray | None = None,
    prior_weight: float = 0.0,
):
    """Run `iterations` GN steps at one level (ICPOdometry.cpp:98-179).

    T_prior + prior_weight > 0 adds the constant-velocity motion prior
    (add_motion_prior) to every GN system before the solve.

    reassoc_every > 1 groups GN steps onto shared correspondences:
    association (the dominant gather) runs once per group, the
    elementwise build+solve every step. reassoc_every=1 reproduces the
    reference's per-iteration association exactly.

    Multi-chip: when axis_name is set, vmap_curr/nmap_curr hold only
    this device's pixel-row block (vmap_prev stays full) and the 6x6
    system is psum-reduced over the mesh axis before the replicated
    solve — the ICI analogue of the reference's single-GPU tree
    reduction (reduce.cu:89-184).
    """
    if iterations == 0:
        zero = jnp.float32(0.0)
        return T_init, zero, zero

    # prior_weight may be a TRACED scalar (tracker state field) so one
    # compiled program serves every weight; weight 0 adds exactly zero
    use_prior = T_prior is not None

    def _solve(A, b, T):
        if use_prior:
            A, b = add_motion_prior(A, b, T, T_prior, prior_weight)
        return solve_gn(A, b)

    if reassoc_every <= 1 or packed_prev is None:
        def body(_, carry):
            T, _, _ = carry
            sys = icp_step(
                cam, T, vmap_curr, nmap_curr, vmap_prev, nmap_prev,
                dist_thresh, angle_thresh_sin, packed_prev=packed_prev,
            )
            if axis_name is not None:
                sys = GNSystem(*[jax.lax.psum(x, axis_name) for x in sys])
            xi, ok = _solve(sys.A, sys.b, T)
            ok = ok & (sys.count >= min_inliers)
            T_new = se3.exp_se3(xi) @ T
            T = jnp.where(ok, T_new, T)
            return T, sys.count, sys.residual

        return jax.lax.fori_loop(
            0, iterations, body, (T_init, jnp.float32(0.0), jnp.float32(0.0))
        )

    H, W = vmap_prev.shape[1:]
    n_groups = -(-iterations // reassoc_every)

    def inner(_, carry):
        T, _, _, d, n, in_img = carry
        sys = icp_build_from_assoc(
            T, vmap_curr, nmap_curr, d, n, in_img,
            dist_thresh, angle_thresh_sin,
        )
        if axis_name is not None:
            sys = GNSystem(*[jax.lax.psum(x, axis_name) for x in sys])
        xi, ok = _solve(sys.A, sys.b, T)
        ok = ok & (sys.count >= min_inliers)
        T = jnp.where(ok, se3.exp_se3(xi) @ T, T)
        return T, sys.count, sys.residual, d, n, in_img

    def outer(_, carry):
        T, cnt, res = carry
        d, n, in_img = icp_associate(cam, T, vmap_curr, packed_prev, (H, W))
        T, cnt, res, *_ = jax.lax.fori_loop(
            0, reassoc_every, inner, (T, cnt, res, d, n, in_img)
        )
        return T, cnt, res

    return jax.lax.fori_loop(
        0, n_groups, outer, (T_init, jnp.float32(0.0), jnp.float32(0.0))
    )
