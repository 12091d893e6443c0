"""SE(3) pose-graph optimisation (JAX).

Replaces the reference's iSAM dependency (src/backend/iSAMInterface.{h,cpp}):
  add_odometry   <- addCameraCameraConstraint (:44-83, cov 1e-3 I)
  add_loop       <- addLoopConstraint (:85-105)
  optimise       <- iSAM batch + chi2 (:136-140)
  remove_loop    <- removeFactor for rejected loops (:164-167)
  poses/chi2     <- pose getters (:147-189)

TPU-native design: instead of a sparse direct solver, Gauss-Newton with
matrix-free conjugate gradient on the normal equations — every
factor-level operation (residuals, J products, JtJ diagonal blocks) is
vmapped over the factor arrays, and per-node accumulation is a
segment-sum. Factor arrays are padded to bucket sizes so recompiles are
rare. Works identically on CPU/TPU and scales to tens of thousands of
factors without host round-trips inside one optimise() call.

Conventions: node poses T_i map camera->world. A factor (i, j, Z)
states Z ~= T_i^-1 T_j (j expressed in i's frame). Right-perturbation
Jacobians with the Jr^-1 ~= I + ad(r)/2 approximation.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.geometry import se3


def _ad(xi):
    """adjoint of a twist [w,v]: [[w^,0],[v^,w^]] (6,6)."""
    w = se3.hat(xi[..., :3])
    v = se3.hat(xi[..., 3:])
    top = jnp.concatenate([w, jnp.zeros_like(w)], axis=-1)
    bot = jnp.concatenate([v, w], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _Ad(T):
    """Adjoint of a pose for twist order [w,v]: [[R,0],[t^R,R]]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = se3.hat(t) @ R
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _factor_system(poses, fi, fj, fZinv, fw):
    """Per-factor residual r and Jacobians (Ji, Jj) wrt right increments.

    poses: (N,4,4); fi/fj: (F,) node ids; fZinv: (F,4,4) = Z^-1;
    fw: (F,) scalar weights (0 = disabled/padding).
    """
    Ti = poses[fi]
    Tj = poses[fj]
    Tij = se3.inverse(Ti) @ Tj
    E = fZinv @ Tij
    r = se3.log_se3(E)  # (F,6)
    Jrinv = jnp.eye(6) + 0.5 * _ad(r)
    Jj = Jrinv
    Ji = -Jrinv @ _Ad(se3.inverse(Tij))
    return r, Ji, Jj


def gn_core(poses, fi, fj, fZinv, fw, iters: int, axis_name: str | None = None,
            fl=None, huber_delta: float = 0.0):
    """Gauss-Newton with block-Jacobi-preconditioned CG on the normal
    equations, matrix-free over factor arrays.

    axis_name: when set, the factor arrays hold only this device's
    shard and every factor-product reduction (gradient, JtJ matvec,
    preconditioner diagonal, chi2) is psum'd over the mesh axis — the
    multi-host distributed pose-graph solve (SURVEY.md §7 stage 6); the
    replicated CG iteration then proceeds identically on every host.

    fl (loop-factor mask) + huber_delta > 0 robustifies LOOP factors
    with a Huber kernel via IRLS: a loop residual above huber_delta (in
    se3-log units, ~metres) is re-weighted by delta/|r| each GN round,
    and its chi2 contribution grows linearly (w*delta*(2|r|-delta))
    instead of quadratically. Odometry factors stay quadratic. This
    keeps a GENUINE loop after long drift from buying an unbounded
    delta-chi2 at the default gate (the correction's cost concentrates
    in the loop factor while the odometry chain bends smoothly), while
    an aliased false match — geometrically inconsistent with the
    odometry chain — still pays a large quadratic penalty through the
    bent odometry factors (VERDICT r4 next-round #6; reference role
    iSAMInterface.cpp:136-140 + Deformation.cpp:256,336-343 with no
    robust kernel)."""
    N = poses.shape[0]
    robust = fl is not None and huber_delta > 0.0

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def _eff_weight(r):
        """IRLS weights + robust chi2 contributions per factor."""
        rn2 = jnp.sum(r * r, axis=-1)
        if not robust:
            return fw, fw * rn2
        rn = jnp.sqrt(jnp.maximum(rn2, 1e-24))
        tail = (fl > 0) & (rn > huber_delta)
        w_eff = jnp.where(tail, fw * huber_delta / rn, fw)
        cost = jnp.where(
            tail, fw * huber_delta * (2.0 * rn - huber_delta), fw * rn2
        )
        return w_eff, cost

    def energy_and_step(poses):
        r, Ji, Jj = _factor_system(poses, fi, fj, fZinv, fw)
        fw_eff, cost = _eff_weight(r)

        def matvec(x):
            # x: (N,6) -> (J^T W J + lam D) x
            u = jnp.einsum("fab,fb->fa", Ji, x[fi]) + jnp.einsum(
                "fab,fb->fa", Jj, x[fj]
            )
            u = u * fw_eff[:, None]
            out = jnp.zeros_like(x)
            out = out.at[fi].add(jnp.einsum("fba,fb->fa", Ji, u))
            out = out.at[fj].add(jnp.einsum("fba,fb->fa", Jj, u))
            out = _psum(out)
            # gauge prior on node 0 (replicated, applied once post-psum)
            out = out.at[0].add(1e6 * x[0])
            return out + 1e-6 * x

        # gradient b = -J^T W r
        wr = r * fw_eff[:, None]
        b = jnp.zeros((N, 6), poses.dtype)
        b = b.at[fi].add(-jnp.einsum("fba,fb->fa", Ji, wr))
        b = b.at[fj].add(-jnp.einsum("fba,fb->fa", Jj, wr))
        b = _psum(b)

        # block-Jacobi preconditioner
        diag = jnp.zeros((N, 6, 6), poses.dtype)
        diag = diag.at[fi].add(
            jnp.einsum("fba,f,fbc->fac", Ji, fw_eff, Ji)
        )
        diag = diag.at[fj].add(
            jnp.einsum("fba,f,fbc->fac", Jj, fw_eff, Jj)
        )
        diag = _psum(diag)
        diag = diag.at[0].add(1e6 * jnp.eye(6))
        diag = diag + 1e-6 * jnp.eye(6)
        Minv = jnp.linalg.inv(diag)

        def precond(x):
            return jnp.einsum("nab,nb->na", Minv, x)

        # preconditioned CG
        def cg_body(carry, _):
            x, rr, p, rz = carry
            Ap = matvec(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.vdot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return (x, rr, p, rz_new), None

        x0 = jnp.zeros((N, 6), poses.dtype)
        z0 = precond(b)
        (dx, *_), _ = jax.lax.scan(
            cg_body, (x0, b, z0, jnp.vdot(b, z0)), None, length=50
        )
        chi2 = _psum(jnp.sum(cost))
        return dx, chi2

    def body(_, carry):
        poses, _ = carry
        dx, chi2 = energy_and_step(poses)
        poses = poses @ se3.exp_se3(dx)
        return poses, chi2

    poses, chi2 = jax.lax.fori_loop(
        0, iters, body, (poses, jnp.float32(0.0))
    )
    # final chi2 after the last update (robust cost when enabled, so the
    # delta-chi2 gate sees the same bounded growth the solver optimised)
    r, _, _ = _factor_system(poses, fi, fj, fZinv, fw)
    _, cost = _eff_weight(r)
    chi2 = _psum(jnp.sum(cost))
    return poses, chi2


class PoseGraph:
    """Host-facing pose graph with a jitted GN/CG core."""

    def __init__(
        self,
        odo_weight: float = 1.0 / 1e-3,  # information ~ 1/cov (iSAMInterface:44-83)
        loop_weight: float = 1.0 / 1e-3,
        prior_weight: float = 1e6,
        huber_delta: float = 0.1,  # Huber kernel on LOOP factors (m); 0 = off
    ):
        self.huber_delta = float(huber_delta)
        self.times: List[int] = []
        self.poses: List[np.ndarray] = []  # (4,4) camera->world
        self._fi: List[int] = []
        self._fj: List[int] = []
        self._fZ: List[np.ndarray] = []
        self._fw: List[float] = []
        self._floop: List[bool] = []
        self.odo_weight = odo_weight
        self.loop_weight = loop_weight
        self.prior_weight = prior_weight
        self._time_to_id = {}

    # ------------------------------------------------------------- build
    def add_node(self, time: int, pose: np.ndarray) -> int:
        nid = len(self.poses)
        self.times.append(int(time))
        self.poses.append(np.asarray(pose, np.float64).copy())
        self._time_to_id[int(time)] = nid
        return nid

    def node_id(self, time: int) -> Optional[int]:
        return self._time_to_id.get(int(time))

    def add_odometry(self, time1: int, time2: int, T12: np.ndarray):
        """Consecutive-camera factor; creates missing nodes by chaining
        (reference addCameraCameraConstraint)."""
        i = self.node_id(time1)
        if i is None:
            i = self.add_node(time1, np.eye(4))
        j = self.node_id(time2)
        if j is None:
            j = self.add_node(time2, self.poses[i] @ T12)
        self._fi.append(i)
        self._fj.append(j)
        self._fZ.append(np.asarray(T12, np.float64))
        self._fw.append(self.odo_weight)
        self._floop.append(False)
        return i, j

    def add_loop(self, time1: int, time2: int, T12: np.ndarray) -> int:
        i = self.node_id(time1)
        j = self.node_id(time2)
        assert i is not None and j is not None, "loop endpoints must exist"
        self._fi.append(i)
        self._fj.append(j)
        self._fZ.append(np.asarray(T12, np.float64))
        self._fw.append(self.loop_weight)
        self._floop.append(True)
        return len(self._fw) - 1

    def remove_factor(self, fid: int):
        """Disable a factor (reference removeFactor, iSAMInterface:164-167)."""
        self._fw[fid] = 0.0

    # ---------------------------------------------------------- optimise
    @staticmethod
    @partial(jax.jit, static_argnums=(6, 7))
    def _gn(poses, fi, fj, fZinv, fw, fl, iters: int, huber_delta: float):
        return gn_core(poses, fi, fj, fZinv, fw, iters, fl=fl,
                       huber_delta=huber_delta)

    @staticmethod
    def _bucket(n: int) -> int:
        b = 16
        while b < n:
            b *= 2
        return b

    def chi2(self) -> float:
        """Total chi2 at the CURRENT poses, no optimisation — the
        baseline for the delta-chi2 loop gate (deform_runner gates on
        chi2_after_optimise - chi2_before, which is invariant to how
        much residual the graph already carries from sensor noise;
        gating on the absolute total, as round 3 did, forced a
        per-scenario threshold). Pose state is untouched (optimise's
        f32 round-trip would erode the f64 poses)."""
        if not self._fw:
            return 0.0
        _, chi2 = self._gn(*self._packed(), 0, self.huber_delta)
        return float(chi2)

    def _packed(self):
        """Factor arrays padded to the bucket size, as jax arrays."""
        N = len(self.poses)
        F = len(self._fw)
        FB = self._bucket(F)
        fi = np.zeros(FB, np.int32)
        fj = np.zeros(FB, np.int32)
        fZ = np.tile(np.eye(4, dtype=np.float32), (FB, 1, 1))
        fw = np.zeros(FB, np.float32)
        fl = np.zeros(FB, np.float32)
        fi[:F] = self._fi
        fj[:F] = self._fj
        fZ[:F] = np.array(self._fZ, np.float32)
        fw[:F] = self._fw
        fl[:F] = np.array(self._floop, np.float32)
        poses = jnp.asarray(np.array(self.poses, np.float32))
        fZinv = jnp.asarray(np.linalg.inv(fZ).astype(np.float32))
        return (poses, jnp.asarray(fi), jnp.asarray(fj), fZinv,
                jnp.asarray(fw), jnp.asarray(fl))

    def optimise(self, iters: int = 10) -> float:
        """Batch GN; updates node poses in place; returns TOTAL chi2 —
        the reference's `_slam->chi2()` (iSAMInterface.cpp:136-140),
        gated at isam_thresh=10 by Deformation.cpp:256.

        Gate calibration (tests/test_pose_graph.py): with the default
        information weight 1e3 (cov 1e-3, iSAMInterface.cpp:44-83) on a
        200-node corridor graph, a drift-consistent loop leaves total
        chi2 ~0.1-3, a grossly wrong loop (>=1 m / 30 deg — the aliased-
        place false positives the gate exists for) drives it past 10.
        Small loop errors (~5 cm) produce chi2 ~1 and are accepted —
        indistinguishable from genuine drift absorption at this scale;
        rejecting those is the PR verification ICP's job
        (PlaceRecognition.cpp:191-196), identical to the reference.
        An earlier build divided by the active-factor count, which made
        the default gate ~10^3 too loose (never rejecting anything)."""
        if not self._fw:
            return 0.0
        out, chi2 = self._gn(*self._packed(), iters, self.huber_delta)
        out = np.asarray(out, np.float64)
        for k in range(len(self.poses)):
            self.poses[k] = out[k]
        return float(chi2)

    def get_pose(self, time: int) -> np.ndarray:
        return self.poses[self._time_to_id[int(time)]]

    @property
    def n_loops(self) -> int:
        return sum(1 for l, w in zip(self._floop, self._fw) if l and w > 0)
