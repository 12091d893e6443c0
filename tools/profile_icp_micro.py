#!/usr/bin/env python
"""Per-GN-iteration cost decomposition: gather vs system build vs solve."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.geometry import se3
from kintinuous_tpu.io.synth import Scene, orbit_trajectory, render_frame
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops.reduce import (
    GNSystem, _cholesky_solve6, icp_step, pack_maps, solve_gn,
)
from kintinuous_tpu.tracking.odometry import build_map_pyramid

ITERS = 10


def timeit(name, fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:52s} {dt:8.3f} ms ({dt/ITERS*1000:6.1f} us/iter)")
    return dt


def main():
    cfg = KintinuousConfig(fast_mode=True)
    cam = cfg.camera.at_level(1)
    poses = orbit_trajectory(3, radius=0.06, angle_deg=3.0)
    d0, _ = render_frame(Scene.default(), cfg.camera, poses[0])
    depth_m = pp.depth_to_metres(jnp.asarray(np.asarray(d0, np.float32)) , 6.0)
    depth_half = pp.pyr_down_depth(depth_m, sigma=0.09)
    pyr = build_map_pyramid(cam, depth_half, 1)
    vc, nc = pyr[0]
    packed = pack_maps(vc, nc)

    def loop(body):
        def f(T0):
            def b(_, T):
                return body(T)
            return jax.lax.fori_loop(0, ITERS, b, T0)
        return jax.jit(f)

    T0 = jnp.eye(4, dtype=jnp.float32)

    # full iteration
    def full(T):
        sys_ = icp_step(cam, T, vc, nc, vc, nc, packed_prev=packed)
        xi, ok = solve_gn(sys_.A, sys_.b)
        return jnp.where(ok, se3.exp_se3(xi) @ T, T)

    timeit("full GN iteration x10", loop(full), T0)

    # no solve: xi from b directly
    def nosolve(T):
        sys_ = icp_step(cam, T, vc, nc, vc, nc, packed_prev=packed)
        xi = sys_.b * 1e-9
        return se3.exp_se3(xi) @ T

    timeit("- no 6x6 solve", loop(nosolve), T0)

    # no exp: T update via linear add
    def noexp(T):
        sys_ = icp_step(cam, T, vc, nc, vc, nc, packed_prev=packed)
        xi, ok = solve_gn(sys_.A, sys_.b)
        return T + xi[0] * 1e-9

    timeit("- no exp_se3", loop(noexp), T0)

    # system build only, no assoc gather (use same-pixel rows)
    def nogather(T):
        R = T[:3, :3]
        t = T[:3, 3]
        s = jnp.einsum("ij,jhw->ihw", R, vc) + t[:, None, None]
        n = nc
        d = vc
        diff = d - s
        sxn = jnp.stack([
            s[1] * n[2] - s[2] * n[1],
            s[2] * n[0] - s[0] * n[2],
            s[0] * n[1] - s[1] * n[0]], 0)
        a = jnp.concatenate([sxn, n], axis=0)
        mask = jnp.isfinite(a).all(0) & jnp.isfinite(diff).all(0)
        a = jnp.where(mask[None], a, 0.0).reshape(6, -1)
        r = jnp.where(mask, jnp.sum(n * diff, 0), 0.0).reshape(-1)
        A = jnp.einsum("in,jn->ij", a, a)
        b = jnp.einsum("in,n->i", a, r)
        xi, ok = solve_gn(A, b)
        return jnp.where(ok, se3.exp_se3(xi) @ T, T)

    timeit("- no assoc gather (same-pixel)", loop(nogather), T0)

    # solve chain alone
    A0 = jnp.eye(6, dtype=jnp.float32) * 100.0
    b0 = jnp.ones(6, jnp.float32)

    def solveonly(T):
        xi, ok = solve_gn(A0 + T[0, 0], b0)
        return T + xi[0] * 1e-9

    timeit("solve_gn chain alone x10", loop(solveonly), T0)

    def exponly(T):
        return se3.exp_se3(b0 * (1e-9 * T[0, 0])) @ T

    timeit("exp_se3 chain alone x10", loop(exponly), T0)


if __name__ == "__main__":
    main()
