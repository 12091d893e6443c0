#!/usr/bin/env python
"""Prototype cost model for a Pallas integrate kernel.

Measures, at realistic scale (grid=8192 band blocks):
  1. per-step overhead of a scalar-prefetch grid with per-row BlockSpec
     index maps (read row -> write row identity), rows viewed (N,4,128);
  2. + manual patch DMA (112x256 x2ch + 56x128 x3ch bf16) per step;
  3. + one-hot MXU contraction + row-select per step (4 sublane chunks);
  4. whether a dynamic grid size (traced n) compiles.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROWS = 32768 + 8
K = 8192
PH, PW = 112, 256
PH2, PW2 = 56, 384


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:50s} {dt:8.2f} ms")
    return out


def make_inputs():
    key = jax.random.PRNGKey(0)
    tsdf = jax.random.normal(key, (N_ROWS, 4, 128), jnp.float32)
    ids = jnp.asarray(
        np.random.RandomState(0).choice(N_ROWS - 1, K, False).astype(np.int32))
    corners = (
        jnp.asarray((np.random.RandomState(1).randint(0, 480 - PH, K)
                     // 16 * 16).astype(np.int32)),
        jnp.asarray((np.random.RandomState(2).randint(0, 4, K)
                     * 128).astype(np.int32)),
    )
    img = jax.random.normal(key, (2, 480, 640), jnp.bfloat16)
    img2 = jax.random.normal(key, (3, 240, 384), jnp.bfloat16)
    return tsdf, ids, corners, img, img2


# ---- level 1: row in -> row out ------------------------------------------
def k_rows(ids_ref, row_in, row_out):
    row_out[:] = row_in[:] + 1.0


def run_rows(tsdf, ids):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda i, ids: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 128), lambda i, ids: (ids[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        k_rows,
        out_shape=jax.ShapeDtypeStruct((N_ROWS, 4, 128), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
    )(ids, tsdf)


# ---- level 2: + patch DMAs ------------------------------------------------
def k_dma(ids_ref, cy_ref, cx_ref, img_hbm, img2_hbm, row_in, row_out,
          patch, patch2, sem):
    i = pl.program_id(0)
    y0 = pl.multiple_of(cy_ref[i], 16)
    x0 = pl.multiple_of(cx_ref[i], 128)
    d1 = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(y0, PH), pl.ds(x0, PW)], patch, sem.at[0])
    y0h = pl.multiple_of(y0 // 2, 8)
    d2 = pltpu.make_async_copy(
        img2_hbm.at[:, pl.ds(y0h, PH2), :], patch2, sem.at[1])
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()
    row_out[:] = row_in[:] + patch[0:1, 0:4, 0:128].astype(jnp.float32)


def _specs_full():
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 4, 128), lambda i, ids, cy, cx: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 128), lambda i, ids, cy, cx: (ids[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, PH, PW), jnp.bfloat16),
            pltpu.VMEM((3, PH2, PW2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def run_dma(tsdf, ids, corners, img, img2):
    return pl.pallas_call(
        k_dma,
        out_shape=jax.ShapeDtypeStruct((N_ROWS, 4, 128), jnp.float32),
        grid_spec=_specs_full(),
        input_output_aliases={5: 0},
    )(ids, corners[0], corners[1], img, img2, tsdf)


# ---- level 3: + one-hot contraction ---------------------------------------
def k_full(ids_ref, cy_ref, cx_ref, img_hbm, img2_hbm, row_in, row_out,
           patch, patch2, sem):
    i = pl.program_id(0)
    y0 = pl.multiple_of(cy_ref[i], 16)
    x0 = pl.multiple_of(cx_ref[i], 128)
    d1 = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(y0, PH), pl.ds(x0, PW)], patch, sem.at[0])
    y0h = pl.multiple_of(y0 // 2, 8)
    d2 = pltpu.make_async_copy(
        img2_hbm.at[:, pl.ds(y0h, PH2), :], patch2, sem.at[1])
    d1.start()
    d2.start()

    t = row_in[0]  # (4,128)
    # fake data-dependent projections
    u = jnp.clip(jnp.abs(t) * 100.0, 0, PW - 1).astype(jnp.int32)  # (4,128)
    v = jnp.clip(jnp.abs(t) * 70.0, 0, PH - 1).astype(jnp.int32)

    d1.wait()
    P = patch[:].reshape(2 * PH, PW)
    d2.wait()
    P2 = patch2[:].reshape(3 * PH2, PW2)

    iota_pw = jax.lax.broadcasted_iota(jnp.int32, (PW, 128), 0)
    iota_ph = jax.lax.broadcasted_iota(jnp.int32, (2 * PH, 128), 0)
    iota_pw2 = jax.lax.broadcasted_iota(jnp.int32, (PW2, 128), 0)
    iota_ph2 = jax.lax.broadcasted_iota(jnp.int32, (3 * PH2, 128), 0)

    acc = jnp.zeros((4, 128), jnp.float32)
    accc = jnp.zeros((4, 128), jnp.float32)
    outs = []
    for s in range(4):
        us = u[s : s + 1]  # (1,128)
        vs = v[s : s + 1]
        Wc = jnp.where(iota_pw == us, 1.0, 0.0).astype(jnp.bfloat16)
        D = jax.lax.dot_general(
            P, Wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (2PH,128)
        sel = (iota_ph == vs) | (iota_ph == vs + PH)
        rays = jnp.sum(jnp.where(sel, D, 0.0), axis=0, keepdims=True)

        Wc2 = jnp.where(iota_pw2 == us // 2, 1.0, 0.0).astype(jnp.bfloat16)
        D2 = jax.lax.dot_general(
            P2, Wc2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (3PH2,128)
        m2 = (iota_ph2 % PH2) == (vs // 2)
        rgb = jnp.sum(jnp.where(m2, D2, 0.0), axis=0, keepdims=True)
        outs.append(rays + rgb)
    sel_out = jnp.concatenate(outs, axis=0)  # (4,128)
    row_out[0] = t * 0.5 + sel_out * 0.5


def run_full(tsdf, ids, corners, img, img2):
    return pl.pallas_call(
        k_full,
        out_shape=jax.ShapeDtypeStruct((N_ROWS, 4, 128), jnp.float32),
        grid_spec=_specs_full(),
        input_output_aliases={5: 0},
    )(ids, corners[0], corners[1], img, img2, tsdf)


def main():
    tsdf, ids, corners, img, img2 = make_inputs()
    timeit("rows only (grid 8192, row blockspec)", jax.jit(run_rows),
           tsdf, ids)
    timeit("rows + patch DMA", jax.jit(run_dma), tsdf, ids, corners,
           img, img2)
    timeit("rows + DMA + one-hot contraction", jax.jit(run_full),
           tsdf, ids, corners, img, img2)

    # dynamic grid probe
    try:
        def run_dyn(n, tsdf, ids):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n,),
                in_specs=[
                    pl.BlockSpec((1, 4, 128), lambda i, ids: (ids[i], 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, 4, 128), lambda i, ids: (ids[i], 0, 0),
                    memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                k_rows,
                out_shape=jax.ShapeDtypeStruct((N_ROWS, 4, 128), jnp.float32),
                grid_spec=grid_spec,
                input_output_aliases={1: 0},
            )(ids, tsdf)

        f = jax.jit(run_dyn)
        out = jax.block_until_ready(f(jnp.int32(100), tsdf, ids))
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(jnp.int32(5057), tsdf, ids)
        jax.block_until_ready(out)
        print(f"{'dynamic grid rows (n=5057)':50s} "
              f"{(time.perf_counter()-t0)/20*1e3:8.2f} ms")
    except Exception as e:
        print("dynamic grid NOT supported:", repr(e)[:300])


if __name__ == "__main__":
    main()
