"""Two-level (row) compaction vs the flat reference path.

extract_points switches to _compact_two_level for domains >= 1M voxels
(shift bands, FINAL fetch); these tests pin that both paths produce
byte-identical results — same points, same ORDER, same capacity-drop
semantics — and that the dense-row fallback (lax.cond) path is lossless.
"""

import numpy as np
import jax.numpy as jnp

from kintinuous_tpu.ops.extract import _compact_flat, _compact_two_level


def _mk(mask_np):
    shape = mask_np.shape
    rng = np.random.default_rng(1)
    planes = tuple(
        jnp.asarray(rng.random(shape).astype(np.float32)) for _ in range(7)
    )
    return jnp.asarray(mask_np), planes


def _run_both(mask_np, cap):
    mask, planes = _mk(mask_np)
    n = int(np.prod(mask_np.shape))
    a = _compact_flat(mask, planes, n, cap)
    b = _compact_two_level(mask, planes, n, cap)
    return a, b


def assert_same(a, b):
    assert int(a.count) == int(b.count)
    np.testing.assert_array_equal(np.asarray(a.vals), np.asarray(b.vals))


def test_sparse_band_matches_flat():
    rng = np.random.default_rng(0)
    shape = (8, 1024, 128)  # 1M, n % 128 == 0
    mask = np.zeros(shape, bool)
    # ~2% of rows active, a few crossings each (typical shift band)
    rows = mask.reshape(-1, 128)
    act = rng.choice(rows.shape[0], size=rows.shape[0] // 50, replace=False)
    for r in act:
        rows[r, rng.integers(0, 128, size=3)] = True
    a, b = _run_both(mask, cap=20_000)
    assert int(a.count) > 100
    assert_same(a, b)


def test_dense_rows_trigger_fallback_lossless():
    """Every row active (surface parallel to rows) — n_act > row_cap,
    the cond must take the flat branch and lose nothing."""
    shape = (8, 1024, 128)
    mask = np.zeros(shape, bool)
    mask.reshape(-1, 128)[:, 5] = True  # all 8192 rows active; row_cap=2048
    a, b = _run_both(mask, cap=10_000)
    assert int(a.count) == 8 * 1024
    assert_same(a, b)


def test_capacity_overflow_keeps_first_in_order():
    rng = np.random.default_rng(3)
    shape = (8, 1024, 128)
    mask = rng.random(shape) < 0.01  # ~10k crossings, cap 4k
    a, b = _run_both(mask, cap=4096)
    assert int(a.count) == 4096
    assert_same(a, b)


def test_empty_band():
    mask = np.zeros((8, 1024, 128), bool)
    a, b = _run_both(mask, cap=1000)
    assert int(a.count) == int(b.count) == 0
    assert_same(a, b)
