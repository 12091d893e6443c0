"""Native C++ cloud ops vs the numpy/scipy reference implementations."""

import numpy as np
import pytest

from kintinuous_tpu.backend import native_ops
from kintinuous_tpu.backend.slice_proc import estimate_normals, voxel_downsample

pytestmark = pytest.mark.skipif(
    not native_ops.available(), reason="libcloud_ops.so not built"
)


def _cloud(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    # two flat panels + noise: realistic slice content
    a = rng.uniform([0, 0, 1.0], [1.0, 1.0, 1.002], (n // 2, 3))
    b = rng.uniform([0, 0, 0.0], [1.0, 0.002, 1.0], (n - n // 2, 3))
    return np.concatenate([a, b]).astype(np.float32)


def test_native_downsample_matches_numpy():
    pts = _cloud()
    cols = (np.abs(pts) * 80).astype(np.uint8)
    wgts = np.linspace(1, 9, len(pts)).astype(np.float32)
    leaf = 0.05
    p_n, c_n, w_n = native_ops.voxel_downsample(pts, cols, wgts, leaf)
    p_r, c_r, w_r = voxel_downsample(pts, cols, wgts, leaf)
    assert len(p_n) == len(p_r)
    # same cell set: compare sorted by quantized cell key
    def order(p):
        k = np.floor(p / leaf).astype(np.int64)
        key = (k[:, 0] + 2**20) * 4**21 + (k[:, 1] + 2**20) * 2**21 + k[:, 2]
        return np.argsort(key)
    on, orr = order(p_n), order(p_r)
    np.testing.assert_allclose(p_n[on], p_r[orr], atol=1e-5)
    np.testing.assert_allclose(w_n[on], w_r[orr], atol=1e-4)
    assert (np.abs(c_n[on].astype(int) - c_r[orr].astype(int)) <= 1).all()


def test_native_normals_agree_with_scipy():
    pts = _cloud(3000)
    p, _, _ = voxel_downsample(pts, None, None, 0.03)
    vp = np.array([0.5, 0.5, -1.0], np.float32)
    n_native = native_ops.estimate_normals(p, k=20, cell=0.06, viewpoint=vp)
    n_ref = estimate_normals(p, k=20, viewpoint=vp)
    # approximate kNN -> allow small angular deviation; both oriented
    dots = np.sum(n_native * n_ref, axis=1)
    assert np.median(dots) > 0.99
    assert (dots > 0.9).mean() > 0.95
