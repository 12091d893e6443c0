import numpy as np
import jax.numpy as jnp

from kintinuous_tpu.config import CameraIntrinsics
from kintinuous_tpu.ops import preprocess as pp
from kintinuous_tpu.ops import maps


def test_bilateral_preserves_flat_and_edges():
    # two flat regions separated by a step of 500mm
    d = np.full((32, 32), 1000.0, np.float32)
    d[:, 16:] = 1500.0
    out = np.array(pp.bilateral_filter(jnp.array(d), radius=3))
    # flat interiors unchanged
    np.testing.assert_allclose(out[10, 5], 1000.0, atol=1.0)
    np.testing.assert_allclose(out[10, 28], 1500.0, atol=1.0)
    # edge not smeared across (sigma_depth=30mm << 500mm step)
    assert abs(out[10, 15] - 1000.0) < 5.0
    assert abs(out[10, 16] - 1500.0) < 5.0


def test_bilateral_smooths_noise():
    rng = np.random.default_rng(0)
    d = 1000.0 + rng.normal(0, 10, (32, 32)).astype(np.float32)
    out = np.array(pp.bilateral_filter(jnp.array(d), radius=3))
    assert out[4:-4, 4:-4].std() < d[4:-4, 4:-4].std() * 0.5


def test_bilateral_invalid_stays_invalid():
    d = np.full((16, 16), 1000.0, np.float32)
    d[8, 8] = 0.0
    out = np.array(pp.bilateral_filter(jnp.array(d), radius=2))
    assert out[8, 8] == 0.0
    assert out[0, 0] > 0


def test_pyr_down_depth_rejects_discontinuity():
    d = np.full((16, 16), 1000.0, np.float32)
    d[:, 8:] = 3000.0
    out = np.array(pp.pyr_down_depth(jnp.array(d), sigma=90.0))
    assert out.shape == (8, 8)
    # downsampled values stay on their side of the edge
    assert abs(out[4, 2] - 1000.0) < 1.0
    assert abs(out[4, 6] - 3000.0) < 1.0


def test_pyr_down_gauss_constant():
    img = np.full((16, 16), 7.0, np.float32)
    out = np.array(pp.pyr_down_gauss(jnp.array(img)))
    assert out.shape == (8, 8)
    # interior unaffected by zero-padding
    np.testing.assert_allclose(out[2:-2, 2:-2], 7.0, atol=1e-5)


def test_depth_to_metres_cutoff():
    d = jnp.array([[0.0, 500.0, 7000.0]], dtype=jnp.float32)
    out = np.array(pp.depth_to_metres(d, max_depth_m=6.0))
    np.testing.assert_allclose(out, [[0.0, 0.5, 0.0]], atol=1e-6)


def test_intensity_and_sobel():
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:, 4:] = 255
    lum = np.array(pp.rgb_to_intensity(jnp.array(rgb)))
    np.testing.assert_allclose(lum[0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(lum[0, 7], 255.0, atol=1e-3)
    gx, gy = pp.sobel_gradients(jnp.array(lum))
    gx, gy = np.array(gx), np.array(gy)
    assert gx[4, 3] > 50  # vertical edge has x-gradient
    assert abs(gy[4, 3]) < 1e-3


def test_discontinuity_mask():
    d = np.full((16, 16), 1.0, np.float32)
    d[:, 8:] = 2.0
    m = np.array(pp.depth_discontinuity_mask(jnp.array(d), radius=3, jump_m=0.2))
    assert m[8, 8]  # near the edge
    assert not m[8, 1]  # far from the edge


CAM = CameraIntrinsics(fx=50.0, fy=50.0, cx=16.0, cy=12.0, width=32, height=24)


def test_vmap_nmap_plane():
    # fronto-parallel plane at z=2: all normals ~ (0,0,-1) (towards camera)
    depth = jnp.full((24, 32), 2.0, dtype=jnp.float32)
    v = maps.create_vmap(CAM, depth)
    assert v.shape == (3, 24, 32)
    np.testing.assert_allclose(np.array(v[2]), 2.0, atol=1e-6)
    # center pixel maps to (0,0,2)
    np.testing.assert_allclose(np.array(v[:, 12, 16]), [0, 0, 2], atol=1e-6)
    n = np.array(maps.create_nmap(v))
    interior = n[:, 5:-5, 5:-5]
    nz = interior[2]
    assert np.nanmean(np.abs(nz)) > 0.99  # unit z normals


def test_nmap_tilted_plane():
    # plane z = 2 + 0.2*x -> normal proportional to (-0.2, 0, 1) direction
    H, W = 24, 32
    u = np.arange(W)[None, :].repeat(H, 0)
    v_ = np.arange(H)[:, None].repeat(W, 1)
    # z s.t. x = (u-cx)/fx*z and z = 2 + 0.2x -> z = 2/(1-0.2*(u-cx)/fx)
    z = 2.0 / (1.0 - 0.2 * (u - CAM.cx) / CAM.fx)
    vmap = maps.create_vmap(CAM, jnp.array(z, dtype=jnp.float32))
    n = np.array(maps.create_nmap(vmap))
    mid = n[:, 12, 16]
    expect = np.array([0.2, 0.0, -1.0])
    expect /= np.linalg.norm(expect)
    assert abs(abs(np.dot(mid, expect)) - 1.0) < 1e-3


def test_transform_maps_roundtrip():
    from kintinuous_tpu.geometry import se3

    depth = jnp.full((24, 32), 2.0, dtype=jnp.float32)
    v = maps.create_vmap(CAM, depth)
    n = maps.create_nmap(v)
    T = se3.exp_se3(jnp.array([0.1, -0.2, 0.3, 0.5, 0.1, -0.4], dtype=jnp.float32))
    v2, n2 = maps.transform_maps(v, n, T)
    v3, n3 = maps.transform_maps(v2, n2, se3.inverse(T))
    np.testing.assert_allclose(np.array(v3), np.array(v), atol=1e-4)
    mask = np.isfinite(np.array(n))
    np.testing.assert_allclose(np.array(n3)[mask], np.array(n)[mask], atol=1e-4)


def test_resize_maps():
    depth = jnp.full((24, 32), 2.0, dtype=jnp.float32)
    v = maps.create_vmap(CAM, depth)
    vh = maps.resize_vmap(v)
    assert vh.shape == (3, 12, 16)
    np.testing.assert_allclose(np.array(vh[2]), 2.0, atol=1e-6)
    n = maps.create_nmap(v)
    nh = np.array(maps.resize_nmap(n))
    norms = np.linalg.norm(nh[:, 2:-2, 2:-2], axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
