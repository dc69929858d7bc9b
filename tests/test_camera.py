"""Camera geometry: projection round-trips, undistortion, device ray path."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import camera as cam


def _make_camera(distorted=True):
  return cam.Camera(
      orientation=np.asarray([[0.0, 1.0, 0.0],
                              [-1.0, 0.0, 0.0],
                              [0.0, 0.0, 1.0]]),
      position=np.asarray([0.5, -0.2, 1.3]),
      focal_length=520.0,
      principal_point=np.asarray([322.0, 238.0]),
      image_size=np.asarray([640, 480]),
      skew=0.5,
      pixel_aspect_ratio=1.01,
      radial_distortion=(np.asarray([0.05, -0.01, 0.002])
                         if distorted else None),
      tangential_distortion=(np.asarray([0.001, -0.0005])
                             if distorted else None),
  )


def test_project_pixels_to_rays_roundtrip():
  camera = _make_camera()
  rng = np.random.RandomState(0)
  pixels = np.stack([
      rng.uniform(50, 600, 128), rng.uniform(50, 430, 128)], -1).astype(
          np.float32)
  rays = camera.pixels_to_rays(pixels)
  depths = rng.uniform(1.0, 5.0, 128).astype(np.float32)
  points = camera.position + rays * depths[:, None]
  reprojected = camera.project(points)
  np.testing.assert_allclose(reprojected, pixels, atol=5e-3)


def test_pixels_to_points_project_roundtrip():
  camera = _make_camera(distorted=False)
  pixels = camera.get_pixel_centers()[::120, ::160].reshape(-1, 2)
  depth = np.full(pixels.shape[0], 2.0, np.float32)
  points = camera.pixels_to_points(pixels, depth)
  np.testing.assert_allclose(camera.project(points), pixels, atol=1e-3)


def test_undistort_fixed_point():
  # undistort(distort(x)) == x
  rng = np.random.RandomState(1)
  x = rng.uniform(-0.3, 0.3, 256)
  y = rng.uniform(-0.3, 0.3, 256)
  k1, k2, k3, p1, p2 = 0.05, -0.01, 0.002, 0.001, -0.0005
  r = x * x + y * y
  d = 1.0 + r * (k1 + r * (k2 + k3 * r))
  xd = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x)
  yd = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y)
  xu, yu = cam.undistort_np(xd, yd, k1, k2, k3, p1, p2)
  np.testing.assert_allclose(xu, x, atol=1e-6)
  np.testing.assert_allclose(yu, y, atol=1e-6)


def test_jax_rays_match_numpy():
  camera = _make_camera()
  pixels = camera.get_pixel_centers()[::60, ::80].reshape(-1, 2)
  ref = camera.pixels_to_rays(pixels)
  params = {k: jnp.asarray(v) for k, v in camera.ray_parameters().items()}
  got = jax.jit(cam.pixels_to_rays)(jnp.asarray(pixels), **params)
  np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_json_roundtrip(tmp_path):
  camera = _make_camera()
  path = tmp_path / 'camera.json'
  camera.save_json(path)
  loaded = cam.Camera.from_json(path)
  for key, value in camera.get_parameters().items():
    np.testing.assert_allclose(
        np.asarray(loaded.get_parameters()[key], np.float64),
        np.asarray(value, np.float64), atol=1e-6, err_msg=key)


def test_json_legacy_tangential_field(tmp_path):
  d = _make_camera().to_json()
  d['tangential'] = d.pop('tangential_distortion')
  path = tmp_path / 'camera.json'
  with open(path, 'w') as f:
    json.dump(d, f)
  loaded = cam.Camera.from_json(path)
  np.testing.assert_allclose(loaded.tangential_distortion, [0.001, -0.0005],
                             atol=1e-7)


def test_scale():
  camera = _make_camera()
  half = camera.scale(0.5)
  np.testing.assert_allclose(half.focal_length, 260.0)
  np.testing.assert_allclose(half.principal_point, [161.0, 119.0])
  np.testing.assert_array_equal(half.image_size, [320, 240])
  with pytest.raises(ValueError):
    camera.scale(-1.0)


def test_look_at():
  camera = _make_camera(distorted=False)
  eye = np.asarray([0.0, 0.0, 5.0])
  target = np.asarray([0.0, 0.0, 0.0])
  up = np.asarray([0.0, 1.0, 0.0])
  oriented = camera.look_at(eye, target, up)
  # Optical axis points from eye to target.
  np.testing.assert_allclose(oriented.optical_axis, [0.0, 0.0, -1.0],
                             atol=1e-6)
  np.testing.assert_allclose(oriented.position, eye, atol=1e-6)
  # Orientation is orthonormal.
  np.testing.assert_allclose(
      oriented.orientation @ oriented.orientation.T, np.eye(3), atol=1e-6)


def test_crop_image_domain():
  camera = _make_camera()
  cropped = camera.crop_image_domain(left=10, top=20, right=30, bottom=40)
  np.testing.assert_array_equal(cropped.image_size, [600, 420])
  np.testing.assert_allclose(cropped.principal_point, [312.0, 218.0])
  with pytest.raises(ValueError):
    camera.crop_image_domain(left=1000)


def test_get_pixel_centers():
  camera = _make_camera()
  centers = camera.get_pixel_centers()
  assert centers.shape == (480, 640, 2)
  np.testing.assert_allclose(centers[0, 0], [0.5, 0.5])
  np.testing.assert_allclose(centers[-1, -1], [639.5, 479.5])
