"""Capture processing: COLMAP scene -> nerfies dataset round trip."""

import numpy as np
import pytest

from nerfies_tpu import capture
from nerfies_tpu import datasets
from nerfies_tpu.camera import Camera
from nerfies_tpu.colmap import ColmapCamera
from nerfies_tpu.colmap import Image
from nerfies_tpu.colmap import Quaternion
from nerfies_tpu.colmap import SceneManager
from nerfies_tpu.datasets import synthetic


def _make_colmap_scene(tmp_path, num_frames=6, image_size=(64, 48)):
  """Synthesizes a COLMAP reconstruction of cameras orbiting the origin."""
  mgr = SceneManager(tmp_path)
  mgr.cameras[1] = ColmapCamera(
      1, 'OPENCV', image_size[0], image_size[1],
      [60.0, 60.0, image_size[0] / 2, image_size[1] / 2, 0, 0, 0, 0])
  rng = np.random.RandomState(0)
  points = rng.uniform(-0.5, 0.5, (200, 3))
  for i in range(num_frames):
    theta = 2 * np.pi * i / num_frames
    cam = synthetic.make_orbit_camera(theta, image_size=image_size)
    # nerfies Camera -> COLMAP pose: R = orientation, t = -R @ position.
    q = Quaternion.from_rotation_matrix(cam.orientation)
    t = -cam.orientation @ cam.position
    mgr.images[i + 1] = Image(
        i + 1, f'{i:04d}.png', 1, q.q, t,
        points2D=rng.uniform(0, 64, (4, 2)),
        point3D_ids=np.asarray([1, 2, 3, 4], np.int64))
  mgr.name_to_image_id = {im.name: i for i, im in mgr.images.items()}
  ids = list(range(1, 201))
  tracks = [[(1 + (j % num_frames), 0), (1 + ((j + 1) % num_frames), 1)]
            for j in range(200)]
  mgr._set_points(ids, points, rng.randint(0, 255, (200, 3)),
                  rng.uniform(0, 1, 200), tracks)
  mgr.save(tmp_path)
  return mgr, points


def test_convert_colmap_camera_roundtrip(tmp_path):
  mgr, _ = _make_colmap_scene(tmp_path)
  cameras = capture.load_colmap_cameras(mgr)
  assert len(cameras) == 6
  # The converted camera must reproduce the original orbit camera pose.
  original = synthetic.make_orbit_camera(0.0, image_size=(64, 48))
  converted = cameras['0000']
  np.testing.assert_allclose(converted.position, original.position,
                             atol=1e-5)
  np.testing.assert_allclose(converted.orientation, original.orientation,
                             atol=1e-5)


def test_filter_outlier_points():
  rng = np.random.RandomState(0)
  points = rng.randn(1000, 3)
  points[0] = [100.0, 0, 0]  # gross outlier
  filtered = capture.filter_outlier_points(points, 0.95)
  assert filtered.shape[0] < 1000
  assert np.abs(filtered).max() < 50.0


def test_estimate_near_far():
  cameras = [synthetic.make_orbit_camera(t, image_size=(64, 48))
             for t in np.linspace(0, 2 * np.pi, 6, endpoint=False)]
  rng = np.random.RandomState(1)
  points = rng.uniform(-0.5, 0.5, (500, 3))
  near, far = capture.estimate_near_far(cameras, points)
  # Cameras orbit at radius ~3 looking at the origin.
  assert 1.0 < near < 3.0
  assert 3.0 < far < 8.0


def test_scene_center_scale():
  rng = np.random.RandomState(2)
  points = rng.uniform(-1, 1, (500, 3))
  positions = np.asarray([[3.0, 0, 0], [-3.0, 0, 0]])
  center, scale, bbox = capture.compute_scene_center_scale(points, positions)
  np.testing.assert_allclose(center, [0, 0, 0], atol=0.2)
  assert 0.1 < scale < 0.2  # 1 / diag(6, 2, 2) ~ 0.15
  assert bbox.shape == (2, 3)


def test_triangulate_rays():
  target = np.asarray([0.3, -0.2, 1.5])
  rng = np.random.RandomState(3)
  origins = rng.randn(8, 3) * 2.0
  directions = target - origins
  point = capture.triangulate_rays(origins, directions)
  np.testing.assert_allclose(point, target, atol=1e-6)


def test_generate_orbit_cameras():
  ref = [synthetic.make_orbit_camera(t, image_size=(64, 48))
         for t in np.linspace(0, 2 * np.pi, 6, endpoint=False)]
  orbit = capture.generate_orbit_cameras(ref, num_frames=10)
  assert len(orbit) == 10
  for cam in orbit:
    # Orthonormal orientation, valid optics.
    np.testing.assert_allclose(cam.orientation @ cam.orientation.T,
                               np.eye(3), atol=1e-6)


def test_blur_scores():
  rng = np.random.RandomState(4)
  sharp = rng.uniform(size=(48, 64, 3)).astype(np.float32)
  import cv2
  blurry = cv2.GaussianBlur(sharp, (11, 11), 5.0)
  scores = capture.compute_blur_scores([sharp, blurry])
  assert scores[0] > scores[1]
  keep = capture.select_sharp_frames(scores, keep_percentile=50.0)
  assert 0 in keep


def test_process_capture_end_to_end(tmp_path):
  colmap_dir = tmp_path / 'colmap'
  colmap_dir.mkdir()
  mgr, _ = _make_colmap_scene(colmap_dir)

  # Render synthetic frames for each camera.
  images = {}
  for name, cam in capture.load_colmap_cameras(mgr).items():
    images[name] = synthetic.render_sphere_image(cam)

  out_dir = capture.process_capture(
      colmap_dir, images, tmp_path / 'dataset', val_fraction=0.34,
      image_scales=(1, 2), min_track_len=2, orbit_frames=4)

  # The produced directory loads as a functioning datasource.
  ds = datasets.from_config(
      {'type': 'nerfies', 'data_dir': str(out_dir)}, image_scale=1,
      use_warp_id=True)
  assert len(ds.train_ids) + len(ds.val_ids) == 6
  item = ds.get_item(ds.train_ids[0])
  assert item['rgb'].shape[2] == 3
  points = ds.load_points()
  assert points.shape[1] == 3
  cams = ds.load_test_cameras()
  assert len(cams) == 4
  assert 0 < ds.near < ds.far


def _face_landmark_points(rng):
  """478 synthetic 3D landmarks with a plausible face geometry."""
  pts = rng.uniform(-0.01, 0.01, (478, 3)).astype(np.float64)
  # Flatten onto a tilted plane (normal ~ +z after normalization).
  pts[:, 2] *= 0.05
  pts[capture.NOSE_TIP_IDX] = [0.02, 0.0, 0.05]
  pts[capture.FOREHEAD_IDX] = [0.0, 0.08, 0.0]
  pts[capture.CHIN_IDX] = [0.0, -0.09, 0.01]
  pts[capture.RIGHT_EYE_IDX] = [-0.25, 0.03, 0.0]
  pts[capture.LEFT_EYE_IDX] = [0.25, 0.03, 0.0]
  pts[capture.RIGHT_TEMPLE_IDX] = [-0.07, 0.02, -0.02]
  pts[capture.LEFT_TEMPLE_IDX] = [0.07, 0.02, -0.02]
  return pts


def test_triangulate_landmarks_recovers_points():
  rng = np.random.RandomState(3)
  pts = _face_landmark_points(rng)
  cameras, landmarks_px = [], []
  for theta in (0.1, 0.7, 1.3, 2.0):
    cam = synthetic.make_orbit_camera(theta, image_size=(128, 96))
    cameras.append(cam)
    landmarks_px.append(np.asarray(cam.project(pts)))
  recovered = capture.triangulate_landmarks(landmarks_px, cameras)
  np.testing.assert_allclose(recovered, pts, atol=1e-3)


def test_landmark_scene_normalization_geometry():
  """Basis is a rotation, nose maps to origin, IPD fixes metric scale."""
  rng = np.random.RandomState(4)
  pts = _face_landmark_points(rng)
  cameras, landmarks_px = [], []
  for theta in (0.2, 0.9, 1.6, 2.4):
    cam = synthetic.make_orbit_camera(theta, image_size=(128, 96))
    cameras.append(cam)
    landmarks_px.append(np.asarray(cam.project(pts)))

  basis, origin, scale = capture.landmark_scene_normalization(
      landmarks_px, cameras)

  np.testing.assert_allclose(basis.T @ basis, np.eye(3), atol=1e-5)
  np.testing.assert_allclose(np.linalg.det(basis), 1.0, atol=1e-5)
  np.testing.assert_allclose(origin, pts[capture.NOSE_TIP_IDX], atol=1e-3)
  # Synthetic IPD is 0.5 scene units; DEFAULT_IPD = 0.06 m.
  np.testing.assert_allclose(scale, 0.06 / 0.5, rtol=1e-2)

  # Transformed eyes are 0.06 apart and the nose sits at the origin.
  moved = capture.transform_points(pts, basis, origin, scale)
  ipd = np.linalg.norm(moved[capture.LEFT_EYE_IDX]
                       - moved[capture.RIGHT_EYE_IDX])
  np.testing.assert_allclose(ipd, 0.06, rtol=1e-2)
  np.testing.assert_allclose(moved[capture.NOSE_TIP_IDX], 0.0, atol=1e-5)


def test_transform_camera_preserves_projection():
  rng = np.random.RandomState(5)
  pts = rng.uniform(-0.4, 0.4, (50, 3))
  cam = synthetic.make_orbit_camera(0.8, image_size=(128, 96))

  theta = 0.6
  c, s = np.cos(theta), np.sin(theta)
  basis = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
  origin = np.array([0.1, -0.2, 0.3])
  scale = 2.5

  new_cam = capture.transform_camera(cam, basis, origin, scale)
  new_pts = capture.transform_points(pts, basis, origin, scale)
  np.testing.assert_allclose(np.asarray(new_cam.project(new_pts)),
                             np.asarray(cam.project(pts)), atol=1e-2)


def test_process_capture_with_face_landmarks(tmp_path):
  colmap_dir = tmp_path / 'colmap'
  colmap_dir.mkdir()
  mgr, _ = _make_colmap_scene(colmap_dir)
  cameras = capture.load_colmap_cameras(mgr)
  rng = np.random.RandomState(6)
  pts = _face_landmark_points(rng)
  images, face_landmarks = {}, {}
  for name, cam in cameras.items():
    images[name] = synthetic.render_sphere_image(cam)
    face_landmarks[name] = np.asarray(cam.project(pts))

  out_dir = capture.process_capture(
      colmap_dir, images, tmp_path / 'dataset', val_fraction=0.34,
      image_scales=(1,), min_track_len=2, orbit_frames=4,
      face_landmarks=face_landmarks)

  ds = datasets.from_config(
      {'type': 'nerfies', 'data_dir': str(out_dir)}, image_scale=1,
      use_warp_id=True)
  assert 0 < ds.near < ds.far
  # Cameras were rescaled to metric units: with IPD 0.5 scene units the
  # orbit radius 3 becomes ~3 * 0.12 = 0.36 m from the nose tip.
  cam0 = ds.load_camera(ds.train_ids[0])
  assert np.linalg.norm(cam0.position) < 3.0
