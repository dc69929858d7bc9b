"""Data pipeline: synthetic scene round-trip, ray pool, iterators."""

import numpy as np
import pytest

from nerfies_tpu import datasets
from nerfies_tpu.datasets import core
from nerfies_tpu.datasets import synthetic


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
  path = tmp_path_factory.mktemp('scene')
  synthetic.write_synthetic_dataset(
      path, num_train=4, num_val=2, image_size=(32, 24),
      image_scales=(1, 2), motion_amplitude=0.1)
  return path


@pytest.fixture(scope='module')
def datasource(scene_dir):
  return datasets.from_config(
      {'type': 'nerfies', 'data_dir': str(scene_dir)},
      image_scale=1,
      use_appearance_id=True,
      use_camera_id=True,
      use_warp_id=True,
      use_time=True,
      random_seed=0)


def test_ids_and_scene_info(datasource):
  assert datasource.train_ids == ['0000', '0001', '0002', '0003']
  assert datasource.val_ids == ['0004', '0005']
  assert datasource.near == 1.5
  assert datasource.far == 4.5
  assert datasource.appearance_ids == (0, 1, 2, 3)
  assert datasource.camera_ids == (0,)
  assert datasource.warp_ids == (0, 1, 2, 3)
  assert datasource.time_ids == (0, 1, 2, 3)


def test_get_item(datasource):
  item = datasource.get_item('0000')
  assert item['rgb'].shape == (24, 32, 3)
  assert item['rgb'].dtype == np.float32
  assert item['metadata']['appearance'] == 0
  assert item['metadata']['warp'] == 0
  assert item['metadata']['time'] == -1.0  # time normalized to [-1, 1]


def test_image_scale_pyramid(scene_dir):
  ds = datasets.from_config(
      {'type': 'nerfies', 'data_dir': str(scene_dir)}, image_scale=2)
  item = ds.get_item('0000')
  assert item['rgb'].shape == (12, 16, 3)
  # The camera is scaled to match the image pyramid level.
  camera = ds.load_camera('0000')
  assert camera.image_shape == (12, 16)


def test_ray_pool_and_batches(datasource):
  pool = datasource.create_ray_pool(datasource.train_ids)
  assert pool.num_rays == 4 * 24 * 32
  it = core.iterator_from_pool(pool, batch_size=64, seed=0,
                               prefetch_size=0, process_index=0,
                               process_count=1)
  batch = next(it)
  assert batch['origins'].shape == (64, 3)
  assert batch['directions'].shape == (64, 3)
  assert batch['rgb'].shape == (64, 3)
  assert batch['rgb'].dtype == np.float32
  assert batch['rgb'].min() >= 0.0 and batch['rgb'].max() <= 1.0
  assert batch['metadata']['warp'].shape == (64, 1)
  assert batch['metadata']['warp'].dtype == np.uint32
  assert batch['metadata']['time'].dtype == np.float32
  # Directions are unit vectors.
  np.testing.assert_allclose(
      np.linalg.norm(batch['directions'], axis=-1), 1.0, atol=1e-5)


def test_pool_batch_consistency(datasource):
  # A ray's origin must be the position of the camera of its image, and its
  # metadata must match that image.
  pool = datasource.create_ray_pool(datasource.train_ids)
  idx = np.asarray([0, 24 * 32, 2 * 24 * 32 + 5])  # rays of images 0, 1, 2
  batch = pool.assemble(idx)
  for row, image_i in enumerate([0, 1, 2]):
    camera = datasource.load_camera(datasource.train_ids[image_i])
    np.testing.assert_allclose(batch['origins'][row], camera.position,
                               atol=1e-6)
    assert batch['metadata']['warp'][row, 0] == image_i


def test_iterator_host_sharding(datasource):
  pool = datasource.create_ray_pool(datasource.train_ids)
  # Two simulated hosts must see disjoint halves of the same global batch.
  it0 = core.iterator_from_pool(pool, batch_size=32, seed=7,
                                prefetch_size=0, process_index=0,
                                process_count=2)
  it1 = core.iterator_from_pool(pool, batch_size=32, seed=7,
                                prefetch_size=0, process_index=1,
                                process_count=2)
  b0, b1 = next(it0), next(it1)
  assert b0['directions'].shape == (16, 3)
  assert b1['directions'].shape == (16, 3)
  assert not np.allclose(b0['directions'], b1['directions'])
  # Together they equal the full global batch drawn by a single host.
  it_all = core.iterator_from_pool(pool, batch_size=32, seed=7,
                                   prefetch_size=0, process_index=0,
                                   process_count=1)
  b_all = next(it_all)
  np.testing.assert_array_equal(
      np.concatenate([b0['directions'], b1['directions']]),
      b_all['directions'])


def test_epoch_permutation_changes(datasource):
  pool = datasource.create_ray_pool(datasource.train_ids)
  n_batches = pool.num_rays // 512
  it = core.iterator_from_pool(pool, batch_size=512, seed=0,
                               prefetch_size=0, process_index=0,
                               process_count=1)
  epoch1 = [next(it) for _ in range(n_batches)]
  epoch2 = [next(it) for _ in range(n_batches)]
  assert not np.allclose(epoch1[0]['directions'], epoch2[0]['directions'])


def test_image_iterator(datasource):
  it = datasource.create_iterator(datasource.val_ids, batch_size=0,
                                  repeat=False)
  items = list(it)
  assert len(items) == 2
  assert items[0]['rgb'].shape == (24, 32, 3)
  assert items[0]['origins'].shape == (24, 32, 3)
  assert items[0]['metadata']['warp'].shape == (24, 32, 1)


def test_load_points(datasource):
  points = datasource.load_points()
  assert points.shape == (256, 3)
  assert points.dtype == np.float32


def test_load_test_cameras(datasource):
  cameras = datasource.load_test_cameras()
  assert len(cameras) == 6


def test_prefetch_iterator(datasource):
  arrays = {'x': np.arange(100, dtype=np.float32)[:, None]}
  it = core.iterator_from_arrays(arrays, batch_size=10, prefetch_size=2,
                                 shuffle=True, seed=0)
  batches = [next(it) for _ in range(15)]
  assert all(b['x'].shape == (10, 1) for b in batches)
  # Every epoch covers all elements exactly once.
  epoch = np.sort(np.concatenate([b['x'][:, 0] for b in batches[:10]]))
  np.testing.assert_array_equal(epoch, np.arange(100))


def test_synthetic_sphere_renders_signal(scene_dir, datasource):
  item = datasource.get_item('0000')
  rgb = item['rgb']
  # The image contains both background (1.0) and sphere shading.
  assert rgb.max() > 0.95
  assert rgb.min() < 0.8
  assert rgb.std() > 0.05


def test_gt_depth_loading(tmp_path):
  """depth/{scale}x maps surface through get_item in scene units."""
  synthetic.write_synthetic_dataset(
      tmp_path, num_train=2, num_val=1, image_size=(32, 24),
      write_depth=True)
  ds = datasets.from_config(
      {'type': 'nerfies', 'data_dir': str(tmp_path)},
      image_scale=1, use_depth=True, random_seed=0)
  item = ds.get_item('0000')
  assert 'depth' in item
  depth = item['depth'][..., 0]
  assert depth.shape == item['rgb'].shape[:2]
  camera = ds.load_camera('0000')
  _, expected = synthetic.render_sphere_image(camera, return_depth=True)
  valid = expected > 0
  assert valid.any()
  # uint16 quantization over [0, 1000) scene units => ~0.02 absolute.
  np.testing.assert_allclose(depth[valid], expected[valid], atol=0.05)
  # Frames without a depth map skip the key.
  (tmp_path / 'depth' / '1x' / '0001.png').unlink()
  assert 'depth' not in ds.get_item('0001')


@pytest.mark.parametrize('cps', [1, 2])
def test_val_gt_matches_reused_metadata_state(tmp_path, cps):
  """A val frame's GT shows the deformation state of the train state
  whose warp id it reuses -- NOT a state at the val frame's own orbit
  index -- and its camera sits between that state's train cameras.
  (Round-4 bug: the mismatch misplaced the sphere by up to
  motion_amplitude and capped val PSNR at ~23.5 dB forever.)"""
  num_train, num_val = 4, 2
  path = tmp_path / f'cps{cps}'
  synthetic.write_synthetic_dataset(
      path, num_train=num_train, num_val=num_val,
      image_size=(48, 36), motion_amplitude=0.3, cameras_per_state=cps)
  ds = datasets.from_config(
      {'type': 'nerfies', 'data_dir': str(path)},
      image_scale=1, use_warp_id=True, random_seed=0)
  num_states = num_train // cps
  # Train frames: consecutive cameras share a state id.
  for i in range(num_train):
    assert ds.get_warp_id(f'{i:04d}') == i // cps
  for j in range(num_val):
    item_id = f'{num_train + j:04d}'
    mid = (j * num_states) // num_val % num_states
    assert ds.get_warp_id(item_id) == mid
    camera = ds.load_camera(item_id)
    phase = 2.0 * np.pi * mid / num_states
    offset = 0.3 * np.sin(phase)
    expected = synthetic.render_sphere_image(
        camera, sphere_center=(offset, 0.0, 0.0))
    got = ds.get_item(item_id)['rgb']
    # uint8 round-trip only.
    np.testing.assert_allclose(got, expected, atol=1.5 / 255.0)
