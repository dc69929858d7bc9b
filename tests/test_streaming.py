"""Streaming (memmap-backed) ray pool vs the preloaded pool.

The streaming path is the TPU rebuild of the reference's lazy tf.data
pipeline (/root/reference/nerfies/datasets/core.py:449-493): identical
batch contents, bounded host memory, windowed shuffling.
"""

import numpy as np
import pytest

from nerfies_tpu.datasets import core as ds_core
from nerfies_tpu.datasets import nerfies as nerfies_ds
from nerfies_tpu.datasets import synthetic


@pytest.fixture(scope='module')
def datasource(tmp_path_factory):
  path = tmp_path_factory.mktemp('stream_scene')
  synthetic.write_synthetic_dataset(
      path, num_train=5, num_val=1, image_size=(20, 14),
      motion_amplitude=0.05)
  return nerfies_ds.NerfiesDataSource(
      data_dir=str(path), image_scale=1, use_warp_id=True, random_seed=0)


def test_streaming_pool_matches_preloaded(datasource):
  preloaded = datasource.create_ray_pool(datasource.train_ids, preload=True)
  streaming = datasource.create_ray_pool(datasource.train_ids, preload=False)
  try:
    assert isinstance(streaming, ds_core.StreamingRayPool)
    assert isinstance(streaming.directions, np.memmap)
    assert isinstance(streaming.rgb, np.memmap)
    assert streaming.num_rays == preloaded.num_rays

    rng = np.random.default_rng(3)
    idx = rng.integers(0, streaming.num_rays, size=64)
    a = preloaded.assemble(idx)
    b = streaming.assemble(idx)
    np.testing.assert_array_equal(a['origins'], b['origins'])
    np.testing.assert_array_equal(a['directions'], b['directions'])
    np.testing.assert_array_equal(a['rgb'], b['rgb'])
    assert a['metadata'].keys() == b['metadata'].keys()
    for k in a['metadata']:
      np.testing.assert_array_equal(a['metadata'][k], b['metadata'][k])
  finally:
    streaming.close()


def test_windowed_shuffle_covers_epoch():
  offsets = np.array([0, 10, 25, 31, 50, 64], np.int64)
  rng = np.random.default_rng(0)
  batches = list(ds_core.windowed_index_batches(rng, offsets, batch_size=8,
                                                window_images=2))
  flat = np.concatenate(batches)
  # All yielded indices unique and in range; only the final partial batch
  # of the epoch (64 % 8 == 0 here, so none) may be dropped.
  assert flat.shape[0] == 64
  assert sorted(flat.tolist()) == list(range(64))
  # Not the identity order (it shuffled).
  assert flat.tolist() != list(range(64))


def test_windowed_shuffle_deterministic_and_epoch_varying():
  offsets = np.array([0, 7, 19, 23, 40], np.int64)
  a = np.concatenate(list(ds_core.windowed_index_batches(
      np.random.default_rng(5), offsets, 8, 2)))
  b = np.concatenate(list(ds_core.windowed_index_batches(
      np.random.default_rng(5), offsets, 8, 2)))
  np.testing.assert_array_equal(a, b)
  rng = np.random.default_rng(5)
  epoch1 = np.concatenate(list(
      ds_core.windowed_index_batches(rng, offsets, 8, 2)))
  epoch2 = np.concatenate(list(
      ds_core.windowed_index_batches(rng, offsets, 8, 2)))
  assert epoch1.tolist() != epoch2.tolist()


def test_streaming_iterator_host_slices_compose(datasource):
  pool = datasource.create_ray_pool(datasource.train_ids, preload=False)
  try:
    full = ds_core.iterator_from_pool(
        pool, batch_size=32, seed=1, prefetch_size=0,
        process_index=0, process_count=1)
    h0 = ds_core.iterator_from_pool(
        pool, batch_size=32, seed=1, prefetch_size=0,
        process_index=0, process_count=2)
    h1 = ds_core.iterator_from_pool(
        pool, batch_size=32, seed=1, prefetch_size=0,
        process_index=1, process_count=2)
    for _ in range(3):
      g = next(full)
      a, b = next(h0), next(h1)
      np.testing.assert_array_equal(
          g['directions'], np.concatenate([a['directions'],
                                           b['directions']]))
      np.testing.assert_array_equal(
          g['rgb'], np.concatenate([a['rgb'], b['rgb']]))
  finally:
    pool.close()


def test_streaming_pool_close_removes_cache(datasource):
  pool = datasource.create_ray_pool(datasource.train_ids, preload=False)
  cache_dir = pool.cache_dir
  assert cache_dir.exists()
  pool.close()
  assert not cache_dir.exists()


def test_streaming_trains(datasource):
  """A few optimizer steps run off the streaming pool end to end."""
  import flax.linen as nn
  import jax
  from nerfies_tpu import configs
  from nerfies_tpu import training
  from nerfies_tpu.models import nerf
  from nerfies_tpu.parallel import mesh as mesh_lib

  model_config = configs.ModelConfig(
      num_coarse_samples=8, num_fine_samples=0,
      nerf_trunk_depth=2, nerf_trunk_width=16,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=16,
      nerf_skips=(1,), num_nerf_point_freqs=4, num_nerf_viewdir_freqs=2,
      use_warp=False, sigma_activation=nn.softplus)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=64,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0,),
      near=datasource.near, far=datasource.far)
  state = training.create_train_state(params)
  mesh = mesh_lib.create_mesh()
  step_fn = training.compile_train_step(
      model, configs.TrainConfig(batch_size=64), mesh)
  state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))

  pool = datasource.create_ray_pool(datasource.train_ids, preload=False)
  try:
    it = ds_core.iterator_from_pool(pool, batch_size=64, seed=0,
                                    prefetch_size=0, process_index=0,
                                    process_count=1)
    rng = jax.random.PRNGKey(2)
    for step, batch in zip(range(3), it):
      state, stats, _ = step_fn(jax.random.fold_in(rng, step), state,
                                batch, training.ScalarParams(1e-3))
    assert np.isfinite(float(jax.device_get(stats['coarse']['loss/total'])))
  finally:
    pool.close()
