"""bf16 compute path: finite, close to f32, and trains."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfies_tpu import configs
from nerfies_tpu import training
from nerfies_tpu.models import nerf


def _setup(use_bfloat16):
  config = configs.ModelConfig(
      num_coarse_samples=8, num_fine_samples=8,
      nerf_trunk_depth=3, nerf_trunk_width=32,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=16,
      nerf_skips=(2,), num_nerf_point_freqs=4, num_nerf_viewdir_freqs=2,
      num_warp_freqs=2, use_warp=True, warp_field_type='se3',
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 16},
      sigma_activation=nn.softplus, use_stratified_sampling=False,
      use_bfloat16=use_bfloat16)
  return nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=16,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0, 1),
      near=0.5, far=3.0, use_warp_jacobian=True, use_weights=True)


def _rays(n=16):
  d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
  d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
  return {
      'origins': jnp.zeros((n, 3)),
      'directions': d,
      'metadata': {
          'warp': jnp.zeros((n, 1), jnp.uint32),
          'camera': jnp.zeros((n, 1), jnp.uint32),
          'appearance': jnp.zeros((n, 1), jnp.uint32),
          'time': jnp.zeros((n, 1), jnp.float32),
      },
  }


def test_bf16_params_stay_f32_and_outputs_close():
  model16, params16 = _setup(True)
  model32, params32 = _setup(False)
  # Same init: the dtype only affects compute.
  for a, b in zip(jax.tree.leaves(params16), jax.tree.leaves(params32)):
    assert a.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  rays = _rays()
  warp_extra = {'alpha': 2.0, 'time_alpha': 0.0}
  out16 = model16.apply({'params': params16}, rays, warp_extra=warp_extra,
                        return_warp_jacobian=True)
  out32 = model32.apply({'params': params32}, rays, warp_extra=warp_extra,
                        return_warp_jacobian=True)
  rgb16, rgb32 = np.asarray(out16['fine']['rgb']), np.asarray(
      out32['fine']['rgb'])
  assert np.isfinite(rgb16).all()
  # Outputs are float32 and close to the f32 path.
  assert rgb16.dtype == np.float32
  assert np.abs(rgb16 - rgb32).max() < 0.03
  jac16 = np.asarray(out16['coarse']['warp_jacobian'])
  assert np.isfinite(jac16).all()


def test_bf16_training_step():
  model, params = _setup(True)
  state = training.create_train_state(params, warp_alpha=2.0)
  batch = jax.device_get(_rays())
  batch['rgb'] = np.random.RandomState(0).uniform(size=(16, 3)).astype(
      np.float32)
  scalar_params = training.ScalarParams(learning_rate=1e-3,
                                        elastic_loss_weight=1e-3)
  new_state, stats, _ = training.train_step(
      model, jax.random.PRNGKey(0), state,
      jax.tree.map(jnp.asarray, batch), scalar_params,
      use_elastic_loss=True, elastic_reduce_method='weight')
  assert np.isfinite(float(stats['fine']['loss/rgb']))
  for leaf in jax.tree.leaves(new_state.params):
    assert leaf.dtype == jnp.float32
    assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_fit_improves_psnr():
  """bf16 training must actually fit a scene, not just run."""
  import numpy as np
  from nerfies_tpu.datasets import synthetic
  from nerfies_tpu.datasets import nerfies as nerfies_ds
  from nerfies_tpu.datasets import core as ds_core
  from nerfies_tpu.parallel import mesh as mesh_lib
  import tempfile

  with tempfile.TemporaryDirectory() as tmp:
    synthetic.write_synthetic_dataset(tmp, num_train=4, num_val=1,
                                      image_size=(32, 24))
    ds = nerfies_ds.NerfiesDataSource(data_dir=tmp, image_scale=1,
                                      use_warp_id=True, random_seed=0)
    config = configs.ModelConfig(
        num_coarse_samples=16, num_fine_samples=16,
        nerf_trunk_depth=3, nerf_trunk_width=48,
        nerf_rgb_branch_depth=1, nerf_rgb_branch_width=16,
        nerf_skips=(2,), num_nerf_point_freqs=4, num_nerf_viewdir_freqs=1,
        use_warp=True, warp_field_type='se3', num_warp_freqs=2,
        num_warp_features=3,
        warp_kwargs={'trunk_depth': 2, 'trunk_width': 16},
        sigma_activation=nn.softplus, use_bfloat16=True)
    model, params = nerf.construct_nerf(
        jax.random.PRNGKey(0), config, batch_size=256,
        appearance_ids=(0,), camera_ids=(0,), warp_ids=ds.warp_ids,
        near=ds.near, far=ds.far)
    state = training.create_train_state(params, warp_alpha=2.0)
    mesh = mesh_lib.create_mesh()
    train_config = configs.TrainConfig(batch_size=256)
    step = training.compile_train_step(model, train_config, mesh)
    state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
    pool = ds.create_ray_pool(ds.train_ids)
    it = ds_core.iterator_from_pool(pool, 256, seed=0, prefetch_size=0,
                                    process_index=0, process_count=1)
    sp = training.ScalarParams(learning_rate=5e-3)
    psnrs = []
    for i, batch in zip(range(150), it):
      state, stats, _ = step(jax.random.fold_in(jax.random.PRNGKey(1), i),
                             state, batch, sp)
      if i % 50 == 0 or i == 149:
        psnrs.append(float(jax.device_get(stats['fine']['metric/psnr'])))
    assert psnrs[-1] > psnrs[0] + 2.0, psnrs
