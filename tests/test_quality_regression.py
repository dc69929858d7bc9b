"""Quality regression floor: the textured env-background scene must fit.

This is the CI-sized twin of `scripts/quality_bench.py` (which records the
full quarter-HD-class curve on real TPU hardware into
docs/quality_curve.json). A deliberate quality regression — a broken loss,
a dead gradient path (e.g. the round-4 rgb-sigmoid saturation collapse), a
mis-routed fused head — fails THIS test instead of waiting for a human to
read TensorBoard. Reference analog: the reference has no quality assertion
at all; its de-facto harness is eval.py's TB curves (SURVEY.md §4).

Marked `slow` (~2.5 min on the 8-device CPU mesh with a warm compile
cache); runs in the default suite.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from nerfies_tpu import configs
from nerfies_tpu import evaluation
from nerfies_tpu import schedules
from nerfies_tpu import training
from nerfies_tpu.datasets import core as ds_core
from nerfies_tpu.datasets import nerfies as nerfies_ds
from nerfies_tpu.datasets import synthetic
from nerfies_tpu.models import nerf
from nerfies_tpu.parallel import mesh as mesh_lib


@pytest.mark.slow
def test_textured_scene_quality_floor(tmp_path):
  scene = tmp_path / 'quality_scene'
  synthetic.write_synthetic_dataset(
      scene, num_train=8, num_val=1, image_size=(64, 48),
      motion_amplitude=0.1, texture_frequency=8.0,
      env_background=True, num_points=4096)

  datasource = nerfies_ds.NerfiesDataSource(
      data_dir=str(scene), image_scale=1, use_appearance_id=True,
      use_warp_id=True, random_seed=0)

  # Scaled-down tpu_quarterhd semantics: SE(3) warp, elastic 'weight' +
  # background losses, rgb_padding, annealed warp frequencies.
  model_config = configs.ModelConfig(
      num_coarse_samples=24, num_fine_samples=24,
      nerf_trunk_depth=4, nerf_trunk_width=64,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=32,
      nerf_skips=(2,), num_nerf_point_freqs=8, num_nerf_viewdir_freqs=4,
      use_warp=True, warp_field_type='se3', num_warp_freqs=4,
      num_warp_features=6,
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 32},
      use_appearance_metadata=True,
      rgb_padding=0.001,
      sigma_activation=nn.softplus)
  batch_size = 512
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=batch_size,
      appearance_ids=datasource.appearance_ids,
      camera_ids=datasource.camera_ids or (0,),
      warp_ids=datasource.warp_ids,
      near=datasource.near, far=datasource.far,
      use_warp_jacobian=True, use_weights=True)

  mesh = mesh_lib.create_mesh()
  train_config = configs.TrainConfig(
      batch_size=batch_size,
      use_elastic_loss=True,
      elastic_reduce_method='weight',
      elastic_loss_type='log_svals',
      use_background_loss=True)
  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(training.create_train_state(params),
                         mesh_lib.replicated_sharding(mesh))

  num_steps = 300
  lr_sched = schedules.from_config(('exponential', 5e-3, 5e-4, num_steps))
  warp_alpha_sched = schedules.from_config(
      ('linear', 0.0, model_config.num_warp_freqs, num_steps))

  it = datasource.create_iterator(
      datasource.train_ids, flatten=True, shuffle=True,
      batch_size=batch_size, prefetch_size=2)
  points = datasource.load_points(shuffle=True)
  points_iter = ds_core.iterator_from_arrays(
      points, batch_size=min(len(points), 2048), shuffle=True, seed=0,
      prefetch_size=2)

  rng = jax.random.PRNGKey(1)
  first_psnr = None
  for step in range(1, num_steps + 1):
    batch = next(it)
    batch['background_points'] = next(points_iter)
    sp = training.ScalarParams(
        learning_rate=lr_sched(step),
        elastic_loss_weight=1e-3,
        background_loss_weight=1.0)
    state = state.replace(warp_alpha=jax.numpy.asarray(
        warp_alpha_sched(step), jax.numpy.float32))
    state, stats, _ = step_fn(jax.random.fold_in(rng, step), state,
                              batch, sp)
    if step == 1:
      first_psnr = float(jax.device_get(stats['fine']['metric/psnr']))

  # Render a TRAIN view through the full eval path for the floor. The
  # held-out val view saturates at ~15 dB here regardless of fit health
  # (8 orbit views is sparse-view territory), so it cannot separate a
  # collapse (~13 dB) from a healthy fit; the train-view render can:
  # calibrated 25.7 dB healthy vs ~13 dB under the round-4 rgb-sigmoid
  # saturation collapse.
  train_item = next(iter(datasource.create_iterator(
      datasource.train_ids[:1], batch_size=0, repeat=False)))
  render_fn = evaluation.make_render_fn(model, mesh)
  out = evaluation.render_image(
      state, {'origins': train_item['origins'],
              'directions': train_item['directions'],
              'metadata': train_item['metadata']},
      render_fn, chunk=2048)
  pred = np.clip(np.asarray(out['rgb']), 0.0, 1.0)
  mse = float(np.mean((pred - train_item['rgb']) ** 2))
  render_psnr = -10.0 * np.log10(mse)

  # Floor sits 4.5 dB under the calibrated healthy value so seed/BLAS
  # jitter cannot flake it, but 8 dB above where a real collapse lands.
  assert render_psnr > 21.0, (
      f'train-view render PSNR regressed: {render_psnr:.2f} dB')
  train_psnr = float(jax.device_get(stats['fine']['metric/psnr']))
  assert train_psnr > first_psnr + 5.0, (
      f'train PSNR did not rise: {first_psnr:.2f} -> {train_psnr:.2f}')
