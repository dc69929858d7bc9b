"""End-to-end: train on the synthetic scene, PSNR must rise; CLI smoke."""

import os
import subprocess
import sys
from pathlib import Path

import flax.linen as nn
import jax
import numpy as np
import pytest

from nerfies_tpu import configs
from nerfies_tpu import evaluation
from nerfies_tpu import training
from nerfies_tpu.datasets import core as ds_core
from nerfies_tpu.datasets import nerfies as nerfies_ds
from nerfies_tpu.datasets import synthetic
from nerfies_tpu.models import nerf
from nerfies_tpu.parallel import mesh as mesh_lib

REPO_ROOT = Path(__file__).parent.parent


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
  path = tmp_path_factory.mktemp('e2e_scene')
  synthetic.write_synthetic_dataset(
      path, num_train=6, num_val=1, image_size=(40, 30),
      motion_amplitude=0.0)
  return path


def test_fit_synthetic_scene_psnr_rises(scene_dir):
  """The minimum end-to-end slice: rays -> model -> loss -> Adam -> render."""
  datasource = nerfies_ds.NerfiesDataSource(
      data_dir=str(scene_dir), image_scale=1, use_warp_id=True,
      random_seed=0)
  model_config = configs.ModelConfig(
      num_coarse_samples=24, num_fine_samples=24,
      nerf_trunk_depth=4, nerf_trunk_width=64,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=32,
      nerf_skips=(2,), num_nerf_point_freqs=6, num_nerf_viewdir_freqs=2,
      use_warp=True, warp_field_type='se3', num_warp_freqs=2,
      num_warp_features=3,
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 32},
      sigma_activation=nn.softplus)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=256,
      appearance_ids=datasource.appearance_ids or (0,),
      camera_ids=datasource.camera_ids or (0,),
      warp_ids=datasource.warp_ids,
      near=datasource.near, far=datasource.far)

  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  train_config = configs.TrainConfig(batch_size=256)
  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))

  pool = datasource.create_ray_pool(datasource.train_ids)
  it = ds_core.iterator_from_pool(pool, batch_size=256, seed=0,
                                  prefetch_size=2, process_index=0,
                                  process_count=1)
  scalar_params = training.ScalarParams(learning_rate=5e-3)
  rng = jax.random.PRNGKey(1)

  psnrs = []
  for step, batch in zip(range(300), it):
    state, stats, _ = step_fn(jax.random.fold_in(rng, step), state, batch,
                              scalar_params)
    if step % 50 == 0 or step == 299:
      psnrs.append(float(jax.device_get(stats['fine']['metric/psnr'])))

  assert psnrs[-1] > psnrs[0] + 3.0, f'PSNR did not improve: {psnrs}'
  assert psnrs[-1] > 14.0, f'PSNR too low after training: {psnrs}'

  # Render a validation view and compare against ground truth.
  it_val = datasource.create_iterator(datasource.val_ids, batch_size=0,
                                      repeat=False)
  batch = next(it_val)
  render_fn = evaluation.make_render_fn(model, mesh)
  out = evaluation.render_image(
      state, {'origins': batch['origins'],
              'directions': batch['directions'],
              'metadata': batch['metadata']},
      render_fn, chunk=512)
  mse = float(((out['rgb'] - batch['rgb']) ** 2).mean())
  val_psnr = -10.0 * np.log10(mse)
  assert val_psnr > 12.0, f'Validation PSNR too low: {val_psnr}'


@pytest.mark.parametrize('entry',
                         ['train', 'eval', 'eval_occupancy', 'render_video'])
def test_cli_smoke(scene_dir, tmp_path, entry):
  """train.py / eval.py / render_video.py run end-to-end on test_local.

  The 'eval_occupancy' variant exercises the user-reachable serving
  accelerations: occupancy-grid culling + reduced sample presets
  (EvalConfig.use_occupancy_culling / occupancy_keep_* fields).
  'render_video' drives the novel-view video script over a camera path
  (on-device ray generation via render_camera).
  """
  base = tmp_path / 'exp'
  env = dict(os.environ)
  env['PALLAS_AXON_POOL_IPS'] = ''  # skip the TPU plugin in subprocesses
  env['JAX_PLATFORMS'] = 'cpu'
  bindings = [
      'TrainConfig.max_steps = 3',
      'TrainConfig.batch_size = 128',
      'TrainConfig.save_every = 3',
      'TrainConfig.print_every = 1',
      'TrainConfig.use_elastic_loss = False',
      'ModelConfig.num_coarse_samples = 8',
      'ModelConfig.num_fine_samples = 8',
      'ModelConfig.nerf_trunk_depth = 2',
      'ModelConfig.nerf_trunk_width = 16',
      'ModelConfig.num_warp_features = 3',
      'ExperimentConfig.image_scale = 1',
      'EvalConfig.chunk = 256',
      'EvalConfig.eval_once = True',
      'EvalConfig.num_val_eval = 1',
      'EvalConfig.num_train_eval = 1',
      'EvalConfig.num_test_eval = 1',
  ]
  cmd = [
      sys.executable, str(REPO_ROOT / 'train.py'),
      '--base_folder', str(base),
      '--data_dir', str(scene_dir),
      '--gin_configs', str(REPO_ROOT / 'configs' / 'test_local.gin'),
  ]
  for b in bindings:
    cmd += ['--gin_bindings', b]
  result = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          env=env, cwd=REPO_ROOT)
  assert result.returncode == 0, result.stderr[-3000:]
  assert (base / 'checkpoints').exists()
  assert (base / 'config.gin').exists()

  if entry == 'render_video':
    # The synthetic writer ships a 6-camera 'orbit-mild' trajectory.
    num_path_cams = len(list(
        (Path(scene_dir) / 'camera-paths' / 'orbit-mild').glob('*.json')))
    assert num_path_cams > 0
    cmd[1] = str(REPO_ROOT / 'scripts' / 'render_video.py')
    cmd += ['--chunk', '256']
    result = subprocess.run(cmd, capture_output=True, text=True,
                            timeout=600, env=env, cwd=REPO_ROOT)
    assert result.returncode == 0, result.stderr[-3000:]
    video_dir = base / 'video'
    pngs = sorted(video_dir.glob('*.png'))
    assert len(pngs) == num_path_cams, (
        f'expected {num_path_cams} frames, got {pngs}')
    return

  if entry.startswith('eval'):
    cmd[1] = str(REPO_ROOT / 'eval.py')
    if entry == 'eval_occupancy':
      for b in ('EvalConfig.use_occupancy_culling = True',
                'EvalConfig.occupancy_resolution = 16',
                'EvalConfig.occupancy_keep_coarse = 4',
                'EvalConfig.occupancy_keep_fine = 4'):
        cmd += ['--gin_bindings', b]
    result = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                            env=env, cwd=REPO_ROOT)
    assert result.returncode == 0, result.stderr[-3000:]
    renders = base / 'renders'
    assert renders.exists()
    pngs = list(renders.rglob('rgb.png'))
    assert pngs, 'eval produced no renders'
