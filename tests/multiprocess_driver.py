"""Subprocess driver for the multi-process (multi-host) training test.

Launched by tests/test_multiprocess.py once per simulated host. Runs a
short training loop over the REAL multi-host input path
(iterator_from_pool per-host slicing + mesh.shard_batch global-array
assembly), saves an orbax checkpoint from ALL processes (collective), and
dumps the final parameters so the parent can assert that an N-process run
matches the single-process run.

Usage:
  python multiprocess_driver.py <process_id> <num_processes> <coord_port> \
      <scene_dir> <out_dir> <devices_per_process>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  process_id = int(sys.argv[1])
  num_processes = int(sys.argv[2])
  coord_port = int(sys.argv[3])
  scene_dir = sys.argv[4]
  out_dir = sys.argv[5]
  devices_per_process = int(sys.argv[6])

  os.environ['PALLAS_AXON_POOL_IPS'] = ''
  os.environ['JAX_PLATFORMS'] = 'cpu'
  os.environ['XLA_FLAGS'] = (
      os.environ.get('XLA_FLAGS', '') +
      f' --xla_force_host_platform_device_count={devices_per_process}')

  import jax
  jax.config.update('jax_platforms', 'cpu')
  if num_processes > 1:
    jax.distributed.initialize(
        coordinator_address=f'localhost:{coord_port}',
        num_processes=num_processes,
        process_id=process_id)

  import flax.linen as nn
  import numpy as np

  from nerfies_tpu import checkpoints
  from nerfies_tpu import configs
  from nerfies_tpu import training
  from nerfies_tpu.datasets import core as ds_core
  from nerfies_tpu.datasets import nerfies as nerfies_ds
  from nerfies_tpu.models import nerf
  from nerfies_tpu.parallel import mesh as mesh_lib

  assert jax.process_count() == num_processes
  assert jax.device_count() == num_processes * devices_per_process

  datasource = nerfies_ds.NerfiesDataSource(
      data_dir=scene_dir, image_scale=1, use_warp_id=True, random_seed=0)
  model_config = configs.ModelConfig(
      num_coarse_samples=8, num_fine_samples=8,
      nerf_trunk_depth=2, nerf_trunk_width=16,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=16,
      nerf_skips=(1,), num_nerf_point_freqs=4, num_nerf_viewdir_freqs=2,
      use_warp=True, warp_field_type='translation', num_warp_freqs=2,
      num_warp_features=2,
      warp_kwargs={'depth': 1, 'hidden_channels': 16, 'skips': ()},
      sigma_activation=nn.softplus)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=64,
      appearance_ids=(0,), camera_ids=(0,),
      warp_ids=datasource.warp_ids,
      near=datasource.near, far=datasource.far)

  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  train_config = configs.TrainConfig(batch_size=64)
  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))

  pool = datasource.create_ray_pool(datasource.train_ids)
  # Per-host slicing of the identical global permutation happens inside
  # iterator_from_pool via jax.process_index()/process_count().
  it = ds_core.iterator_from_pool(pool, batch_size=64, seed=0,
                                  prefetch_size=0)
  rng = jax.random.PRNGKey(7)
  scalar_params = training.ScalarParams(learning_rate=1e-2)
  for step, batch in zip(range(5), it):
    state, stats, _ = step_fn(jax.random.fold_in(rng, step), state, batch,
                              scalar_params)
  loss = float(jax.device_get(stats['fine']['loss/total']))

  # Collective checkpoint save from ALL processes (the multi-host orbax
  # path train.py uses); would deadlock if only host 0 called it.
  ckpt_dir = os.path.join(out_dir, 'ckpt')
  checkpoints.save_checkpoint(ckpt_dir, state)
  restored_step = checkpoints.latest_checkpoint_step(ckpt_dir)
  assert restored_step == 5, restored_step

  if process_id == 0:
    flat, _ = jax.tree_util.tree_flatten(jax.device_get(state.params))
    np.savez(os.path.join(out_dir, 'params.npz'),
             loss=np.float32(loss),
             **{f'p{i}': np.asarray(x) for i, x in enumerate(flat)})
  print(f'driver process {process_id} done, loss={loss:.6f}', flush=True)


if __name__ == '__main__':
  main()
