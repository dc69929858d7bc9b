"""TPU profiling round 2: bf16 vs f32; loss-component costs. Internal."""

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import bench as B  # noqa: E402
from nerfies_tpu import configs  # noqa: E402
from nerfies_tpu import training  # noqa: E402
from nerfies_tpu.parallel import mesh as mesh_lib  # noqa: E402


def sync(tree):
  for leaf in jax.tree.leaves(tree):
    np.asarray(jax.device_get(leaf))


def run_case(name, batch_size, use_bfloat16, use_elastic=True,
             use_background=True, n=5):
  import flax.linen as nn
  model_config = configs.ModelConfig(
      num_coarse_samples=128, num_fine_samples=128,
      nerf_trunk_depth=8, nerf_trunk_width=256,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=128,
      num_nerf_point_freqs=8, num_nerf_viewdir_freqs=4,
      use_warp=True, warp_field_type='se3', num_warp_freqs=6,
      num_warp_features=8, use_appearance_metadata=True,
      use_camera_metadata=True, camera_metadata_dims=2,
      sigma_activation=nn.softplus, use_stratified_sampling=True,
      use_bfloat16=use_bfloat16)
  train_config = configs.TrainConfig(
      batch_size=batch_size, use_elastic_loss=use_elastic,
      elastic_reduce_method='weight', use_background_loss=use_background)
  from nerfies_tpu.models import nerf
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=batch_size,
      appearance_ids=tuple(range(16)), camera_ids=(0, 1),
      warp_ids=tuple(range(16)), near=0.1, far=2.0,
      use_warp_jacobian=use_elastic, use_weights=use_elastic)
  mesh = mesh_lib.create_mesh()
  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(training.create_train_state(params, warp_alpha=6.0),
                         mesh_lib.replicated_sharding(mesh))
  sp = training.ScalarParams(learning_rate=1e-3, elastic_loss_weight=1e-3,
                             background_loss_weight=1.0)
  rng = jax.random.PRNGKey(0)
  batch = B.fake_batch(batch_size)
  if not use_background:
    batch.pop('background_points')
  t0 = time.perf_counter()
  state, stats, _ = step_fn(rng, state, dict(batch), sp)
  sync(stats)
  print(f'{name}: first {time.perf_counter()-t0:.1f}s', flush=True)
  t0 = time.perf_counter()
  for i in range(n):
    state, stats, _ = step_fn(jax.random.fold_in(rng, i), state,
                              dict(batch), sp)
  sync(stats)
  dt = (time.perf_counter() - t0) / n
  print(f'{name}: steady {dt*1000:.1f} ms -> {batch_size/dt:.0f} rays/s, '
        f'loss={float(jax.device_get(stats["fine"]["loss/rgb"])):.4f}',
        flush=True)


if __name__ == '__main__':
  run_case('f32 b6144 all-losses', 6144, False)
  run_case('bf16 b6144 all-losses', 6144, True)
  run_case('bf16 b6144 no-elastic', 6144, True, use_elastic=False)
  run_case('bf16 b6144 no-elastic no-bg', 6144, True, use_elastic=False,
           use_background=False)
  run_case('bf16 b12288 all-losses', 12288, True)
  run_case('bf16 b16384 no-elastic', 16384, True, use_elastic=False)
