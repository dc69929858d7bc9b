"""Training-throughput benchmark on the quarter-HD workload.

Measures sustained train-step throughput (rays/sec/chip) for the
gpu_quarterhd / gpu_vrig_paper workload: batch 6144 rays, 128 coarse + 128
fine samples/ray, SE(3) warp with elastic + background losses -- the
configuration behind the reference's headline "14 h on 8 GPUs" number
(/root/reference/README.md:77). Baseline: 6144 * 250k steps / 14 h over 8
GPUs ~= 3814 rays/sec/GPU (BASELINE.md).

Prints one JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": ..., "unit": "rays/s",
   "vs_baseline": ...}
"""

import argparse
import json
import time

import flax.linen as nn
import jax
import numpy as np

from nerfies_tpu import configs
from nerfies_tpu import training
from nerfies_tpu.models import nerf
from nerfies_tpu.parallel import mesh as mesh_lib

BASELINE_RAYS_PER_SEC_PER_GPU = 6144 * 250_000 / (14 * 3600) / 8  # ~3810


def build_workload(batch_size: int, use_bfloat16: bool = True):
  model_config = configs.ModelConfig(
      num_coarse_samples=128,
      num_fine_samples=128,
      nerf_trunk_depth=8,
      nerf_trunk_width=256,
      nerf_rgb_branch_depth=1,
      nerf_rgb_branch_width=128,
      num_nerf_point_freqs=8,
      num_nerf_viewdir_freqs=4,
      use_warp=True,
      warp_field_type='se3',
      num_warp_freqs=6,
      num_warp_features=8,
      use_appearance_metadata=True,
      use_camera_metadata=True,
      camera_metadata_dims=2,
      sigma_activation=nn.softplus,
      use_stratified_sampling=True,
      use_sample_at_infinity=True,
      # The recommended TPU execution mode: bf16 MXU matmuls (f32 params,
      # f32 compositing) + activation remat. Same workload as the
      # reference's f32 training; quality parity is covered by the bf16
      # fit test in tests/test_bfloat16.py.
      use_bfloat16=use_bfloat16,
  )
  train_config = configs.TrainConfig(
      batch_size=batch_size,
      use_elastic_loss=True,
      elastic_reduce_method='weight',
      elastic_loss_type='log_svals',
      use_background_loss=True,
  )
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=batch_size,
      appearance_ids=tuple(range(16)), camera_ids=(0, 1),
      warp_ids=tuple(range(16)), near=0.1, far=2.0,
      use_warp_jacobian=True, use_weights=True)
  return model, params, train_config


def fake_batch(batch_size: int, bg_points: int = 16384, seed: int = 0):
  rng = np.random.RandomState(seed)
  directions = rng.randn(batch_size, 3).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  return {
      'origins': np.zeros((batch_size, 3), np.float32),
      'directions': directions,
      'rgb': rng.uniform(size=(batch_size, 3)).astype(np.float32),
      'metadata': {
          'warp': rng.randint(0, 16, (batch_size, 1)).astype(np.uint32),
          'camera': rng.randint(0, 2, (batch_size, 1)).astype(np.uint32),
          'appearance': rng.randint(0, 16,
                                    (batch_size, 1)).astype(np.uint32),
          'time': np.zeros((batch_size, 1), np.float32),
      },
      'background_points': rng.randn(bg_points, 3).astype(np.float32),
  }


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--batch_size', type=int, default=6144)
  parser.add_argument('--warmup_steps', type=int, default=3)
  parser.add_argument('--bench_steps', type=int, default=10)
  args = parser.parse_args()

  model, params, train_config = build_workload(args.batch_size)
  mesh = mesh_lib.create_mesh()
  n_chips = jax.device_count()

  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(
      training.create_train_state(params, warp_alpha=6.0),
      mesh_lib.replicated_sharding(mesh))
  scalar_params = training.ScalarParams(
      learning_rate=1e-3, elastic_loss_weight=1e-3,
      background_loss_weight=1.0)
  rng = jax.random.PRNGKey(0)

  batches = [fake_batch(args.batch_size, seed=i)
             for i in range(args.warmup_steps + args.bench_steps)]

  def sync(tree):
    # NOTE: on the axon TPU backend `jax.block_until_ready` returns before
    # execution finishes; a device_get is the only reliable fence.
    for leaf in jax.tree.leaves(tree):
      np.asarray(jax.device_get(leaf))

  for i in range(args.warmup_steps):
    state, stats, _ = step_fn(jax.random.fold_in(rng, i), state, batches[i],
                              scalar_params)
  sync(stats)

  start = time.perf_counter()
  for i in range(args.warmup_steps, args.warmup_steps + args.bench_steps):
    state, stats, _ = step_fn(jax.random.fold_in(rng, i), state, batches[i],
                              scalar_params)
  sync(stats)
  elapsed = time.perf_counter() - start

  steps_per_sec = args.bench_steps / elapsed
  rays_per_sec = steps_per_sec * args.batch_size
  rays_per_sec_per_chip = rays_per_sec / n_chips
  print(json.dumps({
      'metric': 'train_rays_per_sec_per_chip',
      'value': round(rays_per_sec_per_chip, 1),
      'unit': 'rays/s',
      'vs_baseline': round(
          rays_per_sec_per_chip / BASELINE_RAYS_PER_SEC_PER_GPU, 3),
  }))


if __name__ == '__main__':
  main()
