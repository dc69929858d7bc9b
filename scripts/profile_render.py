"""End-to-end render_image throughput at several chunk sizes. Internal."""

import pathlib
import sys

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import flax.linen as nn  # noqa: E402
from nerfies_tpu import configs  # noqa: E402
from nerfies_tpu import evaluation  # noqa: E402
from nerfies_tpu import training  # noqa: E402
from nerfies_tpu.models import nerf  # noqa: E402
from nerfies_tpu.parallel import mesh as mesh_lib  # noqa: E402


def main():
  config = configs.ModelConfig(
      num_coarse_samples=128, num_fine_samples=128,
      nerf_trunk_depth=8, nerf_trunk_width=256,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=128,
      num_nerf_point_freqs=8, num_nerf_viewdir_freqs=4,
      use_warp=True, warp_field_type='se3', num_warp_freqs=6,
      num_warp_features=8, use_camera_metadata=True,
      sigma_activation=nn.softplus, use_stratified_sampling=False,
      use_bfloat16=True)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=8192,
      appearance_ids=(0,), camera_ids=(0, 1), warp_ids=tuple(range(8)),
      near=0.1, far=2.0)
  mesh = mesh_lib.create_mesh()
  state = training.create_train_state(params, warp_alpha=6.0)

  h = w = 512
  rng = np.random.RandomState(0)
  d = rng.randn(h, w, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  rays = {
      'origins': np.zeros((h, w, 3), np.float32),
      'directions': d,
      'metadata': {
          'warp': np.zeros((h, w, 1), np.uint32),
          'camera': np.zeros((h, w, 1), np.uint32),
          'appearance': np.zeros((h, w, 1), np.uint32),
          'time': np.zeros((h, w, 1), np.float32),
      },
  }
  render_fn = evaluation.make_render_fn(model, mesh)
  for chunk in (4096, 8192, 16384):
    evaluation.render_image(state, rays, render_fn, chunk=chunk)  # warm
    out = evaluation.render_image(state, rays, render_fn, chunk=chunk)
    rps = out['rays_per_sec']
    print(f'chunk={chunk}: {rps / 1e3:.1f}k rays/s/chip, '
          f'1080p frame in {2073600 / rps:.1f}s', flush=True)


if __name__ == '__main__':
  main()
