"""Render-path benchmark: fused Pallas kernel vs unfused XLA. Internal."""

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import flax.linen as nn  # noqa: E402
from nerfies_tpu import configs  # noqa: E402
from nerfies_tpu import evaluation  # noqa: E402
from nerfies_tpu.models import nerf  # noqa: E402
from nerfies_tpu.parallel import mesh as mesh_lib  # noqa: E402


def sync(tree):
  for leaf in jax.tree.leaves(tree):
    np.asarray(jax.device_get(leaf))


def main():
  batch = 8192
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
      jax.random.PRNGKey(0), config, batch_size=batch,
      appearance_ids=(0,), camera_ids=(0, 1), warp_ids=tuple(range(8)),
      near=0.1, far=2.0)

  rng = np.random.RandomState(0)
  d = rng.randn(batch, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  rays = {
      'origins': jnp.zeros((batch, 3), jnp.float32),
      'directions': jnp.asarray(d),
      'metadata': {
          'warp': jnp.zeros((batch, 1), jnp.uint32),
          'camera': jnp.zeros((batch, 1), jnp.uint32),
          'appearance': jnp.zeros((batch, 1), jnp.uint32),
          'time': jnp.zeros((batch, 1), jnp.float32),
      },
  }
  warp_extra = {'alpha': jnp.asarray(6.0), 'time_alpha': jnp.asarray(0.0)}
  key = jax.random.PRNGKey(0)

  from nerfies_tpu.ops.pallas import raymarch as rm

  def flat_pipeline(p, r, tile_n):
    from nerfies_tpu.ops import rendering as rnd
    origins, directions_, metadata = r['origins'], r['directions'], r['metadata']
    _, _, rgb_cond = model.apply({'params': p}, directions_, metadata, False,
                                 method=model.get_condition_inputs)
    def warp_pts(pts):
      out = model.apply({'params': p}, pts, metadata['warp'], warp_extra,
                        False, False, method=model.apply_warp)
      return out['warped_points']
    kw = dict(num_freqs=model.num_nerf_point_freqs,
              trunk_depth=model.nerf_trunk_depth, skips=tuple(model.nerf_skips),
              rgb_branch_depth=model.nerf_rgb_branch_depth,
              sigma_activation='softplus', sample_at_infinity=True,
              tile_n=tile_n, use_bfloat16=True)
    z, pts = rnd.sample_along_rays(None, origins, directions_,
                                   model.num_coarse_samples, model.near,
                                   model.far, False, False)
    coarse = rm.fused_mlp_level(p['nerf_mlps_coarse'], warp_pts(pts), z,
                                directions_, rgb_cond, return_weights=True,
                                **kw)
    zm = 0.5 * (z[..., 1:] + z[..., :-1])
    z, pts = rnd.sample_pdf(None, zm, coarse['weights'][..., 1:-1], origins,
                            directions_, z, model.num_fine_samples, False)
    fine = rm.fused_mlp_level(p['nerf_mlps_fine'], warp_pts(pts), z,
                              directions_, rgb_cond, **kw)
    return {'fine': fine}

  for name, mode, tile_b, tile_s in (
      ('flat tn=4096', 'flat', 4096, 0),
      ('flat tn=8192', 'flat', 8192, 0),
      ('fused3d tb=64 ts=128', 'fused', 64, 128),
      ('unfused', 'xla', 0, 0),
  ):
    if mode == 'fused':
      fn = jax.jit(lambda p, r: evaluation.fused_render_rays(
          model, p, r, warp_extra, tile_b=tile_b, tile_s=tile_s))
    elif mode == 'flat':
      fn = jax.jit(lambda p, r, tn=tile_b: flat_pipeline(p, r, tn))
    else:
      def unfused(p, r):
        return model.apply({'params': p}, r, warp_extra=warp_extra)
      fn = jax.jit(unfused)
    try:
      t0 = time.perf_counter()
      out = fn(params, rays)
      sync(out)
      print(f'{name}: first {time.perf_counter()-t0:.1f}s', flush=True)
      t0 = time.perf_counter()
      n = 5
      for _ in range(n):
        out = fn(params, rays)
      sync(out)
      dt = (time.perf_counter() - t0) / n
      print(f'{name}: steady {dt*1000:.1f} ms -> {batch/dt/1e3:.1f}k rays/s'
            f' -> 1080p frame in {2073600 / (batch/dt):.2f}s', flush=True)
    except Exception as e:
      print(f'{name}: FAILED {type(e).__name__}: {str(e)[:300]}', flush=True)


if __name__ == '__main__':
  main()
