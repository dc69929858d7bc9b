"""Render-path component bisect at eval config. Internal."""

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
from nerfies_tpu.models import nerf  # noqa: E402
from nerfies_tpu.ops import encoding  # noqa: E402
from nerfies_tpu.ops import rendering as rnd  # noqa: E402


def sync(tree):
  for leaf in jax.tree.leaves(tree):
    np.asarray(jax.device_get(leaf))


def bench(name, fn, *args, n=5):
  # Reduce outputs on device so sync doesn't fetch huge arrays through
  # the tunnel.
  inner = fn
  fn = jax.jit(lambda *a: jax.tree.map(
      lambda x: jnp.sum(jnp.asarray(x, jnp.float32)), inner(*a)))
  try:
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
      out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1000:.1f} ms', flush=True)
    return dt
  except Exception as e:
    print(f'{name}: FAILED {type(e).__name__}: {str(e)[:200]}', flush=True)
    return None


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
  warp_extra = {'alpha': jnp.asarray(6.0), 'time_alpha': jnp.asarray(0.0)}

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
  S = 256  # coarse+fine points per ray total workload equivalent
  pts = jnp.asarray(rng.randn(batch, S, 3).astype(np.float32))
  z = jnp.broadcast_to(jnp.linspace(0.1, 2.0, S)[None], (batch, S))

  # full forward
  fn = (lambda p, r: model.apply({'params': p}, r,
                                        warp_extra=warp_extra))
  total = bench('full render (coarse128+fine128)', fn, params, rays)

  # warp field alone on the equivalent point count
  def warp_only(p, pts_):
    out = model.apply({'params': p}, pts_,
                      jnp.zeros((batch, 1), jnp.uint32), warp_extra,
                      False, False, method=model.apply_warp)
    return out['warped_points']
  bench('warp field alone (256 pts/ray)', jax.jit(warp_only), params, pts)

  # PE alone
  bench('posenc alone (256 pts/ray, 8 freqs)',
        jax.jit(lambda x: encoding.posenc(x, num_freqs=8)), pts)

  # NerfMLP alone (through model.render_samples minus warp): approximate by
  # calling the mlp submodule via apply on precomputed PE.
  pe = encoding.posenc(pts, num_freqs=8)

  def mlp_only(p, x):
    mdl = model.nerf_mlps_cls if hasattr(model, 'nerf_mlps_cls') else None
    del mdl
    return model.apply(
        {'params': p}, 'coarse', pts, z, rays['directions'],
        rays['directions'], rays['metadata'], warp_extra, False, False,
        False, False, False, method=model.render_samples)
  bench('render_samples coarse, no warp (256 samples)',
        jax.jit(mlp_only), params, pe)

  # sampling machinery alone
  def sampling_only(weights):
    zc, _ = rnd.sample_along_rays(None, rays['origins'], rays['directions'],
                                  128, 0.1, 2.0, False, False)
    zm = 0.5 * (zc[..., 1:] + zc[..., :-1])
    zf, ptsf = rnd.sample_pdf(None, zm, weights, rays['origins'],
                              rays['directions'], zc, 128, False)
    return zf, ptsf
  w = jnp.abs(jnp.asarray(rng.randn(batch, 126).astype(np.float32)))
  bench('sampling (stratified + pdf inversion)', jax.jit(sampling_only), w)

  # compositing alone
  rgb = jnp.asarray(rng.rand(batch, S, 3).astype(np.float32))
  sg = jnp.abs(jnp.asarray(rng.randn(batch, S).astype(np.float32)))
  bench('volumetric_rendering alone',
        jax.jit(lambda r_, s_: rnd.volumetric_rendering(
            r_, s_, z, rays['directions'], use_white_background=False,
            sample_at_infinity=True, return_weights=True)), rgb, sg)

  if total:
    print(f'-> full render = {total*1000:.1f} ms', flush=True)


if __name__ == '__main__':
  main()
