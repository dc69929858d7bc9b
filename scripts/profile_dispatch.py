"""Dispatch-overhead + batch-scaling probe for the render path. Internal."""

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


def sync(tree):
  for leaf in jax.tree.leaves(tree):
    np.asarray(jax.device_get(leaf))


def main():
  # 1) Raw dispatch overhead: trivial kernel round-trip.
  x = jnp.zeros((8, 128), jnp.float32)
  f = jax.jit(lambda x: x + 1.0)
  sync(f(x))
  t0 = time.perf_counter()
  n = 20
  for _ in range(n):
    x = f(x)
  sync(x)
  print(f'trivial dispatch+sync: {(time.perf_counter()-t0)/n*1000:.1f} ms',
        flush=True)

  # async chain of 20 dispatches, one sync at the end
  t0 = time.perf_counter()
  for _ in range(n):
    x = f(x)
  sync(x)
  print(f'async chain avg: {(time.perf_counter()-t0)/n*1000:.1f} ms',
        flush=True)

  # 2) Pure MLP batch scaling (the render hot path without warp/sampling).
  w = [jax.random.normal(jax.random.PRNGKey(i), (256, 256), jnp.bfloat16)
       for i in range(8)]

  def mlp(ws, x):
    h = x
    for wi in ws:
      h = jax.nn.relu(h @ wi)
    return jnp.sum(h, axis=-1)

  jmlp = jax.jit(mlp)
  for rows in (1 << 18, 1 << 20, 1 << 22):
    xs = jax.random.normal(jax.random.PRNGKey(0), (rows, 256), jnp.bfloat16)
    sync(jmlp(w, xs))
    t0 = time.perf_counter()
    k = 10
    for _ in range(k):
      out = jmlp(w, xs)
    sync(out)
    dt = (time.perf_counter() - t0) / k
    flops = rows * 8 * 2 * 256 * 256
    print(f'mlp rows={rows}: {dt*1000:.2f} ms  {flops/dt/1e12:.1f} TF/s',
          flush=True)

  # 3) Full render model, batch scaling.
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
      jax.random.PRNGKey(0), config, batch_size=1024,
      appearance_ids=(0,), camera_ids=(0, 1), warp_ids=tuple(range(8)),
      near=0.1, far=2.0)
  warp_extra = {'alpha': jnp.asarray(6.0), 'time_alpha': jnp.asarray(0.0)}
  fn = jax.jit(lambda p, r: model.apply({'params': p}, r,
                                        warp_extra=warp_extra))
  for batch in (8192, 32768, 65536):
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
    try:
      sync(fn(params, rays))
      t0 = time.perf_counter()
      k = 5
      for _ in range(k):
        out = fn(params, rays)
      sync(out)
      dt = (time.perf_counter() - t0) / k
      print(f'render batch={batch}: {dt*1000:.1f} ms '
            f'-> {batch/dt/1e3:.1f}k rays/s '
            f'-> 1080p in {2073600/(batch/dt):.1f}s', flush=True)
    except Exception as e:
      print(f'render batch={batch}: FAILED {type(e).__name__}: '
            f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
  main()
