"""One-process TPU profiling: bisect the train-step cost. Internal tool."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import bench as B
from nerfies_tpu import training
from nerfies_tpu.parallel import mesh as mesh_lib


def sync(tree):
  for leaf in jax.tree.leaves(tree):
    np.asarray(jax.device_get(leaf)).sum()


def timeit(name, f, *a, n=3):
  t0 = time.perf_counter()
  r = f(*a)
  sync(r)
  print(f'{name}: first (compile+run) {time.perf_counter()-t0:.1f}s',
        flush=True)
  t0 = time.perf_counter()
  for _ in range(n):
    r = f(*a)
  sync(r)
  dt = (time.perf_counter() - t0) / n
  print(f'{name}: steady {dt*1000:.1f} ms', flush=True)
  return dt


def main():
  batch_size = 2048
  model, params, train_config = B.build_workload(batch_size)
  b = jax.tree.map(jnp.asarray, B.fake_batch(batch_size))
  rng = jax.random.PRNGKey(0)
  warp_extra = {'alpha': jnp.asarray(6.0), 'time_alpha': jnp.asarray(0.0)}

  print(f'devices: {jax.devices()}', flush=True)

  # 1. Forward only.
  fwd = jax.jit(lambda p, batch: model.apply(
      {'params': p}, batch, warp_extra=warp_extra,
      rngs={'coarse': rng, 'fine': rng})['fine']['rgb'].sum())
  timeit('fwd', fwd, params, b)

  # 2. Forward with jacobian.
  fwd_jac = jax.jit(lambda p, batch: model.apply(
      {'params': p}, batch, warp_extra=warp_extra,
      return_warp_jacobian=True, return_weights=True,
      rngs={'coarse': rng, 'fine': rng})['coarse']['warp_jacobian'].sum())
  timeit('fwd+jac', fwd_jac, params, b)

  # 3. Gradient of the rgb loss only.
  def rgb_loss(p, batch):
    out = model.apply({'params': p}, batch, warp_extra=warp_extra,
                      rngs={'coarse': rng, 'fine': rng})
    return (((out['fine']['rgb'] - batch['rgb']) ** 2).mean()
            + ((out['coarse']['rgb'] - batch['rgb']) ** 2).mean())
  grad_rgb = jax.jit(
      lambda p, batch: jax.tree.leaves(jax.grad(rgb_loss)(p, batch))[0].sum())
  timeit('grad rgb', grad_rgb, params, b)

  # 4. Full train step (all losses).
  mesh = mesh_lib.create_mesh()
  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(training.create_train_state(params, warp_alpha=6.0),
                         mesh_lib.replicated_sharding(mesh))
  sp = training.ScalarParams(learning_rate=1e-3, elastic_loss_weight=1e-3,
                             background_loss_weight=1.0)
  nb = B.fake_batch(batch_size)

  t0 = time.perf_counter()
  state, stats, _ = step_fn(rng, state, nb, sp)
  sync(stats)
  print(f'full step: first (compile+run) {time.perf_counter()-t0:.1f}s',
        flush=True)
  t0 = time.perf_counter()
  n = 5
  for i in range(n):
    state, stats, _ = step_fn(jax.random.fold_in(rng, i), state,
                              B.fake_batch(batch_size, seed=i), sp)
  sync(stats)
  print(f'full step: steady {(time.perf_counter()-t0)/n*1000:.1f} ms',
        flush=True)

  # 5. Full step at the quarter-HD batch (remat should make it fit).
  model6, params6, tc6 = B.build_workload(6144)
  step6 = training.compile_train_step(model6, tc6, mesh)
  state6 = jax.device_put(
      training.create_train_state(params6, warp_alpha=6.0),
      mesh_lib.replicated_sharding(mesh))
  t0 = time.perf_counter()
  state6, stats6, _ = step6(rng, state6, B.fake_batch(6144), sp)
  sync(stats6)
  print(f'full step b6144: first {time.perf_counter()-t0:.1f}s', flush=True)
  t0 = time.perf_counter()
  for i in range(n):
    state6, stats6, _ = step6(jax.random.fold_in(rng, i), state6,
                              B.fake_batch(6144, seed=i), sp)
  sync(stats6)
  dt = (time.perf_counter() - t0) / n
  print(f'full step b6144: steady {dt*1000:.1f} ms '
        f'-> {6144/dt:.0f} rays/s/chip', flush=True)


if __name__ == '__main__':
  main()
