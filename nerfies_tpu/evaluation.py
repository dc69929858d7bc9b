"""Full-image rendering for evaluation and serving.

Capability parity with /root/reference/nerfies/evaluation.py:28-101. The
chunk loop stays host-side, but each chunk is one jitted, mesh-sharded
dispatch (no pmap shard/unshard plumbing): rays are padded to a device
multiple, placed with the batch sharding, and results gathered back as one
array per output.
"""

import math
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from nerfies_tpu.parallel import mesh as mesh_lib


def make_render_fn(model, mesh, use_warp: bool = True) -> Callable:
  """Builds the jitted per-chunk render function.

  Returns a callable (params, rays_dict, warp_extra) -> model output dict,
  with rays sharded over the mesh and everything else replicated.
  """
  data_sharding = mesh_lib.batch_sharding(mesh)
  repl = mesh_lib.replicated_sharding(mesh)

  def model_fn(params, rays_dict, warp_extra, rng):
    # Stratified-sampling models need named rngs even at render time
    # (parity with the reference's key_0/key_1 plumbing, eval.py:330-348).
    key_coarse, key_fine = jax.random.split(rng)
    return model.apply({'params': params}, rays_dict,
                       warp_extra=warp_extra,
                       use_warp=use_warp,
                       rngs={'coarse': key_coarse, 'fine': key_fine})

  jitted = jax.jit(model_fn, in_shardings=(repl, data_sharding, repl, repl),
                   out_shardings=repl)

  def run(params, rays_dict, warp_extra, rng=None):
    if rng is None:
      rng = jax.random.PRNGKey(0)
    rays_dict = mesh_lib.shard_batch(rays_dict, data_sharding)
    return jitted(params, rays_dict, warp_extra, rng)

  return run


def render_image(
    state,
    rays_dict: Dict[str, Any],
    model_fn: Callable,
    rng=None,
    chunk: int = 8192,
    device_multiple: Optional[int] = None,
    default_ret_key: Optional[str] = None) -> Dict[str, np.ndarray]:
  """Renders every pixel of an image in fixed-size ray chunks.

  Args:
    state: TrainState (params + warp alphas).
    rays_dict: (H, W, ...) ray arrays (+ nested 'metadata').
    model_fn: callable from `make_render_fn`.
    rng: PRNG key threaded to the model's named streams (stratified
      models); deterministic models ignore it.
    chunk: rays per dispatch.
    device_multiple: pad each chunk to this multiple (defaults to the
      device count) so shards stay equal-sized.
    default_ret_key: 'fine' or 'coarse'; defaults to the finest level.

  Returns:
    Dict of (H, W, ...) numpy maps: rgb, depth, med_depth, acc.
  """
  if rng is None:
    rng = jax.random.PRNGKey(0)
  if device_multiple is None:
    device_multiple = jax.device_count()
  h, w = rays_dict['origins'].shape[:2]
  num_rays = h * w
  rays_dict = jax.tree.map(
      lambda x: x.reshape((num_rays, x.shape[-1])), rays_dict)

  # The chunk loop never blocks: every dispatch is async, per-chunk outputs
  # (a few floats per ray) stay on device, and one device_get at the end
  # fetches everything. Chunk k+1's H2D transfer and compute therefore
  # overlap chunk k's execution instead of serializing on a host round-trip
  # per chunk (the reference's pmap loop synced every 8192 rays).
  device_rets = []
  paddings = []
  num_batches = int(math.ceil(num_rays / chunk))
  start_time = time.time()
  for batch_idx in range(num_batches):
    ray_idx = batch_idx * chunk
    chunk_rays = jax.tree.map(
        lambda x: x[ray_idx:ray_idx + chunk], rays_dict)
    num_chunk_rays = chunk_rays['origins'].shape[0]
    padding = mesh_lib.pad_to_multiple(num_chunk_rays, device_multiple)
    if padding:
      chunk_rays = jax.tree.map(
          lambda x: np.pad(x, ((0, padding), (0, 0)), mode='edge'),
          chunk_rays)
    model_out = model_fn(state.params, chunk_rays, state.warp_extra, rng)
    ret_key = default_ret_key or ('fine' if 'fine' in model_out else 'coarse')
    device_rets.append(model_out[ret_key])
    paddings.append(padding)
  ret_maps = []
  for ret_map, padding in zip(jax.device_get(device_rets), paddings):
    if padding:
      ret_map = jax.tree.map(lambda x: x[:x.shape[0] - padding], ret_map)
    ret_maps.append(ret_map)
  elapsed = time.time() - start_time

  out = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *ret_maps)
  out = {k: v.reshape((h, w, *v.shape[1:])) for k, v in out.items()}
  out['render_time'] = elapsed
  out['rays_per_sec'] = num_rays / max(elapsed, 1e-9)
  return out
