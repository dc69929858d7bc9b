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

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfies_tpu.ops import rendering
from nerfies_tpu.ops.pallas import raymarch
from nerfies_tpu.parallel import mesh as mesh_lib


def _sigma_activation_name(fn) -> str:
  if fn is nn.softplus:
    return 'softplus'
  if fn is nn.relu:
    return 'relu'
  raise ValueError(
      f'Fused ray-march supports relu/softplus sigma, got {fn}')


def fused_render_rays(model, params, rays_dict, warp_extra,
                      use_warp: bool = True, tile_b: int = 64,
                      tile_s=None, interpret: bool = False):
  """Full coarse+fine render through the fused Pallas ray-march kernel.

  Deterministic (eval) sampling. The warp field and condition embeddings
  run as (cheap) XLA ops; the NeRF MLP + compositing hot path runs fused.
  Requires batch % tile_b == 0 and relu/softplus sigma activations.
  """
  origins = rays_dict['origins']
  directions = rays_dict['directions']
  metadata = rays_dict['metadata']
  viewdirs = rays_dict.get('viewdirs', directions)
  use_warp = use_warp and model.use_warp

  trunk_cond, alpha_cond, rgb_cond = model.apply(
      {'params': params}, viewdirs, metadata, False,
      method=model.get_condition_inputs)
  if trunk_cond is not None or alpha_cond is not None:
    raise ValueError('Fused ray-march supports rgb conditions only.')

  def warp_points(points):
    if not use_warp:
      return points
    warp_metadata = (metadata['time']
                     if model.warp_metadata_encoder_type == 'time'
                     else metadata['warp'])
    out = model.apply({'params': params}, points, warp_metadata,
                      warp_extra, False, False, method=model.apply_warp)
    return out['warped_points']

  kernel_kwargs = dict(
      num_freqs=model.num_nerf_point_freqs,
      trunk_depth=model.nerf_trunk_depth,
      skips=tuple(model.nerf_skips),
      rgb_branch_depth=model.nerf_rgb_branch_depth,
      sigma_activation=_sigma_activation_name(model.sigma_activation),
      use_white_background=model.use_white_background,
      sample_at_infinity=model.use_sample_at_infinity,
      tile_b=tile_b,
      tile_s=tile_s,
      use_bfloat16=model.use_bfloat16,
      interpret=interpret,
  )

  z_vals, points = rendering.sample_along_rays(
      None, origins, directions, model.num_coarse_samples, model.near,
      model.far, False, model.use_linear_disparity)
  points = warp_points(points)
  coarse = raymarch.fused_render_level(
      params['nerf_mlps_coarse'], points, z_vals, directions, rgb_cond,
      return_weights=model.num_fine_samples > 0, **kernel_kwargs)
  out = {'coarse': coarse}

  if model.num_fine_samples > 0:
    z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_vals, points = rendering.sample_pdf(
        None, z_vals_mid, coarse['weights'][..., 1:-1], origins,
        directions, z_vals, model.num_fine_samples, False)
    points = warp_points(points)
    out['fine'] = raymarch.fused_render_level(
        params['nerf_mlps_fine'], points, z_vals, directions, rgb_cond,
        **kernel_kwargs)
    del out['coarse']['weights']
  return out


def make_render_fn(model, mesh, use_warp: bool = True,
                   use_fused: Optional[bool] = None) -> Callable:
  """Builds the jitted per-chunk render function.

  Returns a callable (params, rays_dict, warp_extra) -> model output dict,
  with rays sharded over the mesh and everything else replicated. With
  `use_fused` (defaults to the model's `use_fused_raymarch`) the NeRF
  MLP + compositing path runs as the fused Pallas kernel.
  """
  if use_fused is None:
    use_fused = getattr(model, 'use_fused_raymarch', False)
  data_sharding = mesh_lib.batch_sharding(mesh)
  repl = mesh_lib.replicated_sharding(mesh)

  def model_fn(params, rays_dict, warp_extra, rng):
    if use_fused:
      return fused_render_rays(model, params, rays_dict, warp_extra,
                               use_warp=use_warp)
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
    # Multiple of 8 keeps partial chunks compatible with the fused
    # ray-march's minimum (sublane-height) ray tile.
    device_multiple = math.lcm(jax.device_count(), 8)
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
