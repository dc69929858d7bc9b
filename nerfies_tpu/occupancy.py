"""Occupancy-grid empty-space skipping for the serving render path.

Classic NeRF serving accelerators cull samples with dynamically-shaped
gathers (keep exactly the occupied samples of each ray), which XLA/TPU
cannot compile: every shape under `jit` is static. This module is the
TPU-native formulation:

  * The scene's density field is baked into a dense boolean voxel grid
    over the CANONICAL frame (the space the NeRF MLP consumes — sample
    points are queried after the warp field, so one grid covers every
    frame/time of a dynamic capture).
  * At render time each ray still proposes the full ladder of S
    stratified candidates, but only a FIXED number K of them — the
    first K occupied candidates in depth order — are evaluated by the
    NeRF MLP. The selection is a stable argsort on the occupancy bit
    (ties keep depth order), i.e. a static-shape top-K: no dynamic
    shapes, no host round-trips, MXU batch intact at (B, K).
  * Dropped candidates sit in voxels whose baked density is below the
    threshold, so compositing over the kept subset — with each kept
    sample keeping its ORIGINAL ladder spacing (`rendering.ladder_dists`
    gathered through `gather_samples`) and the final background-shell
    sample always kept — is exact up to the threshold's transmittance
    contribution (the grid is dilated one voxel to be conservative at
    surface boundaries).

The reference has no analog (its eval marches every sample of every ray,
eval.py:330-353); this exists for the <1 s / 1080p serving north star.
See docs/PERFORMANCE.md for measured speed/quality numbers.
"""

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class OccupancyGrid:
  """Boolean voxel grid over an axis-aligned box in canonical space.

  Attributes:
    occupied: (R, R, R) bool — True where the baked density exceeded the
      build threshold (after one step of 3^3 max-pool dilation).
    bbox_min: (3,) f32 lower corner.
    bbox_max: (3,) f32 upper corner.
  """
  occupied: jnp.ndarray
  bbox_min: jnp.ndarray
  bbox_max: jnp.ndarray

  @property
  def resolution(self) -> int:
    return self.occupied.shape[0]

  def tree_flatten(self):
    return (self.occupied, self.bbox_min, self.bbox_max), None

  @classmethod
  def tree_unflatten(cls, aux, children):
    del aux
    return cls(*children)

  def query(self, points: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) points -> (...) bool occupancy.

    Points outside the box clamp to the boundary voxel — the box should
    cover the whole visible domain, and clamping errs on whatever the
    boundary voxel says rather than silently culling geometry that a
    too-small box pushed outside.
    """
    r = self.resolution
    scale = r / (self.bbox_max - self.bbox_min)
    idx = jnp.clip(
        ((points - self.bbox_min) * scale).astype(jnp.int32), 0, r - 1)
    flat = (idx[..., 0] * r + idx[..., 1]) * r + idx[..., 2]
    # 1-D take of a flat (R^3,) table: a plain vectorized gather on TPU.
    return jnp.take(self.occupied.reshape(-1), flat, axis=0)


def build_grid(sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
               bbox_min,
               bbox_max,
               resolution: int = 128,
               sigma_threshold: float = 0.01,
               dilate: bool = True,
               chunk: int = 262144) -> OccupancyGrid:
  """Bakes a density field into an OccupancyGrid.

  Args:
    sigma_fn: (N, 3) canonical points -> (N,) post-activation densities.
      For a trained model use `sigma_fn_from_params`. Evaluated at voxel
      centers in chunks.
    bbox_min / bbox_max: canonical-space box to bake; must cover every
      point the render can produce (e.g. [-far, far]^3 for centered
      captures — see `Camera`/scene normalization in capture.py).
    resolution: voxels per axis (R^3 total queries).
    sigma_threshold: voxels with sigma <= threshold are empty. At the
      quarter-HD ladder (delta ~ (far-near)/256) a threshold t leaks at
      most alpha ~ t*delta per skipped sample.
    dilate: one step of 3^3 max-pool so surfaces straddling a voxel
      boundary keep their neighbors (conservative culling).
    chunk: grid points per sigma_fn call.

  Returns:
    OccupancyGrid (device arrays).
  """
  r = resolution
  bbox_min = jnp.asarray(bbox_min, jnp.float32)
  bbox_max = jnp.asarray(bbox_max, jnp.float32)
  cell = (bbox_max - bbox_min) / r
  axes = [np.arange(r, dtype=np.float32) + 0.5 for _ in range(3)]
  grid = np.stack(np.meshgrid(*axes, indexing='ij'), axis=-1)  # (R,R,R,3)
  centers = grid.reshape(-1, 3) * np.asarray(cell) + np.asarray(bbox_min)

  sigmas = []
  for lo in range(0, centers.shape[0], chunk):
    sigmas.append(np.asarray(
        jax.device_get(sigma_fn(jnp.asarray(centers[lo:lo + chunk])))))
  sigma = np.concatenate(sigmas).reshape(r, r, r)
  occupied = jnp.asarray(sigma > sigma_threshold)
  if dilate:
    occupied = jax.lax.reduce_window(
        occupied, False, jax.lax.bitwise_or,
        window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
        padding='SAME')
  return OccupancyGrid(occupied=occupied, bbox_min=bbox_min,
                       bbox_max=bbox_max)


def sigma_fn_from_params(params, model, level: str = 'fine',
                         interpret: bool = False):
  """Density query of a trained NerfModel at raw canonical points.

  Uses the fused serving kernel (fast_render path) on the given MLP
  level; conditions do not affect sigma unless the model has an
  alpha condition, in which case the zero-id appearance code is used
  (appearance modulates shading far more than geometry).
  """
  from nerfies_tpu.ops import encoding
  from nerfies_tpu.ops import fused_mlp

  mlp_params = params[f'nerf_mlps_{level}']
  width = mlp_params['trunk_hidden_0']['kernel'].shape[1]

  @jax.jit
  def sigma_fn(points):
    pe = encoding.posenc(points[:, None, :],
                         num_freqs=model.num_nerf_point_freqs)
    alpha, _ = fused_mlp.nerf_mlp_forward(
        pe.reshape(points.shape[0], -1).astype(jnp.bfloat16), None,
        mlp_params, trunk_depth=model.nerf_trunk_depth,
        skips=tuple(model.nerf_skips), interpret=interpret)
    raw_sigma = alpha[:, 0]
    if model.use_alpha_condition and 'appearance_encoder' in params:
      code = params['appearance_encoder']['embed']['embedding'][:1]
      alpha_k = mlp_params['alpha_logit']['kernel']
      raw_sigma = raw_sigma + (
          code.astype(jnp.bfloat16)
          @ alpha_k[width:].astype(jnp.bfloat16)).astype(jnp.float32)[0, 0]
    return model.sigma_activation(raw_sigma)

  return sigma_fn


def select_occupied(occ: jnp.ndarray,
                    z_vals: jnp.ndarray,
                    k: int,
                    keep_last: bool = True) -> jnp.ndarray:
  """Indices of the first k occupied samples per ray, in depth order.

  Args:
    occ: (B, S) bool/int occupancy of each candidate sample.
    z_vals: (B, S) — only for the doc contract; ordering is positional
      (candidates are assumed depth-sorted, as sample_along_rays emits).
    k: static number of samples to keep (k <= S).
    keep_last: always include index S-1 (the sample-at-infinity
      background shell, which compositing treats specially) and pick the
      first k-1 occupied among the rest.

  Returns:
    (B, k) int32 indices into the sample axis, ascending in depth. Rays
    with fewer than k occupied samples pad with their leading empty
    candidates (harmless: their density is sub-threshold by
    construction).
  """
  del z_vals
  s = occ.shape[-1]
  if k >= s:
    return jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32),
                            occ.shape).astype(jnp.int32)
  # Stable sort on the (negated) occupancy bit: occupied candidates come
  # first, and ties preserve depth order.
  if keep_last:
    order = jnp.argsort(-occ[..., :-1].astype(jnp.int32), axis=-1,
                        stable=True)
    head = order[..., :k - 1]
    last = jnp.full(occ.shape[:-1] + (1,), s - 1, head.dtype)
    return jnp.sort(jnp.concatenate([head, last], axis=-1),
                    axis=-1).astype(jnp.int32)
  order = jnp.argsort(-occ.astype(jnp.int32), axis=-1, stable=True)
  return jnp.sort(order[..., :k], axis=-1).astype(jnp.int32)


def gather_samples(z_vals: jnp.ndarray, points: jnp.ndarray,
                   idx: jnp.ndarray,
                   dists: Optional[jnp.ndarray] = None):
  """Gathers (B, S) z_vals / (B, S, 3) points [/ (B, S) dists] to (B, K).

  `dists` should be the FULL ladder's spacings (rendering.ladder_dists):
  kept samples must composite with their original spacing, not the
  distance to the next kept sample, for the culled render to match the
  full one wherever dropped densities are ~0.
  """
  z_k = jnp.take_along_axis(z_vals, idx, axis=-1)
  pts_k = jnp.take_along_axis(points, idx[..., None], axis=-2)
  if dists is None:
    return z_k, pts_k
  return z_k, pts_k, jnp.take_along_axis(dists, idx, axis=-1)
