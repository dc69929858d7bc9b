"""Volumetric rendering math: ray sampling, compositing, depth maps.

Behavior-parity with /root/reference/nerfies/model_utils.py:36-304, written
as standalone batched functions. All shapes are static; random sampling
takes explicit PRNG keys.
"""

from typing import Optional

import jax
from jax import lax
from jax import random
import jax.numpy as jnp


def sample_along_rays(key: Optional[jax.Array], origins: jnp.ndarray,
                      directions: jnp.ndarray, num_samples: int, near: float,
                      far: float, use_stratified_sampling: bool,
                      use_linear_disparity: bool):
  """Stratified (or uniform) depth sampling along rays.

  Parity: reference model_utils.py:36-73.

  Args:
    key: PRNG key (required when use_stratified_sampling).
    origins: (B, 3) ray origins.
    directions: (B, 3) ray directions.
    num_samples: samples per ray S.
    near / far: clip range.
    use_stratified_sampling: jitter samples within strata.
    use_linear_disparity: sample linearly in 1/z instead of z.

  Returns:
    z_vals: (B, S) sample depths.
    points: (B, S, 3) sample positions.
  """
  batch_size = origins.shape[0]
  t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=origins.dtype)
  if not use_linear_disparity:
    z_vals = near * (1.0 - t_vals) + far * t_vals
  else:
    z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
  if use_stratified_sampling:
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t_rand = random.uniform(key, [batch_size, num_samples],
                            dtype=origins.dtype)
    z_vals = lower + (upper - lower) * t_rand
  else:
    z_vals = jnp.broadcast_to(z_vals[None, ...], [batch_size, num_samples])

  points = (origins[..., None, :] +
            z_vals[..., :, None] * directions[..., None, :])
  return z_vals, points


def ladder_dists(z_vals: jnp.ndarray,
                 sample_at_infinity: bool) -> jnp.ndarray:
  """Per-sample depth spacings of a sorted ladder (pre-|dirs| scaling)."""
  last_sample_z = 1e10 if sample_at_infinity else 1e-19
  return jnp.concatenate([
      z_vals[..., 1:] - z_vals[..., :-1],
      jnp.broadcast_to(jnp.asarray([last_sample_z], dtype=z_vals.dtype),
                       z_vals[..., :1].shape)
  ], -1)


def volumetric_rendering(rgb: jnp.ndarray,
                         sigma: jnp.ndarray,
                         z_vals: jnp.ndarray,
                         dirs: jnp.ndarray,
                         use_white_background: bool,
                         sample_at_infinity: bool = True,
                         return_weights: bool = False,
                         eps: float = 1e-10,
                         dists: Optional[jnp.ndarray] = None):
  """Alpha compositing of per-sample radiance/density into pixels.

  Parity: reference model_utils.py:76-136 (including the exclusive-cumprod
  epsilon and the sample-at-infinity handling of `acc`).

  Args:
    rgb: (B, S, 3) per-sample colors.
    sigma: (B, S) per-sample densities.
    z_vals: (B, S) sample depths.
    dirs: (B, 3) ray directions (NOT necessarily unit norm).
    use_white_background: composite onto white.
    sample_at_infinity: treat the final sample as a background shell.
    return_weights: include per-sample weights in the output.
    eps: cumprod stabilization epsilon.
    dists: optional (B, S) per-sample depth spacings overriding the
      default next-neighbor differences — used by the occupancy-culled
      render, whose kept samples must keep their ORIGINAL ladder
      spacing for compositing to match the full ladder (occupancy.py).
      Scaled by |dirs| here either way.

  Returns:
    dict with 'rgb' (B,3), 'depth' (B,), 'med_depth' (B,), 'acc' (B,)
    [, 'weights' (B,S)].
  """
  if dists is None:
    dists = ladder_dists(z_vals, sample_at_infinity)
  dists = dists * jnp.linalg.norm(dirs, axis=-1, keepdims=True)
  alpha = 1.0 - jnp.exp(-sigma * dists)
  trans = jnp.concatenate([
      jnp.ones_like(alpha[..., :1]),
      jnp.cumprod(1.0 - alpha[..., :-1] + eps, axis=-1),
  ], axis=-1)
  weights = alpha * trans

  out_rgb = (weights[..., None] * rgb).sum(axis=-2)
  exp_depth = (weights * z_vals).sum(axis=-1)
  med_depth = compute_depth_map(weights, z_vals)
  acc = weights.sum(axis=-1)
  if use_white_background:
    out_rgb = out_rgb + (1.0 - acc[..., None])

  if sample_at_infinity:
    acc = weights[..., :-1].sum(axis=-1)

  out = {
      'rgb': out_rgb,
      'depth': exp_depth,
      'med_depth': med_depth,
      'acc': acc,
  }
  if return_weights:
    out['weights'] = weights
  return out


def piecewise_constant_pdf(key: Optional[jax.Array], bins: jnp.ndarray,
                           weights: jnp.ndarray, num_samples: int,
                           use_stratified_sampling: bool) -> jnp.ndarray:
  """Inverse-CDF sampling from a piecewise-constant ray density.

  Behavior parity with reference model_utils.py:139-187 (same epsilon
  regularization, same degenerate-bin handling), built for the TPU vector
  and matrix units: the containing bin is located by counting edges with
  cdf <= u (one vectorized compare+reduce; `searchsorted`'s binary search
  lowers to a serial while-loop on TPU, measured 27x slower), and the four
  per-bin lookups run as a single one-hot batched matmul on the MXU
  (dynamic `take_along_axis` gathers are ~9x slower).

  Args:
    key: PRNG key.
    bins: (B, n_bins + 1) bin edges (sorted).
    weights: (B, n_bins) unnormalized bin masses.
    num_samples: number of new samples.
    use_stratified_sampling: random u's vs uniform grid.

  Returns:
    (B, num_samples) sampled depths (gradients stopped).
  """
  eps = 1e-5
  num_bins = weights.shape[-1]
  mass = weights + eps
  cdf = jnp.cumsum(mass, axis=-1)
  cdf = cdf / cdf[..., -1:]
  cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

  if use_stratified_sampling:
    u = random.uniform(key, list(cdf.shape[:-1]) + [num_samples],
                       dtype=cdf.dtype)
  else:
    u = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
    u = jnp.broadcast_to(u, list(cdf.shape[:-1]) + [num_samples])

  # Locate, per ray, the bin whose CDF interval contains each u:
  # bin_idx = (index of the last edge with cdf[edge] <= u), clamped into
  # [0, num_bins - 1] so u = 0 and u = 1 land in the first/last bin.
  num_le = jnp.sum((cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32),
                   axis=-1)
  bin_idx = jnp.clip(num_le - 1, 0, num_bins - 1)

  # All four per-bin lookups as one exact one-hot matmul (columns: cdf at
  # the bin's left/right edge, the bin's depth edges).
  onehot = jax.nn.one_hot(bin_idx, num_bins, dtype=cdf.dtype)
  table = jnp.stack(
      [cdf[..., :-1], cdf[..., 1:], bins[..., :-1], bins[..., 1:]], axis=-1)
  gathered = jnp.einsum('bse,bef->bsf', onehot, table,
                        precision=lax.Precision.HIGHEST)
  lo, hi, edge_lo, edge_hi = jnp.moveaxis(gathered, -1, 0)

  # Degenerate (zero-mass) bins interpolate with t = u - lo like the
  # reference (denominator snapped to 1), which stays inside the bin since
  # u - lo < eps there.
  span = hi - lo
  t = (u - lo) / jnp.where(span < eps, jnp.ones_like(span), span)
  z_samples = edge_lo + t * (edge_hi - edge_lo)
  return lax.stop_gradient(z_samples)


def sample_pdf(key: Optional[jax.Array], bins: jnp.ndarray,
               weights: jnp.ndarray, origins: jnp.ndarray,
               directions: jnp.ndarray, z_vals: jnp.ndarray, num_samples: int,
               use_stratified_sampling: bool):
  """Hierarchical resampling: union of coarse z's and inverse-CDF samples.

  Parity: reference model_utils.py:190-215.

  Returns:
    z_vals: (B, S_coarse + num_samples) merged, sorted depths.
    points: (B, S_coarse + num_samples, 3).
  """
  z_samples = piecewise_constant_pdf(key, bins, weights, num_samples,
                                     use_stratified_sampling)
  z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
  points = (origins[..., None, :] +
            z_vals[..., None] * directions[..., None, :])
  return z_vals, points


def compute_opaqueness_mask(weights: jnp.ndarray,
                            depth_threshold: float = 0.5) -> jnp.ndarray:
  """One-hot mask marking the sample where cumulative weight crosses the
  threshold (the "surface"). Parity: model_utils.py:218-239."""
  cumulative_contribution = jnp.cumsum(weights, axis=-1)
  depth_threshold = jnp.asarray(depth_threshold, dtype=weights.dtype)
  opaqueness = cumulative_contribution >= depth_threshold
  false_padding = jnp.zeros_like(opaqueness[..., :1])
  padded_opaqueness = jnp.concatenate([false_padding, opaqueness[..., :-1]],
                                      axis=-1)
  opaqueness_mask = jnp.logical_xor(opaqueness, padded_opaqueness)
  return opaqueness_mask.astype(weights.dtype)


def compute_depth_index(weights: jnp.ndarray,
                        depth_threshold: float = 0.5) -> jnp.ndarray:
  """Sample index of the median-depth termination point."""
  opaqueness_mask = compute_opaqueness_mask(weights, depth_threshold)
  return jnp.argmax(opaqueness_mask, axis=-1)


def compute_depth_map(weights: jnp.ndarray, z_vals: jnp.ndarray,
                      depth_threshold: float = 0.5) -> jnp.ndarray:
  """Median-accumulation depth. Parity: model_utils.py:248-263."""
  opaqueness_mask = compute_opaqueness_mask(weights, depth_threshold)
  return jnp.sum(opaqueness_mask * z_vals, axis=-1)


def noise_regularize(key: Optional[jax.Array], raw_sigma: jnp.ndarray,
                     noise_std: Optional[float],
                     use_stratified_sampling: bool) -> jnp.ndarray:
  """Adds gaussian noise to raw densities. Parity: model_utils.py:266-282."""
  if (noise_std is not None) and noise_std > 0.0 and use_stratified_sampling:
    unused_key, key = random.split(key)
    noise = random.normal(key, raw_sigma.shape,
                          dtype=raw_sigma.dtype) * noise_std
    raw_sigma = raw_sigma + noise
  return raw_sigma
