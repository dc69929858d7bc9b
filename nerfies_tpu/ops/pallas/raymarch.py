"""Fused ray-march kernel: PE -> NeRF MLP -> compositing, in VMEM.

The volumetric-rendering hot path evaluated layer-by-layer in XLA writes a
(B*S, width) activation to HBM after every matmul -- for the quarter-HD
fine level that is ~1.5 GB of traffic per layer per step. This Pallas
kernel keeps the whole pipeline on-chip: each program renders a tile of
rays, marching the sample axis in blocks with positional encoding, the
trunk/branch matmuls (MXU), density/color activations, and alpha
compositing all fused; only per-ray results (rgb/depth/acc, a few floats
per ray) ever leave VMEM.

Design notes:
  - The exclusive cumulative transmittance inside a sample block is
    computed in log space with a strictly-triangular matmul (an MXU-friendly
    scan substitute); transmittance is carried across blocks as a per-ray
    scalar, so arbitrarily long rays stream through fixed VMEM.
  - Per-ray conditions (viewdir/GLO embeddings) contribute to the first
    rgb-branch layer through the SplitDense identity
    ``concat([h, c]) @ W == h @ W_top + c @ W_bottom``: the per-ray term is
    computed once per ray tile, outside the sample loop.
  - Median depth tracks the reference's opaqueness-crossing definition
    (model_utils.py:218-263) with a carried cumulative weight.

Equivalent reference math: model_utils.py:76-136 + modules.py:94-169.
"""

import functools
from typing import Any, Dict, Optional

import jax
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp
import numpy as np


def _posenc(x, num_freqs):
  """Reference-ordered sinusoidal PE: [x, sin(f0 x), cos(f0 x), ...]."""
  feats = [x]
  for i in range(num_freqs):
    angles = (2.0 ** i) * x
    feats.append(jnp.sin(angles))
    feats.append(jnp.sin(angles + 0.5 * jnp.pi))
  return jnp.concatenate(feats, axis=-1)


def _apply_sigma(x, name):
  if name == 'relu':
    return jax.nn.relu(x)
  if name == 'softplus':
    return jax.nn.softplus(x)
  raise ValueError(f'Unsupported sigma activation {name!r}')


def _raymarch_kernel(
    # Inputs (blocked per ray tile unless noted).
    points_ref,      # (TB, S, 3)
    z_vals_ref,      # (TB, S)
    dists_ref,       # (TB, S)
    cond_ref,        # (TB, C) or dummy (TB, 1)
    *args,           # weight refs..., out_ref
    num_freqs: int,
    trunk_depth: int,
    skips: tuple,
    rgb_branch_depth: int,
    has_cond: bool,
    sigma_activation: str,
    use_white_background: bool,
    sample_at_infinity: bool,
    tile_s: int,
    dtype,
    return_weights: bool,
):
  if return_weights:
    out_ref, weights_out_ref = args[-2], args[-1]
    weight_refs = args[:-2]
  else:
    out_ref = args[-1]
    weight_refs = args[:-1]

  tb, total_s, _ = points_ref.shape
  num_blocks = total_s // tile_s
  n = tb * tile_s

  # Unpack weights in the order the host packed them.
  it = iter(weight_refs)
  trunk_w = [(next(it), next(it)) for _ in range(trunk_depth)]
  bottleneck_w = (next(it), next(it)) if has_cond else None
  rgb_w = [(next(it), next(it)) for _ in range(rgb_branch_depth + 1)]
  alpha_w = (next(it), next(it))

  # Per-ray rgb-branch condition term: computed once per ray tile.
  if has_cond:
    w0, _ = rgb_w[0]
    cond = cond_ref[:].astype(dtype)
    bneck_dim = bottleneck_w[0].shape[1]
    cond_term = jax.lax.dot_general(
        cond, w0[bneck_dim:].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (TB, rgb_width)

  # Triangular matrices for in-block scans (f32, tiny).
  row = lax.broadcasted_iota(jnp.int32, (tile_s, tile_s), 0)
  col = lax.broadcasted_iota(jnp.int32, (tile_s, tile_s), 1)
  strict_upper = (row < col).astype(jnp.float32)   # exclusive cumsum
  upper_incl = (row <= col).astype(jnp.float32)    # inclusive cumsum

  def mlp_trunk(x_pe):
    h = x_pe
    for i, (w_ref, b_ref) in enumerate(trunk_w):
      w = w_ref[:].astype(dtype)
      b = b_ref[:].astype(dtype)
      if i in skips and i > 0:
        h_dim = h.shape[-1]
        out = (jax.lax.dot_general(
            h, w[:h_dim], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   x_pe, w[h_dim:], (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32))
      else:
        out = jax.lax.dot_general(
            h, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
      h = jax.nn.relu(out + b_ref[:]).astype(dtype)
    return h

  def sample_block(t, carry):
    # `t` is a static Python int (the block loop is unrolled: Mosaic does
    # not lower dynamic_slice on TPU refs, and the block count is small).
    trans, cumw, rgb_acc, depth_acc, med_acc, acc_acc, last_w = carry

    lo = t * tile_s
    pts = points_ref[:, lo:lo + tile_s, :]
    z = z_vals_ref[:, lo:lo + tile_s]
    dists = dists_ref[:, lo:lo + tile_s]

    x = _posenc(pts.reshape(n, 3), num_freqs).astype(dtype)
    h = mlp_trunk(x)

    # Density head.
    aw, ab = alpha_w
    raw_sigma = (jax.lax.dot_general(
        h, aw[:].astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + ab[:])
    sigma = _apply_sigma(raw_sigma[:, 0:1], sigma_activation)

    # Color head.
    if has_cond:
      bw, bb = bottleneck_w
      bneck = (jax.lax.dot_general(
          h, bw[:].astype(dtype), (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32) + bb[:])
      w0, b0 = rgb_w[0]
      bneck_dim = bw.shape[1]
      y = (jax.lax.dot_general(
          bneck.astype(dtype), w0[:bneck_dim].astype(dtype),
          (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
           + b0[:])
      y = y.reshape(tb, tile_s, -1) + cond_term[:, None, :]
      y = y.reshape(n, -1)
      if rgb_branch_depth > 0:
        # First branch layer is a hidden layer; depth 0 means it IS the
        # logit and must stay pre-activation.
        y = jax.nn.relu(y).astype(dtype)
      rest = rgb_w[1:]
    else:
      y = h
      rest = rgb_w
    for i, (w_ref, b_ref) in enumerate(rest):
      w = w_ref[:].astype(dtype)
      y = (jax.lax.dot_general(
          y, w, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32) + b_ref[:])
      if i < len(rest) - 1:
        y = jax.nn.relu(y).astype(dtype)
    rgb = jax.nn.sigmoid(y.astype(jnp.float32)).reshape(tb, tile_s, 3)

    # Compositing within the block (log-space triangular-matmul scans).
    sigma = sigma.reshape(tb, tile_s)  # (n, 1) heads collapse to (tb, ts)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    # max() guard: the compiler may reassociate `1 - alpha + eps` into
    # exactly 0 at alpha == 1, and log(0) = -inf turns the masked
    # triangular matmul into -inf * 0 = NaN.
    log_t = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-10))
    excl = jax.lax.dot_general(
        log_t, strict_upper, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t_within = jnp.exp(excl)
    weights = alpha * t_within * trans[:, None]

    if return_weights:
      weights_out_ref[:, lo:lo + tile_s] = weights

    # Per-ray accumulators.
    rgb_acc = rgb_acc + jnp.sum(weights[..., None] * rgb, axis=1)
    depth_acc = depth_acc + jnp.sum(weights * z, axis=1)
    acc_acc = acc_acc + jnp.sum(weights, axis=1)

    # Median depth: first crossing of cumulative weight 0.5.
    cw = cumw[:, None] + jax.lax.dot_general(
        weights, upper_incl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    prev = cw - weights
    marker = jnp.logical_and(cw >= 0.5, prev < 0.5).astype(jnp.float32)
    med_acc = med_acc + jnp.sum(marker * z, axis=1)

    # Carries. NOTE: only static slices -- integer and negative indexing
    # lower to dynamic_slice, which Mosaic does not implement.
    trans = trans * jnp.exp(jnp.sum(log_t, axis=1))
    cumw = jnp.sum(cw[:, tile_s - 1:tile_s], axis=1)
    if t == num_blocks - 1:
      last_w = last_w + jnp.sum(weights[:, tile_s - 1:tile_s], axis=1)
    return trans, cumw, rgb_acc, depth_acc, med_acc, acc_acc, last_w

  init = (
      jnp.ones((tb,), jnp.float32),      # transmittance
      jnp.zeros((tb,), jnp.float32),     # cumulative weight
      jnp.zeros((tb, 3), jnp.float32),   # rgb
      jnp.zeros((tb,), jnp.float32),     # expected depth
      jnp.zeros((tb,), jnp.float32),     # median depth
      jnp.zeros((tb,), jnp.float32),     # acc
      jnp.zeros((tb,), jnp.float32),     # weight of final sample
  )
  carry = init
  for t in range(num_blocks):
    carry = sample_block(t, carry)
  trans, cumw, rgb_acc, depth_acc, med_acc, acc_acc, last_w = carry

  if use_white_background:
    rgb_acc = rgb_acc + (1.0 - acc_acc)[:, None]
  if sample_at_infinity:
    acc_out = acc_acc - last_w
  else:
    acc_out = acc_acc

  out = jnp.concatenate(
      [rgb_acc, depth_acc[:, None], med_acc[:, None], acc_out[:, None],
       jnp.zeros((tb, 2), jnp.float32)], axis=-1)
  out_ref[:] = out


def _collect_weights(params: Dict[str, Any], trunk_depth: int,
                     rgb_branch_depth: int, has_cond: bool):
  """Flattens NerfMLP params (modules.NerfMLP naming) into kernel order."""
  arrays = []
  for i in range(trunk_depth):
    layer = params[f'trunk_hidden_{i}']
    arrays += [layer['kernel'], layer['bias']]
  if has_cond:
    arrays += [params['bottleneck']['kernel'], params['bottleneck']['bias']]
    for i in range(rgb_branch_depth):
      layer = params[f'rgb_hidden_{i}']
      arrays += [layer['kernel'], layer['bias']]
    arrays += [params['rgb_logit']['kernel'], params['rgb_logit']['bias']]
  else:
    for i in range(rgb_branch_depth):
      layer = params[f'rgb_hidden_{i}']
      arrays += [layer['kernel'], layer['bias']]
    arrays += [params['rgb_logit']['kernel'], params['rgb_logit']['bias']]
  arrays += [params['alpha_logit']['kernel'], params['alpha_logit']['bias']]
  return arrays


def fused_render_level(params: Dict[str, Any],
                       points: jnp.ndarray,
                       z_vals: jnp.ndarray,
                       directions: jnp.ndarray,
                       rgb_condition: Optional[jnp.ndarray],
                       *,
                       num_freqs: int,
                       trunk_depth: int = 8,
                       skips: tuple = (4,),
                       rgb_branch_depth: int = 1,
                       sigma_activation: str = 'softplus',
                       use_white_background: bool = False,
                       sample_at_infinity: bool = True,
                       tile_b: int = 32,
                       tile_s: int = 64,
                       use_bfloat16: bool = True,
                       return_weights: bool = False,
                       interpret: bool = False) -> Dict[str, jnp.ndarray]:
  """Renders one sampling level with the fused Pallas kernel.

  Args:
    params: NerfMLP parameter subtree ('trunk_hidden_i', 'bottleneck',
      'rgb_hidden_i', 'rgb_logit', 'alpha_logit').
    points: (B, S, 3) (already warped) sample positions.
    z_vals: (B, S) sample depths.
    directions: (B, 3) ray directions (scales dists, reference parity).
    rgb_condition: per-ray (B, C) condition or None.
    num_freqs / trunk_depth / skips / rgb_branch_depth: MLP architecture.
    sigma_activation: 'relu' or 'softplus'.
    use_white_background / sample_at_infinity: compositing options.
    tile_b / tile_s: ray/sample tile sizes (B % tile_b == 0 required;
      S % tile_s == 0 required).
    use_bfloat16: run matmuls in bf16 (f32 accumulation).
    interpret: pallas interpret mode (CPU testing).

  Returns:
    {'rgb' (B,3), 'depth' (B,), 'med_depth' (B,), 'acc' (B,)}.
  """
  batch, total_s, _ = points.shape
  if batch % tile_b:
    raise ValueError(f'batch {batch} % tile_b {tile_b} != 0')
  if total_s % tile_s:
    raise ValueError(f'samples {total_s} % tile_s {tile_s} != 0')
  has_cond = rgb_condition is not None

  # dists with the infinity tail and |direction| scaling (reference
  # model_utils.py:103-109), precomputed in XLA.
  last_z = 1e10 if sample_at_infinity else 1e-19
  dists = jnp.concatenate([
      z_vals[:, 1:] - z_vals[:, :-1],
      jnp.full_like(z_vals[:, :1], last_z)], axis=-1)
  dists = dists * jnp.linalg.norm(directions, axis=-1, keepdims=True)

  weights = _collect_weights(params, trunk_depth, rgb_branch_depth, has_cond)
  cond = (rgb_condition if has_cond
          else jnp.zeros((batch, 1), jnp.float32))

  kernel = functools.partial(
      _raymarch_kernel,
      num_freqs=num_freqs,
      trunk_depth=trunk_depth,
      skips=tuple(skips),
      rgb_branch_depth=rgb_branch_depth,
      has_cond=has_cond,
      sigma_activation=sigma_activation,
      use_white_background=use_white_background,
      sample_at_infinity=sample_at_infinity,
      tile_s=tile_s,
      dtype=jnp.bfloat16 if use_bfloat16 else jnp.float32,
      return_weights=return_weights,
  )

  grid = (batch // tile_b,)
  ray_spec = lambda ch: pl.BlockSpec(  # noqa: E731
      (tile_b, total_s, ch) if ch else (tile_b, total_s),
      (lambda i: (i, 0, 0)) if ch else (lambda i: (i, 0)),
      memory_space=pltpu.VMEM)
  in_specs = [
      ray_spec(3),                                    # points
      ray_spec(0),                                    # z_vals
      ray_spec(0),                                    # dists
      pl.BlockSpec((tile_b, cond.shape[-1]), lambda i: (i, 0),
                   memory_space=pltpu.VMEM),          # condition
  ]
  in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

  out_specs = pl.BlockSpec((tile_b, 8), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
  out_shape = jax.ShapeDtypeStruct((batch, 8), jnp.float32)
  if return_weights:
    out_specs = (out_specs,
                 pl.BlockSpec((tile_b, total_s), lambda i: (i, 0),
                              memory_space=pltpu.VMEM))
    out_shape = (out_shape,
                 jax.ShapeDtypeStruct((batch, total_s), jnp.float32))

  out = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shape,
      interpret=interpret,
  )(points, z_vals, dists, cond, *weights)

  if return_weights:
    out, level_weights = out
  result = {
      'rgb': out[:, 0:3],
      'depth': out[:, 3],
      'med_depth': out[:, 4],
      'acc': out[:, 5],
  }
  if return_weights:
    result['weights'] = level_weights
  return result
