"""Fused ray-march kernel: PE -> NeRF MLP -> compositing, in VMEM.

The volumetric-rendering hot path evaluated layer-by-layer in XLA writes a
(B*S, width) activation to HBM after every matmul -- for the quarter-HD
fine level that is ~1.5 GB of traffic per layer per step. This Pallas
kernel keeps the whole pipeline on-chip: the grid walks (ray tiles x sample
blocks); each step positionally encodes one block of samples, runs the
trunk/branch matmuls (MXU) and density/color activations, and alpha-
composites into per-ray accumulators held in VMEM scratch. Only per-ray
results (rgb/depth/acc -- a few floats per ray) and optional per-sample
weights ever leave VMEM.

Design notes:
  - The sample axis is a GRID dimension (TPU grids execute sequentially on
    a core), with transmittance/accumulators carried in VMEM scratch --
    the flash-attention pattern. This keeps the kernel body small (fast
    Mosaic compiles) and lets pallas pipeline block fetches.
  - The exclusive cumulative transmittance inside a block is computed in
    log space with a strictly-triangular matmul (an MXU-friendly scan
    substitute).
  - The positional encoding is computed OUTSIDE the kernel (XLA) and
    streamed as a (B, S, D) input: this TPU's Mosaic compile service
    crashes on kernels that assemble many distinct (tb, ts) planes into
    lanes (jnp.stack) -- and D*4 bytes/sample of extra input bandwidth is
    noise next to the ~1 MFLOP/sample of MLP compute it feeds.
  - Per-ray conditions (viewdir/GLO embeddings) contribute to the first
    rgb-branch layer through the SplitDense identity
    ``concat([h, c]) @ W == h @ W_top + c @ W_bottom``.
  - Median depth tracks the reference's opaqueness-crossing definition
    (model_utils.py:218-263) with a carried cumulative weight.
  - Only static slices / no integer or negative indexing inside the
    kernel: Mosaic does not lower dynamic_slice.

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

# Scratch accumulator columns.
_TRANS, _CUMW, _R, _G, _B, _DEPTH, _MED, _ACC = range(8)


def _apply_sigma(x, name):
  if name == 'relu':
    return jax.nn.relu(x)
  if name == 'softplus':
    return jax.nn.softplus(x)
  raise ValueError(f'Unsupported sigma activation {name!r}')


def _dot(a, b):
  """Contraction of the last dim of `a` with the first of `b` (MXU)."""
  return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)


def _raymarch_kernel(
    pe_ref,          # (TB, TS, D) block: positionally-encoded samples
    z_vals_ref,      # (TB, TS) block
    dists_ref,       # (TB, TS) block
    cond_ref,        # (TB, C) (dummy (TB, 1) when has_cond=False)
    *args,           # weight refs..., out_ref [, weights_out_ref], scratch
    trunk_depth: int,
    skips: tuple,
    rgb_branch_depth: int,
    has_cond: bool,
    sigma_activation: str,
    use_white_background: bool,
    sample_at_infinity: bool,
    dtype,
    return_weights: bool,
):
  acc_ref = args[-1]  # (TB, 8) f32 VMEM scratch
  if return_weights:
    out_ref, weights_out_ref = args[-3], args[-2]
    weight_refs = args[:-3]
  else:
    out_ref = args[-2]
    weight_refs = args[:-2]

  j = pl.program_id(1)
  num_blocks = pl.num_programs(1)
  tb, tile_s, _ = pe_ref.shape

  # Unpack weights in the order the host packed them.
  it = iter(weight_refs)
  trunk_w = [(next(it), next(it)) for _ in range(trunk_depth)]
  bottleneck_w = (next(it), next(it)) if has_cond else None
  rgb_w = [(next(it), next(it)) for _ in range(rgb_branch_depth + 1)]
  alpha_w = (next(it), next(it))

  @pl.when(j == 0)
  def _init():
    # No .at[].set here: that lowers to scatter, which Mosaic lacks.
    acc_ref[:] = jnp.concatenate(
        [jnp.ones((tb, 1), jnp.float32), jnp.zeros((tb, 7), jnp.float32)],
        axis=-1)

  # Everything stays (tb, ts, features): Mosaic cannot relayout
  # sublane<->lane reshapes, so the classic (tb*ts, features) flattening is
  # off the table. The batched 3-D dot_generals below contract the feature
  # (lane) axis and keep ts=128 rows per matmul, so MXU utilization matches
  # the flattened form.
  x_pe = pe_ref[:].astype(dtype)  # (tb, ts, D)

  # --- trunk ---
  h = x_pe
  for i, (w_ref, b_ref) in enumerate(trunk_w):
    w = w_ref[:].astype(dtype)
    if i in skips and i > 0:
      h_dim = h.shape[-1]
      out = _dot(h, w[:h_dim]) + _dot(x_pe, w[h_dim:])
    else:
      out = _dot(h, w)
    h = jax.nn.relu(out + b_ref[:]).astype(dtype)

  # --- density head ---
  aw, ab = alpha_w
  raw_sigma = _dot(h, aw[:].astype(dtype)) + ab[:]        # (tb, ts, 1)
  sigma = _apply_sigma(jnp.sum(raw_sigma, axis=2), sigma_activation)

  # --- color head ---
  if has_cond:
    bw, bb = bottleneck_w
    bneck = _dot(h, bw[:].astype(dtype)) + bb[:]
    w0, b0 = rgb_w[0]
    bneck_dim = bw.shape[1]
    cond = cond_ref[:].astype(dtype)
    cond_term = _dot(cond, w0[bneck_dim:].astype(dtype))  # (TB, width)
    y = _dot(bneck.astype(dtype), w0[:bneck_dim].astype(dtype)) + b0[:]
    y = y + cond_term[:, None, :]
    if rgb_branch_depth > 0:
      # Depth 0 would make this the logit layer: no activation then.
      y = jax.nn.relu(y).astype(dtype)
    rest = rgb_w[1:]
  else:
    y = h
    rest = rgb_w
  for i, (w_ref, b_ref) in enumerate(rest):
    y = _dot(y.astype(dtype), w_ref[:].astype(dtype)) + b_ref[:]
    if i < len(rest) - 1:
      y = jax.nn.relu(y).astype(dtype)
  rgb = jax.nn.sigmoid(y.astype(jnp.float32))             # (tb, ts, 3)

  # --- compositing (log-space triangular-matmul scans) ---
  z = z_vals_ref[:]
  dists = dists_ref[:]
  alpha = 1.0 - jnp.exp(-sigma * dists)
  # max() guard: `1 - alpha + eps` can reassociate to exactly 0 at
  # alpha == 1; log(0) = -inf turns the masked matmul into -inf*0 = NaN.
  log_t = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-10))

  row = lax.broadcasted_iota(jnp.int32, (tile_s, tile_s), 0)
  col = lax.broadcasted_iota(jnp.int32, (tile_s, tile_s), 1)
  strict_upper = (row < col).astype(jnp.float32)
  upper_incl = (row <= col).astype(jnp.float32)

  trans = acc_ref[:, _TRANS:_TRANS + 1]            # (TB, 1)
  cumw = acc_ref[:, _CUMW:_CUMW + 1]

  t_within = jnp.exp(_dot(log_t, strict_upper))
  weights = alpha * t_within * trans

  if return_weights:
    weights_out_ref[:] = weights

  rgb_c = jnp.sum(weights[..., None] * rgb, axis=1)  # (TB, 3)
  depth_c = jnp.sum(weights * z, axis=1, keepdims=True)
  acc_c = jnp.sum(weights, axis=1, keepdims=True)

  # Median depth: first crossing of cumulative weight 0.5.
  cw = cumw + _dot(weights, upper_incl)
  prev = cw - weights
  marker = jnp.logical_and(cw >= 0.5, prev < 0.5).astype(jnp.float32)
  med_c = jnp.sum(marker * z, axis=1, keepdims=True)

  new_trans = trans * jnp.exp(jnp.sum(log_t, axis=1, keepdims=True))
  new_cumw = cw[:, tile_s - 1:tile_s]

  acc = acc_ref[:]
  acc_ref[:] = jnp.concatenate([
      new_trans,
      new_cumw,
      acc[:, _R:_B + 1] + rgb_c,
      acc[:, _DEPTH:_DEPTH + 1] + depth_c,
      acc[:, _MED:_MED + 1] + med_c,
      acc[:, _ACC:_ACC + 1] + acc_c,
  ], axis=-1)

  @pl.when(j == num_blocks - 1)
  def _finalize():
    final = acc_ref[:]
    rgb_out = final[:, _R:_B + 1]
    acc_out = final[:, _ACC:_ACC + 1]
    if use_white_background:
      rgb_out = rgb_out + (1.0 - acc_out)
    if sample_at_infinity:
      # acc excludes the infinity sample: its weight is the final weight of
      # this (last) block.
      acc_out = acc_out - weights[:, tile_s - 1:tile_s]
    out_ref[:] = jnp.concatenate([
        rgb_out,
        final[:, _DEPTH:_DEPTH + 1],
        final[:, _MED:_MED + 1],
        acc_out,
        jnp.zeros((tb, 2), jnp.float32),
    ], axis=-1)


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
                       tile_b: int = 64,
                       tile_s: Optional[int] = None,
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
    tile_b / tile_s: ray/sample tile sizes (B % tile_b == 0 and
      S % tile_s == 0 required).
    use_bfloat16: run matmuls in bf16 (f32 accumulation).
    return_weights: also return per-sample compositing weights (B, S).
    interpret: pallas interpret mode (CPU testing).

  Returns:
    {'rgb' (B,3), 'depth' (B,), 'med_depth' (B,), 'acc' (B,)
     [, 'weights' (B,S)]}.
  """
  batch, total_s, _ = points.shape
  if batch % tile_b:
    raise ValueError(f'batch {batch} % tile_b {tile_b} != 0')
  if tile_s is None:
    # Mosaic requires the block's lane dimension to be a multiple of 128
    # or the full axis; pick the largest valid sample block.
    tile_s = 128 if total_s % 128 == 0 else total_s
  if total_s % tile_s:
    raise ValueError(f'samples {total_s} % tile_s {tile_s} != 0')
  has_cond = rgb_condition is not None
  num_blocks = total_s // tile_s

  # dists with the infinity tail and |direction| scaling (reference
  # model_utils.py:103-109), precomputed in XLA.
  last_z = 1e10 if sample_at_infinity else 1e-19
  dists = jnp.concatenate([
      z_vals[:, 1:] - z_vals[:, :-1],
      jnp.full_like(z_vals[:, :1], last_z)], axis=-1)
  dists = dists * jnp.linalg.norm(directions, axis=-1, keepdims=True)

  # PE computed in XLA (exact parity with the unfused path); the kernel
  # streams it as a 3-D input block.
  from nerfies_tpu.ops import encoding as _encoding
  x_pe = _encoding.posenc(points, num_freqs=num_freqs)
  pe_dim = x_pe.shape[-1]

  weights = _collect_weights(params, trunk_depth, rgb_branch_depth, has_cond)
  cond = (rgb_condition if has_cond
          else jnp.zeros((batch, 1), jnp.float32))

  kernel = functools.partial(
      _raymarch_kernel,
      trunk_depth=trunk_depth,
      skips=tuple(skips),
      rgb_branch_depth=rgb_branch_depth,
      has_cond=has_cond,
      sigma_activation=sigma_activation,
      use_white_background=use_white_background,
      sample_at_infinity=sample_at_infinity,
      dtype=jnp.bfloat16 if use_bfloat16 else jnp.float32,
      return_weights=return_weights,
  )

  grid = (batch // tile_b, num_blocks)
  sample_block_spec = lambda: pl.BlockSpec(  # noqa: E731
      (tile_b, tile_s), lambda i, j: (i, j), memory_space=pltpu.VMEM)
  in_specs = [
      pl.BlockSpec((tile_b, tile_s, pe_dim), lambda i, j: (i, j, 0),
                   memory_space=pltpu.VMEM),  # positional encoding
      sample_block_spec(),  # z_vals
      sample_block_spec(),  # dists
      pl.BlockSpec((tile_b, cond.shape[-1]), lambda i, j: (i, 0),
                   memory_space=pltpu.VMEM),
  ]
  in_specs += [
      pl.BlockSpec(w.shape, lambda i, j, nd=w.ndim: (0,) * nd,
                   memory_space=pltpu.VMEM) for w in weights
  ]

  out_specs = [pl.BlockSpec((tile_b, 8), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)]
  out_shape = [jax.ShapeDtypeStruct((batch, 8), jnp.float32)]
  if return_weights:
    out_specs.append(pl.BlockSpec((tile_b, tile_s), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((batch, total_s), jnp.float32))

  outs = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shape,
      scratch_shapes=[pltpu.VMEM((tile_b, 8), jnp.float32)],
      interpret=interpret,
  )(x_pe, z_vals, dists, cond, *weights)

  out = outs[0]
  result = {
      'rgb': out[:, 0:3],
      'depth': out[:, 3],
      'med_depth': out[:, 4],
      'acc': out[:, 5],
  }
  if return_weights:
    result['weights'] = outs[1]
  return result
