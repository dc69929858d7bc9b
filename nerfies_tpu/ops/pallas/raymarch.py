"""Fused ray-march kernels: NeRF MLP + compositing with VMEM-resident tiles.

The volumetric-rendering hot path evaluated layer-by-layer in XLA writes a
float32 (B*S, width) activation to HBM after every matmul -- for the
quarter-HD fine level that is ~1.5 GB of traffic per layer per step. This
Pallas implementation splits the pipeline into a few fused kernels, each
keeping its activations in VMEM; only one bfloat16 trunk activation per
segment boundary (and the tiny per-ray outputs) ever touch HBM.

Why segments instead of one mega-kernel: the TPU compile service in this
environment crashes ("tpu_compile_helper subprocess exit code 1") on kernel
bodies with more than ~6 matmuls, on kernels that assemble many distinct
(sublane, lane) planes into a new lane axis (jnp.stack), and on any
sublane<->lane reshape. The design below respects all three limits:

  - The trunk runs as segments of <= 3 dense layers per kernel; segment
    boundaries hand off one bf16 (B, S, width) array through HBM.
  - The heads + compositing kernel does the density/color heads and the
    alpha compositing (6 matmuls incl. the two triangular-scan products).
  - The positional encoding and the per-ray condition term are computed in
    XLA and streamed in ((B, S, D) block / (B, width) per-ray rows) -- both
    are bandwidth-trivial next to the MLP FLOPs they feed.
  - The grid walks (ray tiles x sample blocks); transmittance/accumulators
    carry across sample blocks in VMEM scratch (the flash-attention
    pattern), so arbitrarily long rays stream through fixed VMEM.
  - The exclusive cumulative transmittance inside a block is a log-space
    strictly-triangular matmul (an MXU-friendly scan substitute).
  - Median depth tracks the reference's opaqueness-crossing definition
    (model_utils.py:218-263) with a carried cumulative weight.
  - Mosaic-lowering rules obeyed throughout: no dynamic_slice (static
    slices only), no scatter (.at[].set), no integer/negative indexing,
    block lane dims either full or 128-multiples.

Equivalent reference math: model_utils.py:76-136 + modules.py:94-169.
"""

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

from nerfies_tpu.ops import encoding as encoding_lib

# Scratch accumulator columns.
_TRANS, _CUMW, _R, _G, _B, _DEPTH, _MED, _ACC = range(8)

# Compile-service budget: maximum dense layers per trunk segment kernel.
MAX_LAYERS_PER_KERNEL = 3


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


def _trunk_segment_kernel(pe_ref, h_ref, *args, layer_ids: Tuple[int, ...],
                          skips: Tuple[int, ...], first_segment: bool,
                          dtype):
  """Runs trunk layers `layer_ids` on one (ray tile, sample block)."""
  out_ref = args[-1]
  weight_refs = args[:-1]
  x_pe = pe_ref[:].astype(dtype)
  h = x_pe if first_segment else h_ref[:].astype(dtype)
  it = iter(weight_refs)
  for g in layer_ids:
    w_ref, b_ref = next(it), next(it)
    w = w_ref[:].astype(dtype)
    if g in skips and g > 0:
      h_dim = h.shape[-1]
      out = _dot(h, w[:h_dim]) + _dot(x_pe, w[h_dim:])
    else:
      out = _dot(h, w)
    h = jax.nn.relu(out + b_ref[:]).astype(dtype)
  out_ref[:] = h.astype(out_ref.dtype)


def _heads_kernel(
    h_ref,           # (TB, TS, W) trunk output block
    z_vals_ref,      # (TB, TS)
    dists_ref,       # (TB, TS)
    cond_term_ref,   # (TB, rgb_width) precomputed per-ray condition term
    *args,           # weight refs..., out_ref [, weights_out_ref], scratch
    rgb_branch_depth: int,
    has_cond: bool,
    sigma_activation: str,
    use_white_background: bool,
    sample_at_infinity: bool,
    dtype,
    return_weights: bool,
):
  """Density/color heads + alpha compositing for one sample block."""
  acc_ref = args[-1]  # (TB, 8) f32 VMEM scratch
  if return_weights:
    out_ref, weights_out_ref = args[-3], args[-2]
    weight_refs = args[:-3]
  else:
    out_ref = args[-2]
    weight_refs = args[:-2]

  j = pl.program_id(1)
  num_blocks = pl.num_programs(1)
  tb, tile_s, _ = h_ref.shape

  it = iter(weight_refs)
  bottleneck_w = (next(it), next(it)) if has_cond else None
  rgb_w = [(next(it), next(it)) for _ in range(rgb_branch_depth + 1)]
  alpha_w = (next(it), next(it))

  @pl.when(j == 0)
  def _init():
    # No .at[].set: that lowers to scatter, which Mosaic lacks.
    acc_ref[:] = jnp.concatenate(
        [jnp.ones((tb, 1), jnp.float32), jnp.zeros((tb, 7), jnp.float32)],
        axis=-1)

  h = h_ref[:].astype(dtype)

  # --- density head ---
  aw, ab = alpha_w
  raw_sigma = _dot(h, aw[:].astype(dtype)) + ab[:]        # (tb, ts, 1)
  sigma = _apply_sigma(jnp.sum(raw_sigma, axis=2), sigma_activation)

  # --- color head ---
  if has_cond:
    bw, bb = bottleneck_w
    bneck = (_dot(h, bw[:].astype(dtype)) + bb[:]).astype(dtype)
    w0, b0 = rgb_w[0]
    # w0 holds only the bottleneck rows; the condition rows were applied
    # in XLA and stream in as cond_term (the SplitDense identity).
    y = _dot(bneck, w0[:].astype(dtype)) + b0[:]
    y = y + cond_term_ref[:][:, None, :]
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
      # acc excludes the infinity sample: its weight is the final weight
      # of this (last) block.
      acc_out = acc_out - weights[:, tile_s - 1:tile_s]
    out_ref[:] = jnp.concatenate([
        rgb_out,
        final[:, _DEPTH:_DEPTH + 1],
        final[:, _MED:_MED + 1],
        acc_out,
        jnp.zeros((tb, 2), jnp.float32),
    ], axis=-1)


def _segment_bounds(depth: int, max_per: int) -> List[Tuple[int, ...]]:
  return [tuple(range(a, min(a + max_per, depth)))
          for a in range(0, depth, max_per)]


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
  """Renders one sampling level with the fused Pallas kernels.

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
      tile_s defaults to 128 when S divides, else the full S).
    use_bfloat16: run matmuls in bf16 (f32 accumulation).
    return_weights: also return per-sample compositing weights (B, S).
    interpret: pallas interpret mode (CPU testing).

  Returns:
    {'rgb' (B,3), 'depth' (B,), 'med_depth' (B,), 'acc' (B,)
     [, 'weights' (B,S)]}.
  """
  batch, total_s, _ = points.shape
  if tile_s is None:
    # Mosaic requires a block's lane dimension to be a multiple of 128 or
    # the full axis; pick the largest valid sample block.
    tile_s = 128 if total_s % 128 == 0 else total_s
  if total_s % tile_s:
    raise ValueError(f'samples {total_s} % tile_s {tile_s} != 0')

  # Shrink the ray tile until the widest kernel's double-buffered blocks fit
  # comfortably in the ~16 MB of VMEM (overflow crashes the compile
  # service rather than erroring).
  width = params['trunk_hidden_0']['kernel'].shape[1]
  pe_width = 3 * (2 * num_freqs + 1)
  bytes_per_elem = 2 if use_bfloat16 else 4
  vmem_budget = 10 * 1024 * 1024
  while tile_b > 8:
    per_row = tile_s * (pe_width + 2 * width) * bytes_per_elem
    if 2 * tile_b * per_row <= vmem_budget:
      break
    tile_b //= 2
  # Shrink further (min 8, the f32 sublane height) until the tile divides
  # the batch, so padded eval chunks of any 8-multiple size work.
  while tile_b > 8 and batch % tile_b:
    tile_b //= 2
  if batch % tile_b:
    raise ValueError(
        f'batch {batch} must be a multiple of 8 for the fused ray-march '
        f'(pad ray chunks to a multiple of 8)')
  has_cond = rgb_condition is not None
  num_blocks = total_s // tile_s
  dtype = jnp.bfloat16 if use_bfloat16 else jnp.float32
  grid = (batch // tile_b, num_blocks)

  sample_spec = lambda: pl.BlockSpec(  # noqa: E731
      (tile_b, tile_s), lambda i, j: (i, j), memory_space=pltpu.VMEM)

  def feat_spec(d):
    return pl.BlockSpec((tile_b, tile_s, d), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)

  def resident_spec(a):
    return pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM)

  # dists with the infinity tail and |direction| scaling (reference
  # model_utils.py:103-109), precomputed in XLA.
  last_z = 1e10 if sample_at_infinity else 1e-19
  dists = jnp.concatenate([
      z_vals[:, 1:] - z_vals[:, :-1],
      jnp.full_like(z_vals[:, :1], last_z)], axis=-1)
  dists = dists * jnp.linalg.norm(directions, axis=-1, keepdims=True)

  # PE in XLA (exact parity with the unfused path), streamed as 3-D blocks.
  x_pe = encoding_lib.posenc(points, num_freqs=num_freqs).astype(dtype)
  pe_dim = x_pe.shape[-1]

  # --- trunk segments ---
  h = x_pe
  for seg_idx, layer_ids in enumerate(
      _segment_bounds(trunk_depth, MAX_LAYERS_PER_KERNEL)):
    seg_weights = []
    for g in layer_ids:
      layer = params[f'trunk_hidden_{g}']
      seg_weights += [layer['kernel'], layer['bias']]
    width = seg_weights[0].shape[1]
    kernel = functools.partial(
        _trunk_segment_kernel,
        layer_ids=layer_ids,
        skips=tuple(skips),
        first_segment=seg_idx == 0,
        dtype=dtype)
    h = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([feat_spec(pe_dim), feat_spec(h.shape[-1])]
                  + [resident_spec(w) for w in seg_weights]),
        out_specs=feat_spec(width),
        out_shape=jax.ShapeDtypeStruct((batch, total_s, width), dtype),
        interpret=interpret,
    )(x_pe, h, *seg_weights)

  # --- per-ray condition term (SplitDense identity), in XLA ---
  head_weights = []
  if has_cond:
    head_weights += [params['bottleneck']['kernel'],
                     params['bottleneck']['bias']]
    bneck_dim = params['bottleneck']['kernel'].shape[1]
    first_rgb = (params['rgb_hidden_0'] if rgb_branch_depth > 0
                 else params['rgb_logit'])
    w0 = first_rgb['kernel']
    cond_term = (rgb_condition @ w0[bneck_dim:]).astype(jnp.float32)
    head_weights += [w0[:bneck_dim], first_rgb['bias']]
    for i in range(1, rgb_branch_depth):
      layer = params[f'rgb_hidden_{i}']
      head_weights += [layer['kernel'], layer['bias']]
    if rgb_branch_depth > 0:
      head_weights += [params['rgb_logit']['kernel'],
                       params['rgb_logit']['bias']]
  else:
    cond_term = jnp.zeros((batch, 1), jnp.float32)
    for i in range(rgb_branch_depth):
      layer = params[f'rgb_hidden_{i}']
      head_weights += [layer['kernel'], layer['bias']]
    head_weights += [params['rgb_logit']['kernel'],
                     params['rgb_logit']['bias']]
  head_weights += [params['alpha_logit']['kernel'],
                   params['alpha_logit']['bias']]

  kernel = functools.partial(
      _heads_kernel,
      rgb_branch_depth=rgb_branch_depth,
      has_cond=has_cond,
      sigma_activation=sigma_activation,
      use_white_background=use_white_background,
      sample_at_infinity=sample_at_infinity,
      dtype=dtype,
      return_weights=return_weights,
  )
  in_specs = [
      feat_spec(h.shape[-1]),
      sample_spec(),  # z_vals
      sample_spec(),  # dists
      pl.BlockSpec((tile_b, cond_term.shape[-1]), lambda i, j: (i, 0),
                   memory_space=pltpu.VMEM),
  ]
  in_specs += [resident_spec(w) for w in head_weights]

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
  )(h, z_vals, dists, cond_term, *head_weights)

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


def _flat_segment_kernel(pe_ref, h_ref, *args, layer_ids: Tuple[int, ...],
                         skips: Tuple[int, ...], first_segment: bool, dtype):
  """Trunk layers `layer_ids` over a flat (tile_n, features) row block."""
  out_ref = args[-1]
  weight_refs = args[:-1]
  x_pe = pe_ref[:].astype(dtype)
  h = x_pe if first_segment else h_ref[:].astype(dtype)
  it = iter(weight_refs)
  for g in layer_ids:
    w_ref, b_ref = next(it), next(it)
    w = w_ref[:].astype(dtype)
    if g in skips and g > 0:
      h_dim = h.shape[-1]
      out = _dot(h, w[:h_dim]) + _dot(x_pe, w[h_dim:])
    else:
      out = _dot(h, w)
    h = jax.nn.relu(out + b_ref[:]).astype(dtype)
  out_ref[:] = h.astype(out_ref.dtype)


def _flat_heads_kernel(h_ref, cond_term_ref, *args, rgb_branch_depth: int,
                       has_cond: bool, dtype):
  """Density + color heads over flat rows -> raw sigma (N,1), rgb (N,3)."""
  sigma_ref, rgb_ref = args[-2], args[-1]
  weight_refs = args[:-2]
  it = iter(weight_refs)
  bottleneck_w = (next(it), next(it)) if has_cond else None
  rgb_w = [(next(it), next(it)) for _ in range(rgb_branch_depth + 1)]
  alpha_w = (next(it), next(it))

  h = h_ref[:].astype(dtype)
  aw, ab = alpha_w
  sigma_ref[:] = _dot(h, aw[:].astype(dtype)) + ab[:]

  if has_cond:
    bw, bb = bottleneck_w
    bneck = (_dot(h, bw[:].astype(dtype)) + bb[:]).astype(dtype)
    w0, b0 = rgb_w[0]
    y = _dot(bneck, w0[:].astype(dtype)) + b0[:] + cond_term_ref[:]
    if rgb_branch_depth > 0:
      y = jax.nn.relu(y).astype(dtype)
    rest = rgb_w[1:]
  else:
    y = h
    rest = rgb_w
  for i, (w_ref, b_ref) in enumerate(rest):
    y = _dot(y.astype(dtype), w_ref[:].astype(dtype)) + b_ref[:]
    if i < len(rest) - 1:
      y = jax.nn.relu(y).astype(dtype)
  rgb_ref[:] = y.astype(jnp.float32)


def fused_mlp_level(params: Dict[str, Any],
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
                    tile_n: int = 4096,
                    use_bfloat16: bool = True,
                    return_weights: bool = False,
                    interpret: bool = False) -> Dict[str, jnp.ndarray]:
  """Renders one level with flat 2-D MLP kernels + XLA compositing.

  Alternative to `fused_render_level`: the MLP runs as fat (tile_n, D)
  matmul-chain kernels over flattened samples (XLA reshapes HBM arrays for
  free; only in-kernel sublane<->lane relayouts are forbidden), and the
  cheap compositing runs in XLA. Compared to the fully-fused path this
  trades one small (N, width) handoff per segment for 2-D matmuls that
  Mosaic schedules much better than batched 3-D dots.
  """
  from nerfies_tpu.ops import rendering as rendering_lib

  batch, total_s, _ = points.shape
  n = batch * total_s
  has_cond = rgb_condition is not None
  dtype = jnp.bfloat16 if use_bfloat16 else jnp.float32
  if n % tile_n:
    tile_n = math_gcd_tile(n)
  grid = (n // tile_n,)

  x_pe = encoding_lib.posenc(points, num_freqs=num_freqs)
  pe_dim = x_pe.shape[-1]
  x_pe = x_pe.reshape(n, pe_dim).astype(dtype)

  def row_spec(d):
    return pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

  def resident1(a):
    return pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM)

  h = x_pe
  for seg_idx, layer_ids in enumerate(
      _segment_bounds(trunk_depth, MAX_LAYERS_PER_KERNEL)):
    seg_weights = []
    for g in layer_ids:
      layer = params[f'trunk_hidden_{g}']
      seg_weights += [layer['kernel'], layer['bias']]
    width = seg_weights[0].shape[1]
    kernel = functools.partial(
        _flat_segment_kernel, layer_ids=layer_ids, skips=tuple(skips),
        first_segment=seg_idx == 0, dtype=dtype)
    h = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([row_spec(pe_dim), row_spec(h.shape[-1])]
                  + [resident1(w) for w in seg_weights]),
        out_specs=row_spec(width),
        out_shape=jax.ShapeDtypeStruct((n, width), dtype),
        interpret=interpret,
    )(x_pe, h, *seg_weights)

  head_weights = []
  rgb_width = None
  if has_cond:
    head_weights += [params['bottleneck']['kernel'],
                     params['bottleneck']['bias']]
    bneck_dim = params['bottleneck']['kernel'].shape[1]
    first_rgb = (params['rgb_hidden_0'] if rgb_branch_depth > 0
                 else params['rgb_logit'])
    w0 = first_rgb['kernel']
    rgb_width = w0.shape[1]
    cond_term = (rgb_condition @ w0[bneck_dim:]).astype(jnp.float32)
    # Broadcast the per-ray term to per-sample rows (XLA).
    cond_term_flat = jnp.broadcast_to(
        cond_term[:, None, :], (batch, total_s, rgb_width)).reshape(
            n, rgb_width)
    head_weights += [w0[:bneck_dim], first_rgb['bias']]
    for i in range(1, rgb_branch_depth):
      layer = params[f'rgb_hidden_{i}']
      head_weights += [layer['kernel'], layer['bias']]
    if rgb_branch_depth > 0:
      head_weights += [params['rgb_logit']['kernel'],
                       params['rgb_logit']['bias']]
  else:
    cond_term_flat = jnp.zeros((n, 1), jnp.float32)
    for i in range(rgb_branch_depth):
      layer = params[f'rgb_hidden_{i}']
      head_weights += [layer['kernel'], layer['bias']]
    head_weights += [params['rgb_logit']['kernel'],
                     params['rgb_logit']['bias']]
  head_weights += [params['alpha_logit']['kernel'],
                   params['alpha_logit']['bias']]

  kernel = functools.partial(
      _flat_heads_kernel, rgb_branch_depth=rgb_branch_depth,
      has_cond=has_cond, dtype=dtype)
  raw_sigma, rgb_raw = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=([row_spec(h.shape[-1]), row_spec(cond_term_flat.shape[-1])]
                + [resident1(w) for w in head_weights]),
      out_specs=[row_spec(1), row_spec(3)],
      out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                 jax.ShapeDtypeStruct((n, 3), jnp.float32)],
      interpret=interpret,
  )(h, cond_term_flat, *head_weights)

  # Activations + compositing in XLA (cheap, fuses well).
  act = jax.nn.relu if sigma_activation == 'relu' else jax.nn.softplus
  sigma = act(raw_sigma.reshape(batch, total_s))
  rgb = jax.nn.sigmoid(rgb_raw.reshape(batch, total_s, 3))
  return rendering_lib.volumetric_rendering(
      rgb, sigma, z_vals, directions,
      use_white_background=use_white_background,
      sample_at_infinity=sample_at_infinity,
      return_weights=return_weights)


def math_gcd_tile(n: int, preferred: int = 4096) -> int:
  """Largest divisor of n that is <= preferred and a multiple of 8."""
  tile = min(preferred, n)
  while tile > 8 and (n % tile or tile % 8):
    tile -= 8
  return max(tile, 8)
