"""Fused MLP-stack Pallas kernels: the NeRF/warp trunks at one HBM pass.

Why this exists: the round-3 roofline analysis (docs/PERFORMANCE.md) shows
the XLA per-layer execution of the NeRF and warp MLPs is HBM-bandwidth
bound — every 256-wide layer moves ~800 MB of activations for ~100 GFLOP
of work (~128 FLOP/byte against a ~240 FLOP/byte v5e ridge point), capping
the trunk at ~97 TF/s and the 128-wide warp layers at ~59 TF/s no matter
how the matmuls are laid out. These kernels run the ENTIRE stack (trunk +
skip + heads) over a row tile resident in VMEM: per row the only HBM
traffic is the positional encoding in and the head outputs out, lifting
arithmetic intensity ~8x and making the stack compute-bound.

Semantics exactly match the flax modules (modules.NerfMLP / the warp-field
trunk built from modules.MLP + SplitDense): same parameter tensors, same
concat row order, f32 matmul accumulation with bf16 inter-layer storage.
Per-RAY condition terms (viewdirs/GLO codes) enter as precomputed per-row
bias tensors — the `cond @ kernel_block` product is done outside (it is
per-ray, S times smaller) and broadcast to rows, preserving the
SplitDense "never tile conditions into the batch" contract at the HBM
level that matters (the (N, width) bias read is a few-percent overhead).

Used by the fast serving/render path (nerfies_tpu/fast_render.py); the
training step keeps the XLA path (remat + autodiff). Interpret mode makes
every kernel testable on CPU (tests/test_fused_mlp.py).

Reference workload shapes: /root/reference/configs/gpu_quarterhd.gin
(trunk 8x256 skip(4,), warp trunk 6x128 skip(4,)).
"""

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row tile: 8 rays x 128 samples at the quarter-HD sampling rate.
# 1024 rows x 256 ch x 4 B (f32 accum) = 1 MB live per intermediate.
_TILE = 1024


def _pad_last(x: jnp.ndarray, to: int) -> jnp.ndarray:
  pad = to - x.shape[-1]
  if pad <= 0:
    return x
  return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _pad_rows(w: jnp.ndarray, to: int) -> jnp.ndarray:
  pad = to - w.shape[0]
  if pad <= 0:
    return w
  return jnp.pad(w, [(0, pad), (0, 0)])


def _dot(a, b):
  return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _wrow(w: jnp.ndarray) -> jnp.ndarray:
  """(C,) bias -> (1, C) VMEM-friendly row."""
  return w.reshape(1, -1)


# --------------------------------------------------------------- NeRF MLP

def nerf_mlp_forward(x: jnp.ndarray,
                     rgb_row_bias: Optional[jnp.ndarray],
                     params: dict,
                     *,
                     trunk_depth: int,
                     skips: Tuple[int, ...],
                     interpret: bool = False) -> jnp.ndarray:
  """Fused forward of modules.NerfMLP (rgb_branch_depth=1, alpha depth 0).

  Args:
    x: (N, C_pe) point encodings (bf16 ok). N must be positive.
    rgb_row_bias: (N, rgb_width) per-row rgb-branch condition term
      (cond @ rgb_hidden_kernel[bottleneck_width:]), or None when the
      model has no bottleneck/conditions at all.
    params: the flax param subtree of one NerfMLP, i.e.
      {'trunk_hidden_i': {kernel,bias}, 'bottleneck'?, 'rgb_hidden_0'?,
       'rgb_logit', 'alpha_logit'}.
    trunk_depth / skips: static architecture (modules.NerfMLP attrs).
    interpret: run in the Pallas interpreter (CPU testing).

  Returns:
    (alpha, rgb): (N, 8) f32 each — alpha[:, 0] is the raw sigma
    (WITHOUT any per-ray alpha-condition term, which is linear and added
    by the caller), rgb[:, :3] the raw rgb logits.
  """
  n, c_in = x.shape
  if params['trunk_hidden_0']['kernel'].shape[0] != c_in:
    raise ValueError(
        'trunk layer 0 consumes extra (condition) rows; the fused kernel '
        'supports trunk_condition=None only')
  c_pad = 128 * ((c_in + 127) // 128)
  dtype = jnp.bfloat16
  x = _pad_last(x, c_pad).astype(dtype)

  trunk_w = []
  trunk_skip_w = []
  trunk_b = []
  width = params['trunk_hidden_0']['kernel'].shape[1]
  for i in range(trunk_depth):
    k = params[f'trunk_hidden_{i}']['kernel']
    if i == 0:
      trunk_w.append(_pad_rows(k, c_pad))
      trunk_skip_w.append(None)
    elif i in skips:
      trunk_w.append(k[:width])
      trunk_skip_w.append(_pad_rows(k[width:width + c_in], c_pad))
    else:
      trunk_w.append(k)
      trunk_skip_w.append(None)
    trunk_b.append(params[f'trunk_hidden_{i}']['bias'])

  has_bottleneck = 'bottleneck' in params
  has_rgb_hidden = 'rgb_hidden_0' in params
  rgb_logit_k = params['rgb_logit']['kernel']
  rgb_logit_b = params['rgb_logit']['bias']
  alpha_logit_k = params['alpha_logit']['kernel']
  alpha_logit_b = params['alpha_logit']['bias']

  weights = []

  def add_w(w):
    weights.append(w.astype(dtype))
    return len(weights) - 1

  iw = [add_w(w) for w in trunk_w]
  isw = {i: add_w(w) for i, w in enumerate(trunk_skip_w) if w is not None}
  ib = [add_w(_wrow(b)) for b in trunk_b]
  if has_bottleneck:
    i_bot = add_w(params['bottleneck']['kernel'])
    i_bot_b = add_w(_wrow(params['bottleneck']['bias']))
  if has_rgb_hidden:
    # Rows [0:width] consume the bottleneck (or trunk) output; condition
    # rows are folded into rgb_row_bias by the caller.
    rk = params['rgb_hidden_0']['kernel']
    i_rgbh = add_w(rk[:width])
    i_rgbh_b = add_w(_wrow(params['rgb_hidden_0']['bias']))
  i_rgbl = add_w(_pad_last(rgb_logit_k, 8))
  i_rgbl_b = add_w(_wrow(_pad_last(rgb_logit_b, 8)))
  # Alpha head: rows [0:width] (condition rows are per-ray-linear and
  # added by the caller).
  i_al = add_w(_pad_last(alpha_logit_k[:width], 8))
  i_al_b = add_w(_wrow(_pad_last(alpha_logit_b, 8)))

  has_rgb_bias = rgb_row_bias is not None
  if has_rgb_bias:
    rgb_row_bias = rgb_row_bias.astype(dtype)

  tile = min(_TILE, n)
  pad_n = (-n) % tile
  if pad_n:
    x = jnp.pad(x, ((0, pad_n), (0, 0)))
    if has_rgb_bias:
      rgb_row_bias = jnp.pad(rgb_row_bias, ((0, pad_n), (0, 0)))
  n_padded = n + pad_n

  def kernel(*refs):
    if has_rgb_bias:
      x_ref, bias_ref, *w_refs, alpha_ref, rgb_ref = refs
    else:
      x_ref, *w_refs, alpha_ref, rgb_ref = refs
    xt = x_ref[:]
    h = None
    for i in range(trunk_depth):
      acc = _dot(xt if h is None else h, w_refs[iw[i]][:])
      if i in isw:
        acc = acc + _dot(xt, w_refs[isw[i]][:])
      acc = acc + w_refs[ib[i]][:].astype(jnp.float32)
      h = jnp.maximum(acc, 0.0).astype(xt.dtype)

    if has_bottleneck:
      bottleneck = (_dot(h, w_refs[i_bot][:])
                    + w_refs[i_bot_b][:].astype(jnp.float32)).astype(
                        xt.dtype)
    else:
      bottleneck = h

    alpha = _dot(bottleneck if has_bottleneck else h, w_refs[i_al][:]) \
        + w_refs[i_al_b][:].astype(jnp.float32)

    if has_rgb_hidden:
      acc = _dot(bottleneck, w_refs[i_rgbh][:]) \
          + w_refs[i_rgbh_b][:].astype(jnp.float32)
      if has_rgb_bias:
        acc = acc + bias_ref[:].astype(jnp.float32)
      y = jnp.maximum(acc, 0.0).astype(xt.dtype)
    else:
      y = bottleneck
    rgb = _dot(y, w_refs[i_rgbl][:]) + w_refs[i_rgbl_b][:].astype(
        jnp.float32)

    alpha_ref[:] = alpha
    rgb_ref[:] = rgb

  in_specs = [pl.BlockSpec((tile, c_pad), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)]
  operands = [x]
  if has_rgb_bias:
    in_specs.append(pl.BlockSpec((tile, rgb_row_bias.shape[1]),
                                 lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(rgb_row_bias)
  for w in weights:
    in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(w)

  alpha, rgb = pl.pallas_call(
      kernel,
      out_shape=[jax.ShapeDtypeStruct((n_padded, 8), jnp.float32),
                 jax.ShapeDtypeStruct((n_padded, 8), jnp.float32)],
      grid=(n_padded // tile,),
      in_specs=in_specs,
      out_specs=[pl.BlockSpec((tile, 8), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((tile, 8), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)],
      interpret=interpret,
  )(*operands)
  return alpha[:n], rgb[:n]


# --------------------------------------------------------------- warp MLP

def warp_trunk_forward(x: jnp.ndarray,
                       row_biases: Sequence[Tuple[int, jnp.ndarray]],
                       params: dict,
                       *,
                       trunk_depth: int,
                       skips: Tuple[int, ...],
                       head_key: str = 'branches_wv',
                       interpret: bool = False) -> jnp.ndarray:
  """Fused forward of the SE(3)/translation warp trunk + linear head.

  Args:
    x: (N, C_pe) warp point encodings.
    row_biases: [(layer_index, (N, width) bias)] per-row condition terms
      (the metadata-embedding contribution at layer 0 and each skip).
    params: warp-field param subtree containing 'trunk' and the head
      (e.g. 'branches_wv' fused logit or a TranslationField-style 'mlp').
    trunk_depth / skips: static architecture.
    head_key: name of the head branch holding {'logit': {kernel, bias}}.

  Returns:
    (N, 8) f32 head output (head channels zero-padded to 8).
  """
  n, c_in = x.shape
  c_pad = 128 * ((c_in + 127) // 128)
  dtype = jnp.bfloat16
  x = _pad_last(x, c_pad).astype(dtype)

  trunk = params['trunk']
  width = trunk['hidden_0']['kernel'].shape[1]
  head = params[head_key]['logit']

  weights = []

  def add_w(w):
    weights.append(w.astype(dtype))
    return len(weights) - 1

  iw, isw, ib = [], {}, []
  for i in range(trunk_depth):
    k = trunk[f'hidden_{i}']['kernel']
    if i == 0:
      iw.append(add_w(_pad_rows(k[:c_in], c_pad)))
    elif i in skips:
      iw.append(add_w(k[:width]))
      isw[i] = add_w(_pad_rows(k[width:width + c_in], c_pad))
    else:
      iw.append(add_w(k))
    ib.append(add_w(_wrow(trunk[f'hidden_{i}']['bias'])))
  i_head = add_w(_pad_last(head['kernel'], 8))
  i_head_b = add_w(_wrow(_pad_last(head['bias'], 8)))

  bias_layers = [layer for layer, _ in row_biases]
  bias_arrays = [b.astype(dtype) for _, b in row_biases]

  tile = min(_TILE, n)
  pad_n = (-n) % tile
  if pad_n:
    x = jnp.pad(x, ((0, pad_n), (0, 0)))
    bias_arrays = [jnp.pad(b, ((0, pad_n), (0, 0))) for b in bias_arrays]
  n_padded = n + pad_n

  def kernel(*refs):
    x_ref = refs[0]
    bias_refs = refs[1:1 + len(bias_arrays)]
    w_refs = refs[1 + len(bias_arrays):-1]
    o_ref = refs[-1]
    xt = x_ref[:]
    h = None
    for i in range(trunk_depth):
      acc = _dot(xt if h is None else h, w_refs[iw[i]][:])
      if i in isw:
        acc = acc + _dot(xt, w_refs[isw[i]][:])
      if i in bias_layers:
        acc = acc + bias_refs[bias_layers.index(i)][:].astype(jnp.float32)
      acc = acc + w_refs[ib[i]][:].astype(jnp.float32)
      h = jnp.maximum(acc, 0.0).astype(xt.dtype)
    o_ref[:] = _dot(h, w_refs[i_head][:]) + w_refs[i_head_b][:].astype(
        jnp.float32)

  in_specs = [pl.BlockSpec((tile, c_pad), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)]
  operands = [x]
  for b in bias_arrays:
    in_specs.append(pl.BlockSpec((tile, b.shape[1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(b)
  for w in weights:
    in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(w)

  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n_padded, 8), jnp.float32),
      grid=(n_padded // tile,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(*operands)
  return out[:n]
