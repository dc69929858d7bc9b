"""NeRF building-block modules, shaped for the TPU MXU.

Capability parity with /root/reference/nerfies/modules.py:26-322, with two
structural differences that matter on TPU:

  1. Everything operates on natively batched arrays ``(..., C)`` -- there is
     no `vmap_module` tower, so XLA sees (B*S, C) x (C, W) matmuls it can
     tile directly onto the 128x128 systolic array.
  2. Per-ray conditions (viewdirs, GLO codes) are NEVER tiled to the sample
     dimension. `SplitDense` computes ``concat([per_sample, per_ray]) @ W``
     as ``per_sample @ W_top + per_ray @ W_bottom`` with a single fused
     kernel parameter: identical math and identical glorot fan-in to the
     reference's tile+concat+Dense (modules.py:114-122,142-164), but the
     per-ray matmul is S times smaller and the (B, S, C_cond) intermediate
     never exists in HBM.
"""

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfies_tpu.ops import encoding

Activation = Callable[[jnp.ndarray], jnp.ndarray]
Initializer = Any


def identity_initializer(key, shape):
  """Identity-matrix kernel init (parity: reference model_utils.py:331)."""
  del key
  max_shape = max(shape)
  return jnp.eye(max_shape)[:shape[0], :shape[1]]


class MLP(nn.Module):
  """Generic skip-MLP over ``(..., C)`` inputs.

  Parity: reference modules.py:26-62 (hidden stack with input-concat skips,
  optional output head). The input may also be a LIST of arrays with
  broadcast-compatible batch shapes (e.g. per-sample features + per-ray
  codes): the first layer and every skip layer then run as `SplitDense`
  -- mathematically the broadcast+concat+Dense, with identical parameter
  shapes/fan-in, but the low-rank inputs are never tiled to the full
  batch in HBM.
  """
  depth: int
  width: int
  hidden_init: Initializer = nn.initializers.xavier_uniform()
  hidden_activation: Activation = nn.relu
  output_init: Optional[Initializer] = None
  output_channels: int = 0
  output_activation: Optional[Activation] = None
  use_bias: bool = True
  skips: Tuple[int, ...] = ()
  # Compute dtype: None = inputs' dtype; jnp.bfloat16 runs the matmuls on
  # the MXU at 2x throughput (params stay float32).
  dtype: Any = None

  @nn.compact
  def __call__(self, x):
    inputs = list(x) if isinstance(x, (list, tuple)) else [x]
    x = None
    for i in range(self.depth):
      layer_inputs = (inputs if x is None
                      else ([x] + inputs if i in self.skips else [x]))
      x = SplitDense(
          self.width,
          use_bias=self.use_bias,
          kernel_init=self.hidden_init,
          dtype=self.dtype,
          name=f'hidden_{i}')(layer_inputs)
      x = self.hidden_activation(x)
    if self.output_channels > 0:
      output_init = self.output_init or nn.initializers.xavier_uniform()
      x = SplitDense(
          self.output_channels,
          use_bias=self.use_bias,
          kernel_init=output_init,
          dtype=self.dtype,
          name='logit')(inputs if x is None else [x])
      if self.output_activation is not None:
        x = self.output_activation(x)
    elif x is None:
      raise ValueError('depth == 0 with no output head.')
    return x


class SplitDense(nn.Module):
  """Dense over the concat of inputs with different batch ranks.

  Given inputs ``x_i`` whose shapes are ``batch_i + (C_i,)`` where every
  ``batch_i`` broadcasts against the full batch shape, computes the same
  result as broadcasting each input to the full batch, concatenating on the
  channel axis, and applying one Dense layer -- without materializing the
  broadcast. A single ``(sum C_i, features)`` kernel parameter keeps the
  initializer's fan-in identical to the concat formulation.

  Full-batch operands are flattened to 2-D for the matmul (and the result
  reshaped back): XLA assigns per-operand layouts for 3-D ``(B, S, C)``
  dots that run the MXU at 16-29 TF/s on the posenc-fed warp/skip layers
  (round-2 profile, docs/SCALING.md), while the equivalent
  ``(B*S, C) @ (C, W)`` 2-D form tiles cleanly; consecutive layers'
  reshape pairs cancel in XLA, so the hidden chain effectively runs 2-D
  end to end with the per-ray terms broadcast-added in 3-D.
  """
  features: int
  use_bias: bool = True
  kernel_init: Initializer = nn.initializers.xavier_uniform()
  bias_init: Initializer = nn.initializers.zeros
  dtype: Any = None

  @nn.compact
  def __call__(self, inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    in_dims = [x.shape[-1] for x in inputs]
    kernel = self.param('kernel', self.kernel_init,
                        (sum(in_dims), self.features))
    if self.dtype is not None:
      kernel = kernel.astype(self.dtype)
      inputs = [x.astype(self.dtype) for x in inputs]
    batch_shape = jnp.broadcast_shapes(*[x.shape[:-1] for x in inputs])
    out = None
    offset = 0
    for x, dim in zip(inputs, in_dims):
      block = kernel[offset:offset + dim]
      if x.shape[:-1] == batch_shape and x.ndim > 2:
        term = (x.reshape(-1, dim) @ block).reshape(
            *batch_shape, self.features)
      else:
        term = x @ block
      out = term if out is None else out + term
      offset += dim
    if self.use_bias:
      bias = self.param('bias', self.bias_init, (self.features,))
      if self.dtype is not None:
        bias = bias.astype(self.dtype)
      out = out + bias
    return out


class NerfMLP(nn.Module):
  """The two-branch NeRF template MLP.

  Structure parity with reference modules.py:65-169: a trunk with skip
  connections, a bottleneck projection when any condition is present, then
  alpha (density) and rgb branches each conditioned via concat -- realized
  here with `SplitDense` so per-ray conditions stay per-ray.

  Call shapes: ``x`` is (B, S, C_point); conditions are per-ray (B, C) or
  None. Returns {'rgb': (B, S, rgb_channels), 'alpha': (B, S, alpha_ch)}.
  """
  trunk_depth: int = 8
  trunk_width: int = 256

  rgb_branch_depth: int = 1
  rgb_branch_width: int = 128
  rgb_channels: int = 3

  alpha_branch_depth: int = 0
  alpha_branch_width: int = 128
  alpha_channels: int = 1

  activation: Activation = nn.relu
  skips: Tuple[int, ...] = (4,)
  dtype: Any = None

  @nn.compact
  def __call__(self, x, trunk_condition, alpha_condition, rgb_condition):
    glorot = jax.nn.initializers.glorot_uniform()

    def expand_ray(c):
      # Per-ray (B, C) -> broadcastable (B, 1, C) against samples.
      return c[..., None, :] if c.ndim == x.ndim - 1 else c

    trunk_condition = (None if trunk_condition is None
                       else expand_ray(trunk_condition))
    alpha_condition = (None if alpha_condition is None
                       else expand_ray(alpha_condition))
    rgb_condition = (None if rgb_condition is None
                     else expand_ray(rgb_condition))

    # Trunk. The conceptual input is concat([x, trunk_condition]); skips
    # re-concat that input, so each skip layer is a SplitDense over
    # (hidden, x, trunk_condition).
    trunk_inputs = [x] if trunk_condition is None else [x, trunk_condition]
    h = None
    for i in range(self.trunk_depth):
      layer_inputs = trunk_inputs if h is None else (
          [h] + trunk_inputs if i in self.skips else [h])
      h = SplitDense(self.trunk_width, kernel_init=glorot, dtype=self.dtype,
                     name=f'trunk_hidden_{i}')(layer_inputs)
      h = self.activation(h)

    if (alpha_condition is not None) or (rgb_condition is not None):
      bottleneck = nn.Dense(self.trunk_width, kernel_init=glorot,
                            dtype=self.dtype, name='bottleneck')(h)
    else:
      bottleneck = None

    def branch(name, condition, depth, width, out_channels):
      if condition is None:
        inputs = [h]
      else:
        inputs = [bottleneck, condition]
      y = None
      for i in range(depth):
        y = SplitDense(width, kernel_init=glorot, dtype=self.dtype,
                       name=f'{name}_hidden_{i}')(inputs if y is None else [y])
        y = self.activation(y)
      final_inputs = inputs if y is None else [y]
      # Head outputs return to float32 for sigma/rgb activations and
      # compositing.
      return SplitDense(out_channels, kernel_init=glorot, dtype=self.dtype,
                        name=f'{name}_logit')(final_inputs).astype(
                            jnp.float32)

    alpha = branch('alpha', alpha_condition, self.alpha_branch_depth,
                   self.alpha_branch_width, self.alpha_channels)
    rgb = branch('rgb', rgb_condition, self.rgb_branch_depth,
                 self.rgb_branch_width, self.rgb_channels)
    return {'rgb': rgb, 'alpha': alpha}


class TimeEncoder(nn.Module):
  """Maps a continuous timestamp to a latent code via annealed PE + MLP.

  Parity: reference modules.py:297-322.
  """
  num_freqs: int
  features: int = 10
  depth: int = 6
  width: int = 64
  skips: Tuple[int, ...] = (4,)
  hidden_init: Initializer = nn.initializers.xavier_uniform()
  output_init: Initializer = nn.initializers.uniform(scale=0.05)

  def setup(self):
    self.mlp = MLP(
        depth=self.depth,
        width=self.width,
        skips=self.skips,
        hidden_init=self.hidden_init,
        output_channels=self.features,
        output_init=self.output_init)

  def __call__(self, time, alpha=None):
    if alpha is None:
      alpha = self.num_freqs
    encoded = encoding.posenc(time, num_freqs=self.num_freqs, alpha=alpha)
    return self.mlp(encoded)
