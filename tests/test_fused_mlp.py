"""Fused Pallas MLP kernels vs the flax modules (interpret mode, CPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu.models import modules
from nerfies_tpu.ops import fused_mlp


def _nerf_mlp(depth=4, width=64, rgb_width=32, skips=(2,)):
  return modules.NerfMLP(
      trunk_depth=depth, trunk_width=width, rgb_branch_depth=1,
      rgb_branch_width=rgb_width, skips=skips, dtype=jnp.bfloat16)


@pytest.mark.parametrize('with_conditions', [True, False])
def test_nerf_mlp_forward_matches_module(with_conditions):
  B, S, C = 4, 16, 27
  depth, width, skips = 4, 64, (2,)
  mlp = _nerf_mlp(depth=depth, width=width, skips=skips)
  key = jax.random.PRNGKey(0)
  x = jax.random.normal(key, (B, S, C), jnp.float32)
  if with_conditions:
    alpha_cond = jax.random.normal(jax.random.fold_in(key, 1), (B, 5))
    rgb_cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 7))
  else:
    alpha_cond = rgb_cond = None
  params = mlp.init(key, x, None, alpha_cond, rgb_cond)['params']
  want = mlp.apply({'params': params}, x, None, alpha_cond, rgb_cond)

  flat_x = x.reshape(B * S, C).astype(jnp.bfloat16)
  if with_conditions:
    rgb_k = params['rgb_hidden_0']['kernel']
    rgb_bias = (rgb_cond.astype(jnp.bfloat16)
                @ rgb_k[width:].astype(jnp.bfloat16))  # (B, rgb_width)
    rgb_row_bias = jnp.repeat(rgb_bias, S, axis=0)
    alpha_k = params['alpha_logit']['kernel']
    alpha_term = (alpha_cond.astype(jnp.bfloat16)
                  @ alpha_k[width:].astype(jnp.bfloat16))  # (B, 1)
  else:
    rgb_row_bias = None
  alpha, rgb = fused_mlp.nerf_mlp_forward(
      flat_x, rgb_row_bias, params, trunk_depth=depth, skips=skips,
      interpret=True)
  sigma = alpha[:, 0].reshape(B, S, 1)
  if with_conditions:
    sigma = sigma + alpha_term.astype(jnp.float32)[:, None, :]
  rgb = rgb[:, :3].reshape(B, S, 3)

  np.testing.assert_allclose(np.asarray(sigma),
                             np.asarray(want['alpha']),
                             atol=0.05, rtol=0.05)
  np.testing.assert_allclose(np.asarray(rgb), np.asarray(want['rgb']),
                             atol=0.05, rtol=0.05)


def test_warp_trunk_forward_matches_mlp():
  B, S, C_pe, F_meta = 4, 16, 21, 8
  depth, width, skips = 4, 64, (2,)
  mlp = modules.MLP(depth=depth, width=width, skips=skips,
                    output_channels=6, dtype=jnp.bfloat16,
                    output_init=nn.initializers.uniform(scale=1e-2))
  key = jax.random.PRNGKey(1)
  pe = jax.random.normal(key, (B, S, C_pe), jnp.float32)
  meta = jax.random.normal(jax.random.fold_in(key, 1), (B, 1, F_meta))
  params = mlp.init(key, [pe, meta])['params']
  want = mlp.apply({'params': params}, [pe, meta])

  # Repackage the MLP params into the warp-field naming the kernel expects.
  trunk = {f'hidden_{i}': params[f'hidden_{i}'] for i in range(depth)}
  warp_params = {'trunk': trunk, 'branches_wv': {'logit': params['logit']}}

  bf16 = jnp.bfloat16
  meta_flat = jnp.repeat(meta[:, 0].astype(bf16), S, axis=0)  # (N, F)
  k0 = params['hidden_0']['kernel']
  bias0 = meta_flat @ k0[C_pe:].astype(bf16)
  k_skip = params[f'hidden_{skips[0]}']['kernel']
  bias_skip = meta_flat @ k_skip[width + C_pe:].astype(bf16)

  out = fused_mlp.warp_trunk_forward(
      pe.reshape(B * S, C_pe).astype(bf16),
      [(0, bias0), (skips[0], bias_skip)],
      warp_params, trunk_depth=depth, skips=skips, interpret=True)
  got = out[:, :6].reshape(B, S, 6)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=0.05, rtol=0.05)


def test_ragged_rows_padded():
  """N not a multiple of the tile still computes every row."""
  depth, width, skips = 2, 32, ()
  mlp = _nerf_mlp(depth=depth, width=width, skips=skips)
  key = jax.random.PRNGKey(2)
  x = jax.random.normal(key, (1, 37, 11), jnp.float32)
  params = mlp.init(key, x, None, None, None)['params']
  want = mlp.apply({'params': params}, x, None, None, None)
  alpha, rgb = fused_mlp.nerf_mlp_forward(
      x.reshape(37, 11), None, params, trunk_depth=depth, skips=skips,
      interpret=True)
  np.testing.assert_allclose(alpha[:, 0].reshape(1, 37, 1),
                             np.asarray(want['alpha']),
                             atol=0.05, rtol=0.05)
  np.testing.assert_allclose(rgb[:, :3].reshape(1, 37, 3),
                             np.asarray(want['rgb']),
                             atol=0.05, rtol=0.05)
