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


# All four condition combinations. The MIXED cases (one branch
# conditioned, the other not) are load-bearing: flax routes only the
# conditioned branch through the bottleneck (modules.py:202-206), and a
# round-3 bug fed BOTH heads from the bottleneck — invisible at random
# init (sigma ~ softplus(0) either way) but catastrophic on trained
# params (black renders, the round-4 quality-bench regression).
_COND_COMBOS = [(0, 0), (5, 7), (0, 7), (5, 0)]


def _make_conditions(key, B, alpha_dims, rgb_dims):
  alpha_cond = (jax.random.normal(jax.random.fold_in(key, 1),
                                  (B, alpha_dims)) if alpha_dims else None)
  rgb_cond = (jax.random.normal(jax.random.fold_in(key, 2),
                                (B, rgb_dims)) if rgb_dims else None)
  return alpha_cond, rgb_cond


@pytest.mark.parametrize('alpha_dims,rgb_dims', _COND_COMBOS)
def test_nerf_mlp_forward_matches_module(alpha_dims, rgb_dims):
  B, S, C = 4, 16, 27
  depth, width, skips = 4, 64, (2,)
  mlp = _nerf_mlp(depth=depth, width=width, skips=skips)
  key = jax.random.PRNGKey(0)
  x = jax.random.normal(key, (B, S, C), jnp.float32)
  alpha_cond, rgb_cond = _make_conditions(key, B, alpha_dims, rgb_dims)
  params = mlp.init(key, x, None, alpha_cond, rgb_cond)['params']
  want = mlp.apply({'params': params}, x, None, alpha_cond, rgb_cond)

  flat_x = x.reshape(B * S, C).astype(jnp.bfloat16)
  if rgb_cond is not None:
    rgb_k = params['rgb_hidden_0']['kernel']
    rgb_bias = (rgb_cond.astype(jnp.bfloat16)
                @ rgb_k[width:].astype(jnp.bfloat16))  # (B, rgb_width)
    rgb_row_bias = jnp.repeat(rgb_bias, S, axis=0)
  else:
    rgb_row_bias = None
  if alpha_cond is not None:
    alpha_k = params['alpha_logit']['kernel']
    alpha_term = (alpha_cond.astype(jnp.bfloat16)
                  @ alpha_k[width:].astype(jnp.bfloat16))  # (B, 1)
  alpha, rgb = fused_mlp.nerf_mlp_forward(
      flat_x, rgb_row_bias, params, trunk_depth=depth, skips=skips,
      interpret=True)
  sigma = alpha[:, 0].reshape(B, S, 1)
  if alpha_cond is not None:
    sigma = sigma + alpha_term.astype(jnp.float32)[:, None, :]
  rgb = rgb[:, :3].reshape(B, S, 3)

  np.testing.assert_allclose(np.asarray(sigma),
                             np.asarray(want['alpha']),
                             atol=0.05, rtol=0.05)
  np.testing.assert_allclose(np.asarray(rgb), np.asarray(want['rgb']),
                             atol=0.05, rtol=0.05)


@pytest.mark.parametrize('alpha_dims,rgb_dims', _COND_COMBOS)
def test_nerf_mlp_trained_scale_params_match(alpha_dims, rgb_dims):
  """Forward parity on TRAINED-SCALE params (large weights, f32).

  Random glorot init hides head-routing bugs because sigma saturates to
  softplus(~0) regardless of which tensor feeds the alpha head; scaling
  the params to trained magnitudes makes any routing difference O(100)
  in the raw logits.
  """
  B, S, C = 4, 16, 27
  depth, width, skips = 4, 64, (2,)
  mlp = modules.NerfMLP(
      trunk_depth=depth, trunk_width=width, rgb_branch_depth=1,
      rgb_branch_width=32, skips=skips, dtype=None)  # f32: exact compare
  key = jax.random.PRNGKey(7)
  x = jax.random.normal(key, (B, S, C), jnp.float32)
  alpha_cond, rgb_cond = _make_conditions(key, B, alpha_dims, rgb_dims)
  params = mlp.init(key, x, None, alpha_cond, rgb_cond)['params']
  params = jax.tree.map(lambda p: 3.0 * p, params)
  want = mlp.apply({'params': params}, x, None, alpha_cond, rgb_cond)

  flat_x = x.reshape(B * S, C)
  if rgb_cond is not None:
    rgb_k = params['rgb_hidden_0']['kernel']
    rgb_row_bias = jnp.repeat(rgb_cond @ rgb_k[width:], S, axis=0)
  else:
    rgb_row_bias = None
  alpha, rgb = fused_mlp.nerf_mlp_reference(
      flat_x, rgb_row_bias, params, trunk_depth=depth, skips=skips)
  sigma = alpha[:, 0].reshape(B, S, 1)
  if alpha_cond is not None:
    alpha_k = params['alpha_logit']['kernel']
    sigma = sigma + (alpha_cond @ alpha_k[width:])[:, None, :]
  # bf16 inter-layer storage in the fused path: compare at bf16 relative
  # scale of the (now large) activations.
  scale = max(1.0, float(np.abs(np.asarray(want['alpha'])).max()))
  np.testing.assert_allclose(
      np.asarray(sigma) / scale, np.asarray(want['alpha']) / scale,
      atol=0.05)
  rscale = max(1.0, float(np.abs(np.asarray(want['rgb'])).max()))
  np.testing.assert_allclose(
      np.asarray(rgb[:, :3].reshape(B, S, 3)) / rscale,
      np.asarray(want['rgb']) / rscale, atol=0.05)


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


@pytest.mark.parametrize('alpha_dims,rgb_dims', _COND_COMBOS)
def test_nerf_mlp_train_grads_match_module(alpha_dims, rgb_dims):
  """Custom-VJP fused kernel vs jax.grad through the flax module."""
  B, S, C = 2, 8, 27
  depth, width, skips = 4, 64, (2,)
  mlp = _nerf_mlp(depth=depth, width=width, skips=skips)
  key = jax.random.PRNGKey(3)
  x = jax.random.normal(key, (B, S, C), jnp.float32)
  alpha_cond, rgb_cond = _make_conditions(key, B, alpha_dims, rgb_dims)
  params = mlp.init(key, x, None, alpha_cond, rgb_cond)['params']

  def loss_module(params, x):
    out = mlp.apply({'params': params}, x, None, alpha_cond, rgb_cond)
    return (out['rgb'] ** 2).mean() + (out['alpha'] ** 2).mean()

  def loss_fused(params, x):
    bf16 = jnp.bfloat16
    flat_x = x.reshape(B * S, C)
    if rgb_cond is not None:
      rgb_k = params['rgb_hidden_0']['kernel']
      rgb_row_bias = jnp.repeat(
          rgb_cond.astype(bf16) @ rgb_k[width:].astype(bf16), S, axis=0)
    else:
      rgb_row_bias = None
    alpha, rgb = fused_mlp.nerf_mlp_train(
        flat_x.astype(bf16), rgb_row_bias, params, depth, skips, True)
    sigma = alpha[:, :1].reshape(B, S, 1)
    if alpha_cond is not None:
      alpha_k = params['alpha_logit']['kernel']
      sigma = sigma + (alpha_cond.astype(bf16)
                       @ alpha_k[width:].astype(bf16)).astype(
                           jnp.float32)[:, None, :]
    rgb = rgb[:, :3].reshape(B, S, 3)
    return (rgb ** 2).mean() + (sigma ** 2).mean()

  # Ground truth: the SAME architecture in float32 (both the bf16 module
  # and the bf16 fused kernel carry accumulation noise of similar size;
  # each must sit within bf16 distance of the f32 reference).
  mlp32 = modules.NerfMLP(
      trunk_depth=depth, trunk_width=width, rgb_branch_depth=1,
      rgb_branch_width=32, skips=skips, dtype=None)

  def loss_f32(params, x):
    out = mlp32.apply({'params': params}, x, None, alpha_cond, rgb_cond)
    return (out['rgb'] ** 2).mean() + (out['alpha'] ** 2).mean()

  v_r, g_r = jax.value_and_grad(loss_f32)(params, x)
  v_m, g_m = jax.value_and_grad(loss_module)(params, x)
  v_f, g_f = jax.value_and_grad(loss_fused)(params, x)
  np.testing.assert_allclose(float(v_f), float(v_r), rtol=0.05)
  np.testing.assert_allclose(float(v_m), float(v_r), rtol=0.05)

  def check(tree, tag):
    # bf16 accumulation noise on individual entries reaches tens of
    # percent by trunk layer 0 (the bf16 MODULE itself does too), so
    # compare gradient DIRECTIONS and magnitudes per leaf.
    flat_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(tree)[0]
    for (path_r, leaf_r), (path_t, leaf_t) in zip(flat_r, flat_t):
      assert path_r == path_t
      a = np.asarray(leaf_r, np.float64).ravel()
      b = np.asarray(leaf_t, np.float64).ravel()
      na, nb = np.linalg.norm(a), np.linalg.norm(b)
      if na < 1e-6:
        continue
      cos = float(a @ b / (na * nb))
      assert cos > 0.98, f'{tag} {path_r}: cosine {cos}'
      assert 0.8 < nb / na < 1.25, f'{tag} {path_r}: norms {nb}/{na}'

  check(g_m, 'module-bf16')  # tolerance sanity: the bf16 module itself
  check(g_f, 'fused-kernel')

  # d/dx parity too (same criterion).
  gx_r = np.asarray(jax.grad(loss_f32, argnums=1)(params, x),
                    np.float64).ravel()
  gx_f = np.asarray(jax.grad(loss_fused, argnums=1)(params, x),
                    np.float64).ravel()
  cos = float(gx_r @ gx_f / (np.linalg.norm(gx_r) * np.linalg.norm(gx_f)))
  assert cos > 0.98, cos
