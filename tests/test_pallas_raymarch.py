"""Fused Pallas ray-march kernel vs the unfused XLA reference path.

Runs in pallas interpret mode on CPU; the same kernel compiles for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu.models import modules
from nerfies_tpu.ops import encoding
from nerfies_tpu.ops import rendering
from nerfies_tpu.ops.pallas import raymarch


def _reference_level(params, points, z_vals, directions, rgb_cond, *,
                     num_freqs, sigma_activation, use_white_background,
                     sample_at_infinity, mlp):
  pe = encoding.posenc(points, num_freqs=num_freqs)
  raw = mlp.apply({'params': params}, pe, None, None, rgb_cond)
  rgb = jax.nn.sigmoid(raw['rgb'])
  act = jax.nn.relu if sigma_activation == 'relu' else jax.nn.softplus
  sigma = act(jnp.squeeze(raw['alpha'], -1))
  return rendering.volumetric_rendering(
      rgb, sigma, z_vals, directions,
      use_white_background=use_white_background,
      sample_at_infinity=sample_at_infinity)


def _setup(batch=64, s=128, num_freqs=4, trunk_depth=4, width=64,
           rgb_depth=1, rgb_width=32, skips=(2,), with_cond=True, seed=0):
  keys = jax.random.split(jax.random.PRNGKey(seed), 6)
  mlp = modules.NerfMLP(
      trunk_depth=trunk_depth, trunk_width=width,
      rgb_branch_depth=rgb_depth, rgb_branch_width=rgb_width,
      skips=skips)
  points = 0.5 * jax.random.normal(keys[0], (batch, s, 3))
  z_vals = jnp.sort(jax.random.uniform(keys[1], (batch, s), minval=1.0,
                                       maxval=4.0), axis=-1)
  directions = jax.random.normal(keys[2], (batch, 3))
  directions /= jnp.linalg.norm(directions, axis=-1, keepdims=True)
  cond = jax.random.normal(keys[3], (batch, 11)) if with_cond else None
  pe = encoding.posenc(points, num_freqs=num_freqs)
  params = mlp.init(keys[4], pe, None, None, cond)['params']
  # Put some real density structure in (bias the alpha logit up).
  params = jax.tree.map(lambda x: x, params)
  return mlp, params, points, z_vals, directions, cond


@pytest.mark.parametrize('with_cond', [True, False])
@pytest.mark.parametrize('sample_at_infinity', [True, False])
def test_fused_matches_reference(with_cond, sample_at_infinity):
  num_freqs = 4
  mlp, params, points, z_vals, directions, cond = _setup(
      with_cond=with_cond)
  ref = _reference_level(
      params, points, z_vals, directions, cond, num_freqs=num_freqs,
      sigma_activation='softplus', use_white_background=False,
      sample_at_infinity=sample_at_infinity, mlp=mlp)
  got = raymarch.fused_render_level(
      params, points, z_vals, directions, cond,
      num_freqs=num_freqs, trunk_depth=4, skips=(2,), rgb_branch_depth=1,
      sigma_activation='softplus', use_white_background=False,
      sample_at_infinity=sample_at_infinity,
      tile_b=16, tile_s=32, use_bfloat16=False, interpret=True)
  np.testing.assert_allclose(np.asarray(got['rgb']),
                             np.asarray(ref['rgb']), atol=2e-5)
  np.testing.assert_allclose(np.asarray(got['depth']),
                             np.asarray(ref['depth']), atol=2e-4)
  np.testing.assert_allclose(np.asarray(got['acc']),
                             np.asarray(ref['acc']), atol=2e-5)
  np.testing.assert_allclose(np.asarray(got['med_depth']),
                             np.asarray(ref['med_depth']), atol=2e-4)


def test_fused_white_background():
  num_freqs = 4
  mlp, params, points, z_vals, directions, cond = _setup(seed=1)
  ref = _reference_level(
      params, points, z_vals, directions, cond, num_freqs=num_freqs,
      sigma_activation='softplus', use_white_background=True,
      sample_at_infinity=True, mlp=mlp)
  got = raymarch.fused_render_level(
      params, points, z_vals, directions, cond,
      num_freqs=num_freqs, trunk_depth=4, skips=(2,), rgb_branch_depth=1,
      sigma_activation='softplus', use_white_background=True,
      sample_at_infinity=True,
      tile_b=16, tile_s=32, use_bfloat16=False, interpret=True)
  np.testing.assert_allclose(np.asarray(got['rgb']),
                             np.asarray(ref['rgb']), atol=2e-5)


def test_fused_tile_invariance():
  num_freqs = 4
  mlp, params, points, z_vals, directions, cond = _setup(seed=2)
  kwargs = dict(num_freqs=num_freqs, trunk_depth=4, skips=(2,),
                rgb_branch_depth=1, sigma_activation='softplus',
                use_white_background=False, sample_at_infinity=True,
                use_bfloat16=False, interpret=True)
  out1 = raymarch.fused_render_level(
      params, points, z_vals, directions, cond, tile_b=16, tile_s=32,
      **kwargs)
  out2 = raymarch.fused_render_level(
      params, points, z_vals, directions, cond, tile_b=64, tile_s=128,
      **kwargs)
  np.testing.assert_allclose(np.asarray(out1['rgb']),
                             np.asarray(out2['rgb']), atol=2e-5)
  np.testing.assert_allclose(np.asarray(out1['acc']),
                             np.asarray(out2['acc']), atol=2e-5)


def test_fused_bf16_close():
  num_freqs = 4
  mlp, params, points, z_vals, directions, cond = _setup(seed=3)
  kwargs = dict(num_freqs=num_freqs, trunk_depth=4, skips=(2,),
                rgb_branch_depth=1, sigma_activation='softplus',
                use_white_background=False, sample_at_infinity=True,
                tile_b=16, tile_s=32, interpret=True)
  f32 = raymarch.fused_render_level(
      params, points, z_vals, directions, cond, use_bfloat16=False, **kwargs)
  bf16 = raymarch.fused_render_level(
      params, points, z_vals, directions, cond, use_bfloat16=True, **kwargs)
  assert np.abs(np.asarray(f32['rgb']) - np.asarray(bf16['rgb'])).max() < 0.05


def test_fused_full_pipeline_matches_model():
  """fused_render_rays (coarse+fine+warp+conditions) vs NerfModel.apply."""
  import flax.linen as nn
  from nerfies_tpu import configs
  from nerfies_tpu import evaluation
  from nerfies_tpu.models import nerf as nerf_lib

  config = configs.ModelConfig(
      num_coarse_samples=32, num_fine_samples=32,
      nerf_trunk_depth=4, nerf_trunk_width=64,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=32,
      nerf_skips=(2,), num_nerf_point_freqs=4, num_nerf_viewdir_freqs=2,
      num_warp_freqs=2, use_warp=True, warp_field_type='se3',
      num_warp_features=3,
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 16},
      sigma_activation=nn.softplus, use_stratified_sampling=False,
      use_camera_metadata=True)
  model, params = nerf_lib.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=32,
      appearance_ids=(0,), camera_ids=(0, 1), warp_ids=(0, 1),
      near=0.5, far=3.0)

  d = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
  d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
  rays = {
      'origins': jnp.zeros((32, 3)),
      'directions': d,
      'metadata': {
          'warp': jnp.zeros((32, 1), jnp.uint32),
          'camera': jnp.ones((32, 1), jnp.uint32),
          'appearance': jnp.zeros((32, 1), jnp.uint32),
          'time': jnp.zeros((32, 1), jnp.float32),
      },
  }
  warp_extra = {'alpha': jnp.asarray(2.0), 'time_alpha': jnp.asarray(0.0)}
  ref = model.apply({'params': params}, rays, warp_extra=warp_extra)
  got = evaluation.fused_render_rays(
      model, params, rays, warp_extra, tile_b=16, tile_s=16, interpret=True)
  for level in ('coarse', 'fine'):
    np.testing.assert_allclose(np.asarray(got[level]['rgb']),
                               np.asarray(ref[level]['rgb']), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got[level]['acc']),
                               np.asarray(ref[level]['acc']), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got[level]['depth']),
                               np.asarray(ref[level]['depth']), atol=3e-4)


@pytest.mark.parametrize('with_cond', [True, False])
def test_flat_mlp_level_matches_reference(with_cond):
  num_freqs = 4
  mlp, params, points, z_vals, directions, cond = _setup(
      with_cond=with_cond)
  ref = _reference_level(
      params, points, z_vals, directions, cond, num_freqs=num_freqs,
      sigma_activation='softplus', use_white_background=False,
      sample_at_infinity=True, mlp=mlp)
  got = raymarch.fused_mlp_level(
      params, points, z_vals, directions, cond,
      num_freqs=num_freqs, trunk_depth=4, skips=(2,), rgb_branch_depth=1,
      sigma_activation='softplus', use_white_background=False,
      sample_at_infinity=True, tile_n=1024, use_bfloat16=False,
      interpret=True)
  np.testing.assert_allclose(np.asarray(got['rgb']),
                             np.asarray(ref['rgb']), atol=2e-5)
  np.testing.assert_allclose(np.asarray(got['acc']),
                             np.asarray(ref['acc']), atol=2e-5)
  np.testing.assert_allclose(np.asarray(got['med_depth']),
                             np.asarray(ref['med_depth']), atol=2e-4)


def test_fused_partial_chunk_batch():
  """Batches that are a multiple of 8 (but not of tile_b) must work —
  render_image pads partial eval chunks only to a multiple of 8."""
  num_freqs = 4
  mlp, params, points, z_vals, directions, cond = _setup(seed=4, batch=24)
  ref = _reference_level(
      params, points, z_vals, directions, cond, num_freqs=num_freqs,
      sigma_activation='softplus', use_white_background=False,
      sample_at_infinity=True, mlp=mlp)
  got = raymarch.fused_render_level(
      params, points, z_vals, directions, cond,
      num_freqs=num_freqs, trunk_depth=4, skips=(2,), rgb_branch_depth=1,
      sigma_activation='softplus', use_white_background=False,
      sample_at_infinity=True,
      tile_b=64, tile_s=32, use_bfloat16=False, interpret=True)
  np.testing.assert_allclose(np.asarray(got['rgb']),
                             np.asarray(ref['rgb']), atol=2e-5)

  with pytest.raises(ValueError, match='multiple of 8'):
    mlp, params, points, z_vals, directions, cond = _setup(seed=4, batch=20)
    raymarch.fused_render_level(
        params, points, z_vals, directions, cond,
        num_freqs=num_freqs, trunk_depth=4, skips=(2,), rgb_branch_depth=1,
        sigma_activation='softplus', use_white_background=False,
        sample_at_infinity=True,
        tile_b=64, tile_s=32, use_bfloat16=False, interpret=True)
