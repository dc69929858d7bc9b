"""Model layer: modules, warp fields, NerfModel forward."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import configs
from nerfies_tpu.models import modules
from nerfies_tpu.models import nerf
from nerfies_tpu.models import warping
from nerfies_tpu.models.glo import GloEncoder


def test_split_dense_equals_concat_dense():
  B, S, C1, C2, F = 4, 6, 5, 3, 7
  rng = jax.random.PRNGKey(0)
  x = jax.random.normal(rng, (B, S, C1))
  c = jax.random.normal(jax.random.PRNGKey(1), (B, 1, C2))
  layer = modules.SplitDense(features=F)
  params = layer.init(jax.random.PRNGKey(2), [x, c])
  got = layer.apply(params, [x, c])
  kernel = params['params']['kernel']
  bias = params['params']['bias']
  c_tiled = jnp.broadcast_to(c, (B, S, C2))
  expected = jnp.concatenate([x, c_tiled], -1) @ kernel + bias
  np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                             atol=1e-5)


def test_mlp_skip_shapes():
  mlp = modules.MLP(depth=6, width=32, skips=(4,), output_channels=3)
  x = jnp.ones((10, 8))
  params = mlp.init(jax.random.PRNGKey(0), x)
  out = mlp.apply(params, x)
  assert out.shape == (10, 3)
  # Skip layer consumes width + input channels.
  assert params['params']['hidden_4']['kernel'].shape == (32 + 8, 32)


def test_nerf_mlp_shapes_and_conditions():
  B, S = 8, 16
  x = jnp.ones((B, S, 63))
  rgb_cond = jnp.ones((B, 27))
  mlp = modules.NerfMLP(trunk_depth=4, trunk_width=64, rgb_branch_depth=1,
                        rgb_branch_width=32, skips=(2,))
  params = mlp.init(jax.random.PRNGKey(0), x, None, None, rgb_cond)
  out = mlp.apply(params, x, None, None, rgb_cond)
  assert out['rgb'].shape == (B, S, 3)
  assert out['alpha'].shape == (B, S, 1)
  # rgb output must actually depend on the condition.
  out2 = mlp.apply(params, x, None, None, 2.0 * rgb_cond)
  assert np.abs(np.asarray(out['rgb'] - out2['rgb'])).max() > 1e-6
  # alpha is unconditioned here, so it must NOT change.
  np.testing.assert_allclose(np.asarray(out['alpha']), np.asarray(out2['alpha']),
                             atol=1e-7)


def test_nerf_mlp_no_conditions():
  mlp = modules.NerfMLP(trunk_depth=2, trunk_width=32)
  x = jnp.ones((4, 8, 63))
  params = mlp.init(jax.random.PRNGKey(0), x, None, None, None)
  out = mlp.apply(params, x, None, None, None)
  assert out['rgb'].shape == (4, 8, 3)
  assert 'bottleneck' not in params['params']


def test_glo_encoder():
  enc = GloEncoder(num_embeddings=5, features=4)
  idx = jnp.asarray([[0], [3], [4]], jnp.uint32)
  params = enc.init(jax.random.PRNGKey(0), idx)
  out = enc.apply(params, idx)
  assert out.shape == (3, 4)
  # uniform(0.05) init keeps codes small.
  assert np.abs(np.asarray(out)).max() <= 0.05


def test_time_encoder():
  enc = modules.TimeEncoder(num_freqs=2, features=6, depth=2, width=16,
                            skips=())
  t = jnp.linspace(-1, 1, 5)[:, None]
  params = enc.init(jax.random.PRNGKey(0), t)
  out = enc.apply(params, t)
  assert out.shape == (5, 6)


@pytest.mark.parametrize('field_type', ['translation', 'se3'])
def test_warp_field_near_identity_at_init(field_type):
  field = warping.create_warp_field(
      field_type=field_type, num_freqs=4, num_embeddings=3, num_features=4)
  points = jax.random.normal(jax.random.PRNGKey(0), (6, 5, 3))
  metadata = jnp.zeros((6, 1), jnp.uint32)
  extra = {'alpha': jnp.asarray(4.0)}
  params = field.init(jax.random.PRNGKey(1), points, metadata, extra)
  out = field.apply(params, points, metadata, extra)
  # Branch output inits are uniform(1e-4): warp ~ identity at init.
  np.testing.assert_allclose(np.asarray(out['warped_points']),
                             np.asarray(points), atol=1e-2)


@pytest.mark.parametrize('field_type', ['translation', 'se3'])
def test_warp_jacobian_matches_jacfwd(field_type):
  field = warping.create_warp_field(
      field_type=field_type, num_freqs=2, num_embeddings=3, num_features=4)
  points = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 3))
  metadata = jnp.asarray([[0], [2]], jnp.uint32)
  extra = {'alpha': jnp.asarray(2.0)}
  params = field.init(jax.random.PRNGKey(3), points, metadata, extra)
  out = field.apply(params, points, metadata, extra, True)
  # Leading (3, 3, B, S) layout; convert to trailing for the jacfwd check.
  jac = np.moveaxis(np.asarray(out['jacobian']), (0, 1), (-2, -1))
  assert jac.shape == (2, 3, 3, 3)

  # Reference Jacobian: per-point jacfwd of the warp.
  def warp_one(p, m):
    o = field.apply(params, p[None, None], m[None], extra)
    return o['warped_points'][0, 0]

  for b in range(2):
    for s in range(3):
      ref = jax.jacfwd(warp_one)(points[b, s], metadata[b])
      np.testing.assert_allclose(jac[b, s], np.asarray(ref), atol=1e-4)


def test_warp_field_shared_params_across_shapes():
  # The same params must apply to (B, S, 3) ray points and (N, 3) bg points.
  field = warping.create_warp_field(
      field_type='se3', num_freqs=2, num_embeddings=3, num_features=4)
  ray_points = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 3))
  ray_meta = jnp.zeros((2, 1), jnp.uint32)
  extra = {'alpha': jnp.asarray(2.0)}
  params = field.init(jax.random.PRNGKey(5), ray_points, ray_meta, extra)

  bg_points = jax.random.normal(jax.random.PRNGKey(6), (7, 3))
  bg_meta = jnp.zeros((7, 1), jnp.uint32)
  out = field.apply(params, bg_points, bg_meta, extra)
  assert out['warped_points'].shape == (7, 3)


def _tiny_model_config(**overrides):
  defaults = dict(
      num_coarse_samples=4,
      num_fine_samples=4,
      nerf_trunk_depth=2,
      nerf_trunk_width=16,
      nerf_rgb_branch_depth=1,
      nerf_rgb_branch_width=8,
      nerf_skips=(1,),
      num_nerf_point_freqs=2,
      num_nerf_viewdir_freqs=1,
      num_warp_freqs=2,
      use_warp=True,
      warp_field_type='se3',
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 8},
      sigma_activation=nn.softplus,
  )
  defaults.update(overrides)
  return configs.ModelConfig(**defaults)


def _fake_rays(batch_size):
  key = jax.random.PRNGKey(0)
  directions = jax.random.normal(key, (batch_size, 3))
  directions = directions / jnp.linalg.norm(directions, axis=-1,
                                            keepdims=True)
  return {
      'origins': jnp.zeros((batch_size, 3)),
      'directions': directions,
      'metadata': {
          'warp': jnp.zeros((batch_size, 1), jnp.uint32),
          'camera': jnp.zeros((batch_size, 1), jnp.uint32),
          'appearance': jnp.zeros((batch_size, 1), jnp.uint32),
          'time': jnp.zeros((batch_size, 1), jnp.float32),
      },
  }


def test_construct_nerf_and_forward():
  config = _tiny_model_config()
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=8,
      appearance_ids=(0, 1), camera_ids=(0,), warp_ids=(0, 1, 2),
      near=0.5, far=3.0)
  rays = _fake_rays(8)
  out = model.apply({'params': params}, rays,
                    warp_extra={'alpha': 2.0, 'time_alpha': 0.0},
                    rngs={'coarse': jax.random.PRNGKey(1),
                          'fine': jax.random.PRNGKey(2)})
  assert set(out) == {'coarse', 'fine'}
  for level in ('coarse', 'fine'):
    assert out[level]['rgb'].shape == (8, 3)
    assert out[level]['depth'].shape == (8,)
    assert out[level]['med_depth'].shape == (8,)
    assert out[level]['acc'].shape == (8,)
  vals = np.asarray(out['fine']['rgb'])
  assert np.isfinite(vals).all()
  assert (vals >= 0).all() and (vals <= 1).all()


def test_forward_deterministic_without_stratified():
  config = _tiny_model_config(use_stratified_sampling=False)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=4,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0,),
      near=0.5, far=3.0)
  rays = _fake_rays(4)
  warp_extra = {'alpha': 2.0, 'time_alpha': 0.0}
  out1 = model.apply({'params': params}, rays, warp_extra=warp_extra)
  out2 = model.apply({'params': params}, rays, warp_extra=warp_extra)
  np.testing.assert_array_equal(np.asarray(out1['fine']['rgb']),
                                np.asarray(out2['fine']['rgb']))


def test_forward_weights_and_jacobian_outputs():
  config = _tiny_model_config()
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=4,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0,),
      near=0.5, far=3.0, use_warp_jacobian=True, use_weights=True)
  rays = _fake_rays(4)
  out = model.apply({'params': params}, rays,
                    warp_extra={'alpha': 2.0, 'time_alpha': 0.0},
                    return_points=True,
                    rngs={'coarse': jax.random.PRNGKey(1),
                          'fine': jax.random.PRNGKey(2)})
  assert out['coarse']['warp_jacobian'].shape == (3, 3, 4, 4)
  assert out['coarse']['weights'].shape == (4, 4)
  assert out['fine']['weights'].shape == (4, 8)  # coarse+fine union
  assert out['coarse']['points'].shape == (4, 4, 3)
  assert out['coarse']['warped_points'].shape == (4, 4, 3)


def test_forward_appearance_and_camera_conditions():
  config = _tiny_model_config(use_appearance_metadata=True,
                              use_rgb_condition=True,
                              use_camera_metadata=True)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=4,
      appearance_ids=(0, 1), camera_ids=(0, 1), warp_ids=(0,),
      near=0.5, far=3.0)
  rays = _fake_rays(4)
  warp_extra = {'alpha': 2.0, 'time_alpha': 0.0}
  rngs = {'coarse': jax.random.PRNGKey(1), 'fine': jax.random.PRNGKey(2)}
  out1 = model.apply({'params': params}, rays, warp_extra=warp_extra,
                     rngs=rngs)
  rays2 = jax.tree.map(lambda x: x, rays)
  rays2['metadata'] = dict(rays['metadata'])
  rays2['metadata']['appearance'] = jnp.ones((4, 1), jnp.uint32)
  out2 = model.apply({'params': params}, rays2, warp_extra=warp_extra,
                     rngs=rngs)
  # Changing the appearance id must change the rendered color.
  assert np.abs(np.asarray(out1['fine']['rgb'] - out2['fine']['rgb'])).max() \
      > 1e-7


def test_translation_field_model():
  config = _tiny_model_config(warp_field_type='translation', warp_kwargs={})
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=4,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0,),
      near=0.5, far=3.0)
  rays = _fake_rays(4)
  out = model.apply({'params': params}, rays,
                    warp_extra={'alpha': 2.0, 'time_alpha': 0.0},
                    rngs={'coarse': jax.random.PRNGKey(1),
                          'fine': jax.random.PRNGKey(2)})
  assert np.isfinite(np.asarray(out['fine']['rgb'])).all()


def test_time_metadata_encoder_model():
  config = _tiny_model_config(warp_metadata_encoder_type='time',
                              warp_kwargs={})
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=4,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0,),
      near=0.5, far=3.0)
  rays = _fake_rays(4)
  out = model.apply({'params': params}, rays,
                    warp_extra={'alpha': 2.0, 'time_alpha': 1.0},
                    rngs={'coarse': jax.random.PRNGKey(1),
                          'fine': jax.random.PRNGKey(2)})
  assert np.isfinite(np.asarray(out['fine']['rgb'])).all()


def test_blend_metadata_encoder_field():
  field = warping.create_warp_field(
      field_type='translation', num_freqs=2, num_embeddings=4,
      num_features=4, metadata_encoder_type='blend',
      metadata_encoder_num_freqs=1)
  points = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 3))
  # Blend interpolates between GLO codes (by id) and time codes: metadata
  # doubles as both the integer id and the (cast) timestamp, as in the
  # reference blend path (warping.py:142-146).
  metadata = jnp.asarray([[0], [1], [3]], jnp.uint32)
  extra = {'alpha': jnp.asarray(2.0), 'time_alpha': jnp.asarray(0.3)}
  params = field.init(jax.random.PRNGKey(1), points, metadata, extra)
  out = field.apply(params, points, metadata, extra)
  assert out['warped_points'].shape == (3, 5, 3)
  assert np.isfinite(np.asarray(out['warped_points'])).all()
  # time_alpha changes the blend, so outputs must differ.
  out2 = field.apply(params, points, metadata,
                     {'alpha': jnp.asarray(2.0),
                      'time_alpha': jnp.asarray(0.9)})
  assert np.abs(np.asarray(out['warped_points']
                           - out2['warped_points'])).max() > 0
