"""fast_render (fused-kernel serving path) vs model.apply, interpret mode."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import configs
from nerfies_tpu import fast_render
from nerfies_tpu.models import nerf


def _build(warp_field_type='se3', use_warp=True, **overrides):
  kwargs = dict(
      num_coarse_samples=8,
      num_fine_samples=8,
      nerf_trunk_depth=3,
      nerf_trunk_width=32,
      nerf_rgb_branch_depth=1,
      nerf_rgb_branch_width=16,
      nerf_skips=(2,),
      num_nerf_point_freqs=3,
      num_nerf_viewdir_freqs=2,
      num_warp_freqs=2,
      use_warp=use_warp,
      warp_field_type=warp_field_type,
      warp_kwargs=({'trunk_depth': 3, 'skips': (2,)}
                   if warp_field_type == 'se3'
                   else {'depth': 3, 'skips': (2,),
                         'hidden_channels': 32}),
      use_appearance_metadata=True,
      use_camera_metadata=True,
      use_alpha_condition=True,
      use_rgb_condition=True,
      sigma_activation=nn.softplus,
      use_stratified_sampling=False,
      noise_std=None,
      use_bfloat16=True,
  )
  kwargs.update(overrides)
  config = configs.ModelConfig(**kwargs)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=16,
      appearance_ids=(0, 1), camera_ids=(0,), warp_ids=(0, 1),
      near=0.5, far=3.0)
  return model, params


def _rays(batch=12, seed=0):
  rng = np.random.RandomState(seed)
  directions = rng.normal(size=(batch, 3)).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  return {
      'origins': jnp.zeros((batch, 3), jnp.float32),
      'directions': jnp.asarray(directions),
      'metadata': {
          'warp': jnp.asarray(rng.randint(0, 2, (batch, 1)), jnp.uint32),
          'appearance': jnp.asarray(
              rng.randint(0, 2, (batch, 1)), jnp.uint32),
          'camera': jnp.zeros((batch, 1), jnp.uint32),
      },
  }


_WARP_EXTRA = {'alpha': 1.5, 'time_alpha': 0.0}


def _assert_close(got, want):
  for level in want:
    for key in ('rgb', 'depth', 'med_depth', 'acc'):
      np.testing.assert_allclose(
          np.asarray(got[level][key]), np.asarray(want[level][key]),
          atol=0.02, rtol=0.05,
          err_msg=f'{level}/{key}')


@pytest.mark.parametrize('mlp', ['pallas', 'xla'])
@pytest.mark.parametrize('field', ['se3', 'translation'])
def test_fast_render_matches_model(field, mlp):
  model, params = _build(warp_field_type=field)
  assert fast_render.supported(model)
  rays = _rays()
  want = model.apply({'params': params}, rays, warp_extra=_WARP_EXTRA,
                     return_weights=True,
                     rngs={'coarse': jax.random.PRNGKey(0),
                           'fine': jax.random.PRNGKey(1)})
  got = fast_render.render_rays(params, rays, _WARP_EXTRA, model,
                                interpret=True, mlp=mlp)
  _assert_close(got, want)


def test_fast_render_no_warp_no_conditions():
  model, params = _build(
      use_warp=False, use_appearance_metadata=False,
      use_camera_metadata=False, use_alpha_condition=False,
      use_rgb_condition=False, use_viewdirs=False)
  assert fast_render.supported(model)
  rays = _rays(seed=3)
  want = model.apply({'params': params}, rays, warp_extra=_WARP_EXTRA,
                     return_weights=True,
                     rngs={'coarse': jax.random.PRNGKey(0),
                           'fine': jax.random.PRNGKey(1)})
  got = fast_render.render_rays(params, rays, _WARP_EXTRA, model,
                                interpret=True, mlp='pallas')
  _assert_close(got, want)
  got = fast_render.render_rays(params, rays, _WARP_EXTRA, model,
                                mlp='xla')
  _assert_close(got, want)


def test_unsupported_models_detected():
  model, _ = _build(use_trunk_condition=True)
  assert not fast_render.supported(model)
  model, _ = _build(warp_metadata_encoder_type='time',
                    use_warp=True)
  assert not fast_render.supported(model)
