"""WHOLE-MODEL golden parity: full forward/render vs the actual reference.

Function-level golden tests (test_golden_reference.py) can't catch a
composition-level divergence — condition wiring, rng stream order,
annealing plumbing, metadata broadcasting. This test instantiates the
reference `NerfModel` (/root/reference/nerfies/models.py:96-375), maps
its initialized params into the nerfies_tpu layout with
`nerfies_tpu.interop.map_reference_params`, runs BOTH models on
identical rays, and asserts every render output matches to float32
tolerance — for a vrig-paper-style config (SE(3) warp + GLO metadata +
appearance/camera conditions) and a plain no-warp config, deterministic
and stratified, with and without warp Jacobians.

Note on conditions: the reference gates the rgb-branch appearance code
on `use_alpha_condition` (documented bug, reference models.py:204-207);
the rebuild's explicit `use_rgb_condition=True` reproduces it.
"""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')
import jax  # noqa: E402

from tests import reference_loader

if not reference_loader.reference_available():
  pytest.skip('reference tree not available', allow_module_level=True)

reference_loader.load_reference()
from nerfies import models as ref_models  # noqa: E402

from nerfies_tpu import interop  # noqa: E402
from nerfies_tpu.models import nerf  # noqa: E402


# Shared (reduced-size but structurally faithful) model dimensions.
_COMMON = dict(
    num_coarse_samples=12,
    num_fine_samples=12,
    use_viewdirs=True,
    near=0.4,
    far=3.0,
    noise_std=None,
    nerf_trunk_depth=4,
    nerf_trunk_width=32,
    nerf_rgb_branch_depth=1,
    nerf_rgb_branch_width=16,
    nerf_skips=(2,),
    alpha_channels=1,
    rgb_channels=3,
    num_nerf_point_freqs=4,
    num_nerf_viewdir_freqs=2,
    appearance_ids=(0, 1, 2),
    camera_ids=(0, 1),
    warp_ids=(0, 1, 2),
    num_appearance_features=4,
    num_camera_features=2,
    num_warp_features=4,
    num_warp_freqs=3,
)

# gpu_vrig_paper-style: SE(3) warp, GLO codes, appearance (alpha+rgb via
# the reference's shared flag) and camera conditions.
_VRIG_REF = dict(
    _COMMON,
    use_warp=True,
    warp_field_type='se3',
    warp_metadata_encoder_type='glo',
    use_appearance_metadata=True,
    use_camera_metadata=True,
    use_alpha_condition=True,
)
_VRIG_OURS = dict(_VRIG_REF, use_rgb_condition=True,
                  rgb_padding=0.0)

# test_local-style: no warp, no metadata conditions, viewdirs only.
_PLAIN_REF = dict(_COMMON, use_warp=False)
_PLAIN_OURS = dict(_PLAIN_REF, rgb_padding=0.0)

_WARP_EXTRA = {'alpha': 1.7, 'time_alpha': 0.0}


def _rays(batch=6, seed=0):
  rng = np.random.RandomState(seed)
  directions = rng.normal(size=(batch, 3)).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  return {
      'origins': jnp.asarray(
          rng.uniform(-0.2, 0.2, (batch, 3)).astype(np.float32)),
      'directions': jnp.asarray(directions),
      'metadata': {
          'warp': jnp.asarray(rng.randint(0, 3, (batch, 1)), jnp.uint32),
          'appearance': jnp.asarray(
              rng.randint(0, 3, (batch, 1)), jnp.uint32),
          'camera': jnp.asarray(rng.randint(0, 2, (batch, 1)), jnp.uint32),
      },
  }


def _build_pair(ref_kwargs, ours_kwargs, stratified):
  ref_model = ref_models.NerfModel(
      use_stratified_sampling=stratified, **ref_kwargs)
  our_model = nerf.NerfModel(
      use_stratified_sampling=stratified, use_remat=False, **ours_kwargs)
  rays = _rays()
  keys = dict(zip(('params', 'coarse', 'fine'),
                  jax.random.split(jax.random.PRNGKey(7), 3)))
  ref_params = ref_model.init(keys, rays, warp_extra=_WARP_EXTRA)['params']
  our_params = interop.map_reference_params(
      jax.device_get(ref_params))
  return ref_model, our_model, ref_params, our_params, rays


def _assert_outputs_match(ref_out, our_out, atol):
  assert set(ref_out) == set(our_out)
  for level in ref_out:
    ref_level, our_level = ref_out[level], our_out[level]
    for key in ref_level:
      ref_val = np.asarray(ref_level[key])
      if key == 'warp_jacobian':
        # Reference: trailing (..., i, j) via jacfwd; ours: leading
        # (i, j, ...) layout (ops/svd3.py).
        our_val = np.moveaxis(np.asarray(our_level[key]), (0, 1), (-2, -1))
      else:
        our_val = np.asarray(our_level[key])
      np.testing.assert_allclose(
          our_val, ref_val, atol=atol, rtol=1e-5,
          err_msg=f'{level}/{key} diverges from the reference')


@pytest.mark.parametrize('stratified', [False, True])
@pytest.mark.parametrize('config_name', ['vrig', 'plain'])
def test_full_model_matches_reference(config_name, stratified):
  ref_kwargs, ours_kwargs = {
      'vrig': (_VRIG_REF, _VRIG_OURS),
      'plain': (_PLAIN_REF, _PLAIN_OURS),
  }[config_name]
  ref_model, our_model, ref_params, our_params, rays = _build_pair(
      ref_kwargs, ours_kwargs, stratified)

  run_keys = dict(zip(('coarse', 'fine'),
                      jax.random.split(jax.random.PRNGKey(3), 2)))
  ref_out = ref_model.apply({'params': ref_params}, rays,
                            warp_extra=_WARP_EXTRA,
                            return_weights=True,
                            rngs=run_keys)
  our_out = our_model.apply({'params': our_params}, rays,
                            warp_extra=_WARP_EXTRA,
                            return_weights=True,
                            rngs=run_keys)
  _assert_outputs_match(ref_out, our_out, atol=2e-5)


def test_full_model_jacobian_matches_reference():
  ref_model, our_model, ref_params, our_params, rays = _build_pair(
      _VRIG_REF, _VRIG_OURS, stratified=False)
  run_keys = dict(zip(('coarse', 'fine'),
                      jax.random.split(jax.random.PRNGKey(3), 2)))
  ref_out = ref_model.apply({'params': ref_params}, rays,
                            warp_extra=_WARP_EXTRA,
                            return_weights=True, return_warp_jacobian=True,
                            rngs=run_keys)
  our_out = our_model.apply({'params': our_params}, rays,
                            warp_extra=_WARP_EXTRA,
                            return_weights=True, return_warp_jacobian=True,
                            rngs=run_keys)
  assert 'warp_jacobian' in ref_out['coarse']
  assert 'warp_jacobian' in our_out['coarse']
  _assert_outputs_match(ref_out, our_out, atol=5e-5)


def test_full_model_warp_disabled_flag():
  """use_warp=False at apply time must bypass the field in both."""
  ref_model, our_model, ref_params, our_params, rays = _build_pair(
      _VRIG_REF, _VRIG_OURS, stratified=False)
  run_keys = dict(zip(('coarse', 'fine'),
                      jax.random.split(jax.random.PRNGKey(3), 2)))
  ref_out = ref_model.apply({'params': ref_params}, rays,
                            warp_extra=_WARP_EXTRA, use_warp=False,
                            return_weights=True, rngs=run_keys)
  our_out = our_model.apply({'params': our_params}, rays,
                            warp_extra=_WARP_EXTRA, use_warp=False,
                            return_weights=True, rngs=run_keys)
  _assert_outputs_match(ref_out, our_out, atol=2e-5)
