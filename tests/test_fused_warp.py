"""Fused warp-trunk kernel (primal + Jacobian tangents + custom VJP) vs
the flax warp field under jax.linearize/jax.grad, interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import fused_train
from tests.test_fused_train import _build

_WARP_EXTRA = {'alpha': 1.5, 'time_alpha': 0.0}


def _points(b=4, s=6, seed=0):
  rng = np.random.RandomState(seed)
  points = jnp.asarray(rng.uniform(-1, 1, (b, s, 3)).astype(np.float32))
  meta = jnp.asarray(rng.randint(0, 2, (b, 1)).astype(np.uint32))
  return points, meta


def _flax_warp(model, params, points, meta, return_jacobian):
  return model.apply({'params': params}, points, meta, _WARP_EXTRA,
                     return_jacobian, False, method=model.apply_warp)


@pytest.mark.parametrize('field', ['se3', 'translation'])
def test_forward_and_jacobian_match_flax(field):
  warp_kwargs = ({'trunk_depth': 3, 'skips': (2,)} if field == 'se3'
                 else {'depth': 3, 'skips': (2,), 'hidden_channels': 32})
  model, params = _build(warp_field_type=field, warp_kwargs=warp_kwargs)
  points, meta = _points()
  want = _flax_warp(model, params, points, meta, True)
  got = fused_train._apply_warp_kernel(
      model, params, points, meta, _WARP_EXTRA, return_jacobian=True,
      points_depend_on_params=True, interpret=True)
  np.testing.assert_allclose(
      np.asarray(got['warped_points']),
      np.asarray(want['warped_points']), atol=2e-3, rtol=1e-2)
  assert got['jacobian'].shape == want['jacobian'].shape == \
      (3, 3) + points.shape[:2]
  np.testing.assert_allclose(
      np.asarray(got['jacobian']), np.asarray(want['jacobian']),
      atol=5e-3, rtol=5e-2)


def test_plain_warp_no_jacobian():
  model, params = _build()
  points, meta = _points(seed=3)
  want = _flax_warp(model, params, points, meta, False)
  got = fused_train._apply_warp_kernel(
      model, params, points, meta, _WARP_EXTRA, return_jacobian=False,
      points_depend_on_params=True, interpret=True)
  assert set(got.keys()) == {'warped_points'}
  np.testing.assert_allclose(
      np.asarray(got['warped_points']),
      np.asarray(want['warped_points']), atol=2e-3, rtol=1e-2)


def _grad_check(g_got, g_want, tag, cos_floor=0.97):
  flat_w = jax.tree_util.tree_flatten_with_path(g_want)[0]
  flat_g = jax.tree_util.tree_flatten_with_path(g_got)[0]
  ref_scale = max(
      float(np.linalg.norm(np.asarray(l, np.float64).ravel()))
      for _, l in flat_w)
  for (path_g, leaf_g), (path_w, leaf_w) in zip(flat_g, flat_w):
    assert path_g == path_w
    a = np.asarray(leaf_g, np.float64).ravel()
    b = np.asarray(leaf_w, np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if max(na, nb) < 1e-4 * ref_scale:
      continue
    cos = float(a @ b / (na * nb + 1e-30))
    assert cos > cos_floor, f'{tag} {path_w}: cosine {cos}'
    assert 0.7 < (na + 1e-12) / (nb + 1e-12) < 1.4, \
        f'{tag} {path_w}: norms {na}/{nb}'


def test_second_order_grads_match_flax():
  """d(loss(J, warped))/d(params): the elastic-style second-order path."""
  model, params = _build()
  points, meta = _points(seed=5)

  def loss_flax(params):
    out = _flax_warp(model, params, points, meta, True)
    return ((out['jacobian'] - jnp.eye(3)[..., None, None]) ** 2).mean() \
        + (out['warped_points'] ** 2).mean()

  def loss_fused(params):
    out = fused_train._apply_warp_kernel(
        model, params, points, meta, _WARP_EXTRA, return_jacobian=True,
        points_depend_on_params=False, interpret=True)
    return ((out['jacobian'] - jnp.eye(3)[..., None, None]) ** 2).mean() \
        + (out['warped_points'] ** 2).mean()

  v_w, g_w = jax.value_and_grad(loss_flax)(params)
  v_g, g_g = jax.value_and_grad(loss_fused)(params)
  np.testing.assert_allclose(float(v_g), float(v_w), rtol=0.03)
  # Only warp-field leaves receive gradient here.
  _grad_check(g_g['warp_field'], g_w['warp_field'], 'warp-2nd-order')


def test_need_dx_modes_agree_on_param_grads():
  model, params = _build()
  points, meta = _points(seed=6)

  def loss(params, need_dx):
    out = fused_train._apply_warp_kernel(
        model, params, points, meta, _WARP_EXTRA, return_jacobian=True,
        points_depend_on_params=need_dx, interpret=True)
    return (out['jacobian'] ** 2).mean() + (out['warped_points'] ** 2).mean()

  g_t = jax.grad(lambda p: loss(p, True))(params)['warp_field']
  g_f = jax.grad(lambda p: loss(p, False))(params)['warp_field']
  for (pa, la), (pb, lb) in zip(
      jax.tree_util.tree_flatten_with_path(g_t)[0],
      jax.tree_util.tree_flatten_with_path(g_f)[0]):
    assert pa == pb
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6,
                               err_msg=str(pa))


def test_dx_matches_flax_through_points():
  """d(loss)/d(points) parity (the fine level differentiates through
  its sample positions)."""
  model, params = _build()
  points, meta = _points(seed=7)

  def loss_flax(points):
    out = _flax_warp(model, params, points, meta, False)
    return (out['warped_points'] ** 2).mean()

  def loss_fused(points):
    out = fused_train._apply_warp_kernel(
        model, params, points, meta, _WARP_EXTRA, return_jacobian=False,
        points_depend_on_params=True, interpret=True)
    return (out['warped_points'] ** 2).mean()

  g_w = np.asarray(jax.grad(loss_flax)(points), np.float64).ravel()
  g_g = np.asarray(jax.grad(loss_fused)(points), np.float64).ravel()
  cos = float(g_g @ g_w / (np.linalg.norm(g_g) * np.linalg.norm(g_w)))
  assert cos > 0.99, cos
  np.testing.assert_allclose(np.linalg.norm(g_g), np.linalg.norm(g_w),
                             rtol=0.05)
