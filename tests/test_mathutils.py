"""Numerics: safe_norm JVP, robust loss special cases, schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import schedules
from nerfies_tpu.ops import mathutils


def test_safe_norm_value():
  x = jnp.asarray(np.random.RandomState(0).randn(9, 3), jnp.float32)
  np.testing.assert_allclose(
      np.asarray(mathutils.safe_norm(x)),
      np.linalg.norm(np.asarray(x), axis=-1), atol=1e-6)


def test_safe_norm_grad_at_zero():
  g = jax.grad(lambda x: mathutils.safe_norm(x).sum())(jnp.zeros((4, 3)))
  np.testing.assert_allclose(np.asarray(g), 0.0)
  # And matches the true gradient away from zero.
  x = jnp.ones((1, 3))
  g2 = jax.grad(lambda x: mathutils.safe_norm(x).sum())(x)
  np.testing.assert_allclose(np.asarray(g2), 1.0 / np.sqrt(3.0), atol=1e-6)


def test_general_loss_l2_case():
  sq = jnp.asarray([0.0, 0.01, 1.0, 4.0])
  scale = 0.5
  loss = mathutils.general_loss_with_squared_residual(sq, alpha=2.0,
                                                      scale=scale)
  np.testing.assert_allclose(
      np.asarray(loss), scale * 0.5 * np.asarray(sq) / scale ** 2, atol=1e-6)


def test_general_loss_cauchy_case():
  sq = jnp.asarray([0.0, 0.25, 1.0])
  loss = mathutils.general_loss_with_squared_residual(sq, alpha=0.0, scale=1.0)
  np.testing.assert_allclose(
      np.asarray(loss), np.log1p(0.5 * np.asarray(sq)), atol=1e-4)


def test_general_loss_geman_mcclure_monotone_and_bounded():
  sq = jnp.linspace(0.0, 100.0, 50)
  loss = np.asarray(
      mathutils.general_loss_with_squared_residual(sq, alpha=-2.0, scale=0.03))
  assert (np.diff(loss) >= 0).all()
  assert np.isfinite(loss).all()


def test_jacobian_div_curl():
  # Leading (3, 3, batch) layout (ops/svd3.py).
  J_trail = np.random.RandomState(1).randn(5, 3, 3).astype(np.float32)
  J = jnp.moveaxis(jnp.asarray(J_trail), (-2, -1), (0, 1))
  div = np.asarray(mathutils.jacobian_to_div(J))
  np.testing.assert_allclose(
      div, np.trace(J_trail, axis1=-2, axis2=-1) - 3.0, atol=1e-6)
  curl = np.asarray(mathutils.jacobian_to_curl(J))
  assert curl.shape == (3, 5)
  expected_curl0 = J_trail[:, 2, 1] - J_trail[:, 1, 2]
  np.testing.assert_allclose(curl[0], expected_curl0, atol=1e-6)


def test_psnr():
  np.testing.assert_allclose(
      float(mathutils.compute_psnr(jnp.asarray(0.01))), 20.0, atol=1e-4)


# --- schedules ---


def test_constant_schedule():
  s = schedules.from_config(('constant', 3.5))
  assert s(0) == 3.5 and s(10**6) == 3.5


def test_linear_schedule():
  s = schedules.from_config(
      {'type': 'linear', 'initial_value': 0.0, 'final_value': 8.0,
       'num_steps': 80})
  assert s(0) == 0.0
  np.testing.assert_allclose(s(40), 4.0)
  assert s(80) == 8.0 and s(200) == 8.0


def test_exponential_schedule():
  s = schedules.from_config(
      {'type': 'exponential', 'initial_value': 1e-3, 'final_value': 1e-4,
       'num_steps': 1000})
  np.testing.assert_allclose(s(0), 1e-3)
  np.testing.assert_allclose(s(999), 1e-4, rtol=1e-6)
  np.testing.assert_allclose(s(5000), 1e-4)
  assert s(500) < s(100)


def test_exponential_schedule_rejects_increase():
  with pytest.raises(ValueError):
    schedules.from_config(('exponential', 1e-4, 1e-3, 100))


def test_cosine_easing_schedule():
  s = schedules.from_config(('cosine_easing', 0.01, 1e-8, 100))
  np.testing.assert_allclose(s(0), 0.01, atol=1e-9)
  np.testing.assert_allclose(s(100), 1e-8, atol=1e-9)
  assert s(50) < s(0)


def test_step_schedule():
  s = schedules.from_config(('step', 1.0, 10, 0.5, 3))
  assert s(0) == 1.0 and s(9) == 1.0
  assert s(10) == 0.5 and s(20) == 0.25
  assert s(30) == 0.125 and s(1000) == 0.125


def test_piecewise_schedule():
  s = schedules.from_config({
      'type': 'piecewise',
      'schedules': [
          (50, ('constant', 0.01)),
          (100, ('cosine_easing', 0.01, 1e-8, 100)),
      ]})
  assert s(0) == 0.01 and s(49) == 0.01
  np.testing.assert_allclose(s(50), 0.01, atol=1e-9)
  np.testing.assert_allclose(s(150), 1e-8, atol=1e-9)


def test_delayed_schedule():
  base = {'type': 'exponential', 'initial_value': 1e-3, 'final_value': 1e-4,
          'num_steps': 1000}
  s = schedules.from_config({
      'type': 'delayed', 'delay_steps': 100, 'delay_mult': 0.01,
      'base_schedule': base})
  np.testing.assert_allclose(s(0), 0.01 * 1e-3, rtol=1e-6)
  base_s = schedules.from_config(base)
  np.testing.assert_allclose(s(100), base_s(100), rtol=1e-6)
