"""Quaternion algebra vs scipy (xyzw convention)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from nerfies_tpu.ops import quaternion


def _random_unit_quats(n, seed=0):
  rng = np.random.RandomState(seed)
  q = rng.randn(n, 4)
  return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_multiply_matches_scipy():
  q1 = _random_unit_quats(16, 0)
  q2 = _random_unit_quats(16, 1)
  got = np.asarray(quaternion.multiply(jnp.asarray(q1), jnp.asarray(q2)))
  ref = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
  # Quaternion double cover: compare up to sign.
  sign = np.sign(np.sum(got * ref, axis=-1, keepdims=True))
  np.testing.assert_allclose(got * sign, ref, atol=1e-5)


def test_rotate_matches_matrix():
  q = _random_unit_quats(16, 2)
  v = np.random.RandomState(3).randn(16, 3).astype(np.float32)
  got = np.asarray(quaternion.rotate(jnp.asarray(q), jnp.asarray(v)))
  ref = np.einsum('bij,bj->bi', Rotation.from_quat(q).as_matrix(), v)
  np.testing.assert_allclose(got, ref, atol=1e-5)


def test_rotation_matrix_roundtrip():
  q = _random_unit_quats(32, 4)
  m = quaternion.to_rotation_matrix(jnp.asarray(q))
  np.testing.assert_allclose(
      np.asarray(m), Rotation.from_quat(q).as_matrix(), atol=1e-5)
  q_back = np.asarray(quaternion.from_rotation_matrix(m))
  sign = np.sign(np.sum(q_back * q, axis=-1, keepdims=True))
  np.testing.assert_allclose(q_back * sign, q, atol=1e-4)


def test_exp_log_roundtrip():
  q = _random_unit_quats(16, 5)
  # Restrict to the upper hemisphere (log has a branch cut).
  q = np.where(q[:, 3:4] < 0, -q, q)
  lg = quaternion.log(jnp.asarray(q))
  q_back = np.asarray(quaternion.exp(lg))
  np.testing.assert_allclose(q_back, q, atol=1e-4)


def test_conjugate_inverse_identity():
  q = _random_unit_quats(8, 6)
  inv = quaternion.inverse(jnp.asarray(q))
  prod = np.asarray(quaternion.multiply(jnp.asarray(q), inv))
  np.testing.assert_allclose(
      prod, np.tile([0, 0, 0, 1.0], (8, 1)), atol=1e-5)
