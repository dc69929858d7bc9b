"""Lie-algebra ops vs scipy / closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from nerfies_tpu.ops import rigid


def test_skew_cross_product():
  rng = np.random.RandomState(0)
  w = rng.randn(17, 3).astype(np.float32)
  v = rng.randn(17, 3).astype(np.float32)
  W = rigid.skew(jnp.asarray(w))
  got = np.einsum('bij,bj->bi', np.asarray(W), v)
  np.testing.assert_allclose(got, np.cross(w, v), atol=1e-6)


def test_exp_so3_matches_scipy():
  rng = np.random.RandomState(1)
  axis = rng.randn(32, 3)
  axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
  theta = rng.uniform(0.01, np.pi - 0.01, size=(32,))
  R = np.asarray(rigid.exp_so3(jnp.asarray(axis, jnp.float32),
                               jnp.asarray(theta, jnp.float32)))
  R_ref = Rotation.from_rotvec(axis * theta[:, None]).as_matrix()
  np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_se3_is_rigid_transform():
  rng = np.random.RandomState(2)
  w = rng.randn(8, 3)
  w /= np.linalg.norm(w, axis=-1, keepdims=True)
  v = rng.randn(8, 3)
  S = jnp.asarray(np.concatenate([w, v], -1), jnp.float32)
  theta = jnp.asarray(rng.uniform(0.1, 2.0, (8,)), jnp.float32)
  T = np.asarray(rigid.exp_se3(S, theta))
  # Top-left block is a rotation; bottom row is [0,0,0,1].
  RtR = np.einsum('bij,bik->bjk', T[:, :3, :3], T[:, :3, :3])
  np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (8, 3, 3)),
                             atol=1e-5)
  np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=0)


def test_exp_se3_zero_theta_is_identity():
  S = jnp.asarray(np.concatenate(
      [np.tile([1.0, 0, 0], (4, 1)), np.random.RandomState(3).randn(4, 3)],
      axis=-1), jnp.float32)
  T = np.asarray(rigid.exp_se3(S, jnp.zeros((4,))))
  np.testing.assert_allclose(T, np.broadcast_to(np.eye(4), (4, 4, 4)),
                             atol=1e-6)


def test_se3_apply_matches_matrix_form():
  rng = np.random.RandomState(4)
  w = rng.randn(16, 3)
  w /= np.linalg.norm(w, axis=-1, keepdims=True)
  v = rng.randn(16, 3)
  S = jnp.asarray(np.concatenate([w, v], -1), jnp.float32)
  theta = jnp.asarray(rng.uniform(0.0, 2.0, (16,)), jnp.float32)
  points = jnp.asarray(rng.randn(16, 3), jnp.float32)

  T = rigid.exp_se3(S, theta)
  expected = rigid.from_homogenous(
      (T @ rigid.to_homogenous(points)[..., None])[..., 0])
  got = rigid.se3_apply(S, theta, points)
  np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_homogenous_roundtrip():
  x = jnp.asarray(np.random.RandomState(5).randn(7, 3), jnp.float32)
  np.testing.assert_allclose(
      np.asarray(rigid.from_homogenous(rigid.to_homogenous(x))),
      np.asarray(x), atol=1e-7)


def test_exp_so3_grad_finite():
  def f(theta):
    w = jnp.array([[0.0, 0.0, 1.0]])
    return rigid.exp_so3(w, theta[None])[0].sum()

  g = jax.grad(f)(jnp.asarray(0.3))
  assert np.isfinite(np.asarray(g)).all()


def test_se3_apply_raw_matches_normalized():
  rng = np.random.RandomState(0)
  w = rng.randn(32, 3).astype(np.float32)
  v = rng.randn(32, 3).astype(np.float32) * 0.1
  p = rng.randn(32, 3).astype(np.float32)
  theta = np.linalg.norm(w, axis=-1)
  S = np.concatenate([w / theta[:, None], v / theta[:, None]], axis=-1)
  got = np.asarray(rigid.se3_apply_raw(jnp.asarray(w), jnp.asarray(v),
                                       jnp.asarray(p)))
  want = np.asarray(rigid.se3_apply(jnp.asarray(S), jnp.asarray(theta),
                                    jnp.asarray(p)))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_se3_apply_raw_zero_rotation_is_translation():
  """At w = 0 the transform is exactly p + v -- the limit at which the
  reference's w/|w| normalization (warping.py:334-342) divides by zero
  (live on TPU where denormal |w|^2 flushes to 0)."""
  p = jnp.asarray([[0.3, -0.2, 1.0]])
  v = jnp.asarray([[0.05, 0.02, -0.01]])
  for w in (jnp.zeros((1, 3)),
            jnp.full((1, 3), 1e-25),
            jnp.full((1, 3), 1e-12)):
    out = np.asarray(rigid.se3_apply_raw(w, v, p))
    np.testing.assert_allclose(out, np.asarray(p + v), atol=1e-6)

  def loss(w):
    return jnp.sum(rigid.se3_apply_raw(w, v, p) ** 2)

  for w0 in (jnp.zeros((1, 3)), jnp.full((1, 3), 1e-25),
             jnp.full((1, 3), 1e-6), jnp.full((1, 3), 0.05)):
    g = np.asarray(jax.grad(loss)(w0))
    assert np.isfinite(g).all(), w0


def test_se3_apply_raw_taylor_boundary_matches_exact():
  # The Taylor branch agrees with the exact-trig normalized form on both
  # sides of the theta = 0.1 switch (no jump at the branch boundary).
  rng = np.random.RandomState(1)
  axis = rng.randn(3).astype(np.float32)
  axis /= np.linalg.norm(axis)
  v_raw = rng.randn(1, 3).astype(np.float32) * 0.1
  p = jnp.asarray(rng.randn(1, 3).astype(np.float32))
  for theta in (0.0999, 0.1001, 0.01, 0.5):
    w_raw = axis[None] * theta
    S = np.concatenate([axis[None], v_raw / theta], axis=-1)
    got = np.asarray(rigid.se3_apply_raw(
        jnp.asarray(w_raw), jnp.asarray(v_raw), p))
    want = np.asarray(rigid.se3_apply(
        jnp.asarray(S), jnp.asarray([theta], np.float32), p))
    np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(theta))
