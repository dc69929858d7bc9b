"""Closed-form 3x3 spectral ops vs numpy LAPACK.

svd3 uses the LEADING (3, 3, ...) matrix layout (see ops/svd3.py);
numpy references use trailing batches, so tests convert at the boundary
with svd3.from_trailing / to_trailing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerfies_tpu.ops import svd3


def _random_mats(n, scale=1.0, seed=0):
  rng = np.random.RandomState(seed)
  return (np.eye(3) + scale * rng.randn(n, 3, 3)).astype(np.float32)


def _lead(J):
  return svd3.from_trailing(jnp.asarray(J))


def test_layout_roundtrip():
  J = _random_mats(5, seed=9)
  lead = svd3.from_trailing(jnp.asarray(J))
  assert lead.shape == (3, 3, 5)
  np.testing.assert_array_equal(np.asarray(svd3.to_trailing(lead)), J)
  # Entry semantics: lead[i, j, b] == J[b, i, j].
  assert lead[1, 2, 3] == J[3, 1, 2]


def test_svals3_matches_lapack():
  J = _random_mats(64, scale=0.5)
  got = np.asarray(svd3.svals3(_lead(J)))  # (3, 64)
  ref = np.linalg.svd(J, compute_uv=False)  # (64, 3)
  np.testing.assert_allclose(got.T, ref, rtol=1e-3, atol=1e-4)


def test_svals3_near_identity():
  J = _random_mats(32, scale=1e-3, seed=1)
  got = np.asarray(svd3.svals3(_lead(J)))
  ref = np.linalg.svd(J, compute_uv=False)
  np.testing.assert_allclose(got.T, ref, atol=2e-3)


def test_svals3_grad_finite_at_identity():
  # The common case in training: warp ~ identity => triple-degenerate svals.
  def loss(J):
    svals = svd3.svals3(J)
    return jnp.sum(jnp.log(jnp.maximum(svals, 1e-6)) ** 2)

  g = jax.grad(loss)(svd3.from_trailing(jnp.eye(3)[None]))
  assert np.isfinite(np.asarray(g)).all()

  g2 = jax.grad(loss)(_lead(_random_mats(4, 0.2, seed=2)))
  assert np.isfinite(np.asarray(g2)).all()


def test_det3_and_inv3():
  J = _random_mats(16, scale=0.4, seed=3)
  np.testing.assert_allclose(
      np.asarray(svd3.det3(_lead(J))), np.linalg.det(J), rtol=1e-4,
      atol=1e-5)
  np.testing.assert_allclose(
      np.asarray(svd3.to_trailing(svd3.inv3(_lead(J)))), np.linalg.inv(J),
      rtol=1e-3, atol=1e-4)


def test_nearest_rotation_matches_svd_polar():
  J = _random_mats(16, scale=0.3, seed=4)
  got = np.asarray(svd3.to_trailing(svd3.nearest_rotation(_lead(J))))
  u, _, vh = np.linalg.svd(J)
  ref = u @ vh
  np.testing.assert_allclose(got, ref, atol=1e-4)
  # Result is orthonormal.
  np.testing.assert_allclose(
      np.einsum('bij,bik->bjk', got, got),
      np.broadcast_to(np.eye(3), got.shape), atol=1e-5)


def test_nearest_rotation_det_negative_matches_reference_svd():
  """Orientation-reversing inputs must yield the reference's SVD rotation.

  The reference constructs R = U diag(1, 1, det(U V^T)) V^T
  (/root/reference/nerfies/training.py:56-68), a PROPER rotation even when
  the Jacobian flips orientation; the plain polar factor would be a
  reflection there.
  """
  rng = np.random.RandomState(11)
  J = np.eye(3) + 0.4 * rng.randn(64, 3, 3).astype(np.float32)
  # Force det < 0 on half the batch by swapping two rows.
  J[::2] = J[::2][:, [1, 0, 2], :]
  dets = np.linalg.det(J)
  assert (dets < 0).any() and (dets > 0).any()

  got = np.asarray(svd3.to_trailing(svd3.nearest_rotation(_lead(J))))

  u, _, vh = np.linalg.svd(J)
  sign = np.sign(np.linalg.det(u @ vh))
  d = np.stack([np.ones_like(sign), np.ones_like(sign), sign], axis=-1)
  ref = u @ (d[..., None] * vh)
  np.testing.assert_allclose(got, ref, atol=2e-3)
  # Always a proper rotation.
  np.testing.assert_allclose(np.linalg.det(got), 1.0, atol=1e-4)


def test_nearest_rotation_grad_finite():
  J = np.eye(3) + 0.3 * np.random.RandomState(5).randn(8, 3, 3)
  J[0] = J[0][[1, 0, 2], :]  # one det<0 sample

  def loss(x):
    r = svd3.nearest_rotation(x)
    return jnp.sum((x - r) ** 2)

  g = jax.grad(loss)(_lead(np.asarray(J, np.float32)))
  assert np.isfinite(np.asarray(g)).all()
