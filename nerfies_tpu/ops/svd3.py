"""Closed-form batched 3x3 spectral ops for TPU.

XLA's general SVD lowers to an iterative Jacobi solver that is slow on TPU
and does not batch well; the reference calls `jnp.linalg.svd` on vmapped 3x3
Jacobians inside the train step (/root/reference/nerfies/training.py:87-92).
Here the elastic regularizer's spectral quantities are computed in closed
form instead:

  - `svals3`: singular values via the trigonometric eigenvalue formula for
    the symmetric matrix J^T J (branch-free, pure VPU arithmetic).
  - `nearest_rotation`: the nearest PROPER rotation via a determinant-scaled
    Newton polar iteration with a Householder correction for det < 0
    (replaces the reference's `nearest_rotation_svd`, training.py:56-68,
    which NaNs -- a known reference bug).

LAYOUT: matrices are stored LEADING -- shape (3, 3, ...), entry
``J[i, j]`` is the (...)-shaped array of d out_i / d in_j. TPU tiling pads
an array's two minor-most dims to (8, 128); a batched trailing layout like
[B, S, 3, 3] therefore pads 3 -> 128 twice (a measured 42x memory blow-up
materializing train-step Jacobians), while (3, 3, B, S) packs perfectly and
every formula below is a pure elementwise program over (...)-shaped lanes.
Vectors follow the same convention: (3, ...). Everything is batched over
arbitrary trailing dims and differentiable. `from_trailing` / `to_trailing`
convert at API boundaries (tests, reference comparisons).
"""

import jax.numpy as jnp


def from_trailing(J: jnp.ndarray) -> jnp.ndarray:
  """(..., 3, 3) -> (3, 3, ...)."""
  return jnp.moveaxis(J, (-2, -1), (0, 1))


def to_trailing(J: jnp.ndarray) -> jnp.ndarray:
  """(3, 3, ...) -> (..., 3, 3)."""
  return jnp.moveaxis(J, (0, 1), (-2, -1))


def _eigvals_sym3_entries(a00, a11, a22, a01, a02, a12,
                          eps: float = 1e-12) -> jnp.ndarray:
  """Eigenvalues of symmetric 3x3 matrices given their 6 unique entries.

  Uses the trigonometric solution of the characteristic cubic
  (Smith 1961): branch-free, so the whole batch is one fused VPU program.
  Returns (3, ...) descending.
  """
  q = (a00 + a11 + a22) / 3.0
  p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
  p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
  p = jnp.sqrt(jnp.maximum(p2, eps) / 6.0)

  # B = (A - q I) / p; r = det(B) / 2 in [-1, 1].
  b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
  b01, b02, b12 = a01 / p, a02 / p, a12 / p
  det_b = (b00 * (b11 * b22 - b12 * b12)
           - b01 * (b01 * b22 - b12 * b02)
           + b02 * (b01 * b12 - b11 * b02))
  r = jnp.clip(det_b / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)

  phi = jnp.arccos(r) / 3.0
  e1 = q + 2.0 * p * jnp.cos(phi)
  e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
  e2 = 3.0 * q - e1 - e3

  # Degenerate (near-spherical) case: all eigenvalues collapse to q.
  degenerate = p2 < eps
  eigs = jnp.stack([e1, e2, e3])
  return jnp.where(degenerate[None], jnp.stack([q, q, q]), eigs)


def _eigvals_sym3(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
  """Eigenvalues of symmetric (3, 3, ...) matrices, descending, (3, ...)."""
  return _eigvals_sym3_entries(A[0, 0], A[1, 1], A[2, 2],
                               A[0, 1], A[0, 2], A[1, 2], eps=eps)


def _jtj_entries(J: jnp.ndarray):
  """The 6 unique entries of J^T J: (m00, m11, m22, m01, m02, m12).

  Written as explicit multiply-adds over the (...)-shaped entry arrays --
  an einsum over the 3-wide axis lowers to a dot_general whose output
  puts the batch dims FIRST (a trailing [..., 3, 3] tensor again, plus
  transposes), exactly the layout this module exists to avoid.
  """
  def dot(j, k):
    return J[0, j] * J[0, k] + J[1, j] * J[1, k] + J[2, j] * J[2, k]
  return (dot(0, 0), dot(1, 1), dot(2, 2),
          dot(0, 1), dot(0, 2), dot(1, 2))


def _jtj(J: jnp.ndarray) -> jnp.ndarray:
  """J^T J for (3, 3, ...) matrices as a (3, 3, ...) stack."""
  m00, m11, m22, m01, m02, m12 = _jtj_entries(J)
  return jnp.stack([jnp.stack([m00, m01, m02]),
                    jnp.stack([m01, m11, m12]),
                    jnp.stack([m02, m12, m22])])


def svals3(J: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
  """Singular values of (3, 3, ...) matrices, descending, as (3, ...).

  Computed as sqrt(eig(J^T J)) in closed form; the leading-layout drop-in
  for ``jnp.linalg.svd(J, compute_uv=False)`` on 3x3 batches.
  """
  eigs = _eigvals_sym3_entries(*_jtj_entries(J), eps=eps)
  return jnp.sqrt(jnp.maximum(eigs, eps))


def det3(J: jnp.ndarray) -> jnp.ndarray:
  """Determinant of (3, 3, ...) matrices, expanded (no LU)."""
  a, b, c = J[0, 0], J[0, 1], J[0, 2]
  d, e, f = J[1, 0], J[1, 1], J[1, 2]
  g, h, i = J[2, 0], J[2, 1], J[2, 2]
  return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv3(J: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
  """Inverse of (3, 3, ...) matrices via the adjugate (no LU, batched)."""
  a, b, c = J[0, 0], J[0, 1], J[0, 2]
  d, e, f = J[1, 0], J[1, 1], J[1, 2]
  g, h, i = J[2, 0], J[2, 1], J[2, 2]
  A = e * i - f * h
  B = -(d * i - f * g)
  C = d * h - e * g
  det = a * A + b * B + c * C
  det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
  adj = jnp.stack([
      jnp.stack([A, -(b * i - c * h), b * f - c * e]),
      jnp.stack([B, a * i - c * g, -(a * f - c * d)]),
      jnp.stack([C, -(a * h - b * g), a * e - b * d]),
  ])
  return adj / det


def _smallest_right_singular_vector(J: jnp.ndarray,
                                    eps: float = 1e-12) -> jnp.ndarray:
  """Unit right singular vector for the smallest singular value, (3, ...).

  The eigenvector of J^T J for its smallest eigenvalue, taken as the
  largest cross product of row pairs of (J^T J - lambda_min I) -- each
  nonzero cross product lies in the (rank-deficient) matrix's null space.
  Branch-free; at an exactly repeated smallest singular value any vector
  of the eigenspace is returned, which is fine because the nearest
  rotation is then non-unique and all choices attain it.
  """
  JtJ = _jtj(J)
  lam = _eigvals_sym3(JtJ, eps=eps)[2]
  eye = jnp.reshape(jnp.eye(3, dtype=J.dtype),
                    (3, 3) + (1,) * (J.ndim - 2))
  B = JtJ - lam * eye
  rows = [B[0], B[1], B[2]]  # each (3, ...)
  cands = [jnp.cross(rows[0], rows[1], axisa=0, axisb=0, axisc=0),
           jnp.cross(rows[1], rows[2], axisa=0, axisb=0, axisc=0),
           jnp.cross(rows[2], rows[0], axisa=0, axisb=0, axisc=0)]
  norms = jnp.stack([jnp.sum(c ** 2, axis=0) for c in cands])
  best = jnp.argmax(norms, axis=0)
  stacked = jnp.stack(cands)  # (cand, 3, ...)
  v = jnp.take_along_axis(stacked, best[None, None], axis=0)[0]
  return v / jnp.sqrt(jnp.maximum(jnp.sum(v ** 2, axis=0, keepdims=True),
                                  eps))


def nearest_rotation(J: jnp.ndarray, num_iters: int = 8) -> jnp.ndarray:
  """Nearest rotation (det = +1) to (3, 3, ...) matrices, Frobenius norm.

  Newton's iteration for the orthogonal polar factor:
    X_{k+1} = 0.5 * (X_k + X_k^{-T})
  converges quadratically to Q = U V^T. For det(J) < 0 that Q is a
  reflection; the nearest ROTATION is U diag(1, 1, -1) V^T (the sign flip
  pairs with the smallest singular value), which equals
  Q (I - 2 v3 v3^T) with v3 the smallest right singular vector, since
  Q v3 = u3. This matches the reference's SVD construction
  (/root/reference/nerfies/training.py:56-68) on orientation-reversing
  Jacobians without materializing the full SVD.
  """
  X = J
  for _ in range(num_iters):
    # Determinantal scaling (Higham): normalizing the geometric mean of
    # the singular values each step keeps convergence fast even for
    # ill-conditioned inputs (plain Newton needs ~log2(cond) extra
    # iterations to recover from its first overshoot).
    mu = jnp.abs(det3(X)) ** (-1.0 / 3.0)
    mu = jnp.clip(mu, 1e-4, 1e4)
    X = 0.5 * (mu * X + jnp.swapaxes(inv3(mu * X), 0, 1))
  v = _smallest_right_singular_vector(J)
  # Explicit matrix-vector product (einsum would lower to a batch-leading
  # dot_general; see _jtj_entries).
  Xv = jnp.stack([X[i, 0] * v[0] + X[i, 1] * v[1] + X[i, 2] * v[2]
                  for i in range(3)])
  flipped = X - 2.0 * Xv[:, None] * v[None, :]
  return jnp.where(det3(J) < 0, flipped, X)
