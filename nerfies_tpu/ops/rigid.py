"""Batched rigid-body (Lie group) operations.

TPU-native counterpart of the reference's per-vector helpers
(/root/reference/nerfies/rigid_body.py:21-97). The reference operates on
single `(3,)` / `(6,)` vectors and relies on `jax.vmap` towers; here every op
is natively batched over arbitrary leading dimensions so XLA sees one large
fused elementwise/matmul graph instead of a vmapped scalar program.

Conventions follow Modern Robotics (Lynch & Park):
  - `exp_so3`: Rodrigues' formula (MR eqn 3.51).
  - `exp_se3`: screw-motion exponential (MR eqn 3.88).
"""

import jax.numpy as jnp


def skew(w: jnp.ndarray) -> jnp.ndarray:
  """Builds the skew ("cross-product") matrix for vectors `w`.

  Args:
    w: (..., 3) axis vectors.

  Returns:
    (..., 3, 3) matrices W with W @ v == w x v.
  """
  zeros = jnp.zeros_like(w[..., 0])
  wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
  row0 = jnp.stack([zeros, -wz, wy], axis=-1)
  row1 = jnp.stack([wz, zeros, -wx], axis=-1)
  row2 = jnp.stack([-wy, wx, zeros], axis=-1)
  return jnp.stack([row0, row1, row2], axis=-2)


def exp_so3(w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
  """so(3) -> SO(3) exponential map (Rodrigues' formula).

  Args:
    w: (..., 3) unit rotation axes.
    theta: (...,) rotation angles.

  Returns:
    (..., 3, 3) rotation matrices.
  """
  W = skew(w)
  WW = W @ W
  sin = jnp.sin(theta)[..., None, None]
  one_minus_cos = (1.0 - jnp.cos(theta))[..., None, None]
  eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
  return eye + sin * W + one_minus_cos * WW


def exp_se3(S: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
  """se(3) -> SE(3) exponential map (MR eqn 3.88).

  Args:
    S: (..., 6) screw axes, split as (w, v) with ``|w| == 1``.
    theta: (...,) motion magnitudes.

  Returns:
    (..., 4, 4) homogeneous transforms.
  """
  w, v = S[..., :3], S[..., 3:]
  W = skew(w)
  WW = W @ W
  R = exp_so3(w, theta)
  th = theta[..., None, None]
  eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
  G = (th * eye + (1.0 - jnp.cos(theta))[..., None, None] * W
       + (theta - jnp.sin(theta))[..., None, None] * WW)
  p = (G @ v[..., None])[..., 0]
  return rp_to_se3(R, p)


def rp_to_se3(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
  """Assembles homogeneous transforms from rotations and translations.

  Args:
    R: (..., 3, 3) rotation matrices.
    p: (..., 3) translations.

  Returns:
    (..., 4, 4) homogeneous transforms.
  """
  top = jnp.concatenate([R, p[..., None]], axis=-1)
  bottom = jnp.broadcast_to(
      jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4))
  return jnp.concatenate([top, bottom], axis=-2)


def se3_apply(S: jnp.ndarray, theta: jnp.ndarray,
              points: jnp.ndarray) -> jnp.ndarray:
  """Applies `exp_se3(S, theta)` to points WITHOUT forming 4x4 matrices.

  Fused form of ``from_homogenous(exp_se3(S, theta) @ to_homogenous(p))``
  (reference warping.py:343-344). Expanding the Rodrigues terms keeps
  everything as (..., 3) vector arithmetic on the VPU: no 4x4 matmuls, no
  homogeneous divide (the bottom row is exactly [0,0,0,1]).

    R p_in = p + sin(t) (w x p) + (1-cos(t)) (w x (w x p))
    trans  = t v + (1-cos(t)) (w x v) + (t - sin(t)) (w x (w x v))

  Args:
    S: (..., 6) screw axes (w unit-norm).
    theta: (...,) magnitudes.
    points: (..., 3) points.

  Returns:
    (..., 3) transformed points.
  """
  w, v = S[..., :3], S[..., 3:]
  sin = jnp.sin(theta)[..., None]
  cos1 = (1.0 - jnp.cos(theta))[..., None]
  tms = (theta - jnp.sin(theta))[..., None]
  th = theta[..., None]

  wxp = jnp.cross(w, points)
  wwxp = jnp.cross(w, wxp)
  rotated = points + sin * wxp + cos1 * wwxp

  wxv = jnp.cross(w, v)
  wwxv = jnp.cross(w, wxv)
  translation = th * v + cos1 * wxv + tms * wwxv
  return rotated + translation


def to_homogenous(v: jnp.ndarray) -> jnp.ndarray:
  return jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)


def from_homogenous(v: jnp.ndarray) -> jnp.ndarray:
  return v[..., :3] / v[..., -1:]


def se3_apply_raw(w: jnp.ndarray, v: jnp.ndarray,
                  points: jnp.ndarray) -> jnp.ndarray:
  """Applies exp([w, v]) to points from RAW (unnormalized) twists.

  Identical to ``se3_apply(concat([w, v]) / |w|, |w|, points)`` for
  |w| > 0, but formulated with sinc-style coefficients of theta = |w|:

    R p   = p + a (w x p) + b (w x (w x p)),   a = sin(t)/t,
    trans = v + b (w x v) + c (w x (w x v)),   b = (1-cos(t))/t^2,
                                               c = (t-sin(t))/t^3,

  with Taylor switches below t < 0.1. This removes the w/|w|
  normalization cliff entirely: at w = 0 the transform is EXACTLY the
  translation by v with finite gradients. That cliff is live on TPU --
  denormal |w|^2 sums flush to zero, so the unit-axis form divides by
  zero for near-identity rotations (the reference inherits this,
  warping.py:334-342; on GPU denormals survive and it rarely fires).

  Args:
    w: (..., 3) rotation twists (NOT unit; |w| is the angle).
    v: (..., 3) translation twists.
    points: (..., 3).

  Returns:
    (..., 3) transformed points.
  """
  theta_sq = jnp.sum(w * w, axis=-1)
  # The exact branch's input is clamped into the region where that branch
  # is actually SELECTED (theta_sq >= 0.01). Clamping to a mere epsilon is
  # not enough: higher-order derivatives of sin(t)/t etc. diverge as
  # t -> 0, and the elastic regularizer differentiates THROUGH the warp
  # Jacobian, so second derivatives of the unselected lanes flow into the
  # loss gradient (the classic `where` trap, one derivative order up).
  theta_sq_safe = jnp.maximum(theta_sq, 0.005)
  theta = jnp.sqrt(theta_sq_safe)
  sin_t = jnp.sin(theta)
  a_exact = sin_t / theta
  # 2 sin^2(t/2) / t^2: cancellation-free form of (1 - cos t) / t^2.
  half_sin = jnp.sin(0.5 * theta)
  b_exact = 2.0 * half_sin * half_sin / theta_sq_safe
  c_exact = (theta - sin_t) / (theta_sq_safe * theta)

  small = theta_sq < 0.01  # theta < 0.1: two Taylor terms < 1e-8 error
  a = jnp.where(small, 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0,
                a_exact)[..., None]
  b = jnp.where(small, 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0,
                b_exact)[..., None]
  c = jnp.where(small,
                1.0 / 6.0 - theta_sq / 120.0
                + theta_sq * theta_sq / 5040.0,
                c_exact)[..., None]

  wxp = jnp.cross(w, points)
  wwxp = jnp.cross(w, wxp)
  rotated = points + a * wxp + b * wwxp

  wxv = jnp.cross(w, v)
  wwxv = jnp.cross(w, wxv)
  translation = v + b * wxv + c * wwxv
  return rotated + translation
