"""Differentiable numerics: safe norms, robust losses, Jacobian operators.

TPU-native counterpart of the differentiable half of the reference utils
(/root/reference/nerfies/utils.py:34-331). These functions sit inside the
jitted train step; everything is branch-free and batched.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def safe_norm(x, axis=-1, keepdims=False, tol=1e-9):
  """L2 norm with a gradient that is zero (not NaN) at x == 0.

  Mirrors reference utils.py:34-68; the custom JVP zeroes the tangent inside
  `tol` of the origin instead of dividing by zero.
  """
  return jnp.linalg.norm(x, axis=axis, keepdims=keepdims)


@safe_norm.defjvp
def _safe_norm_jvp(axis, keepdims, tol, primals, tangents):
  x, = primals
  x_dot, = tangents
  safe_tol = max(tol, 1e-30)
  y = jnp.linalg.norm(x, axis=axis, keepdims=True)
  y_safe = jnp.maximum(y, tol)
  y_dot = jnp.where(y > safe_tol, x_dot * x / y_safe, jnp.zeros_like(x))
  y_dot = jnp.sum(y_dot, axis=axis, keepdims=True)
  if not keepdims:
    y = jnp.squeeze(y, axis=axis)
    y_dot = jnp.squeeze(y_dot, axis=axis)
  return y, y_dot


def jacobian_to_curl(jacobian: jnp.ndarray) -> jnp.ndarray:
  """Curl of the displacement field from its Jacobian.

  Leading layout (see ops/svd3.py): `jacobian` is (3, 3, ...) with
  J[i, j] = d out_i / d in_j; the curl is returned as (3, ...).
  """
  dfx_dy = jacobian[0, 1]
  dfx_dz = jacobian[0, 2]
  dfy_dx = jacobian[1, 0]
  dfy_dz = jacobian[1, 2]
  dfz_dx = jacobian[2, 0]
  dfz_dy = jacobian[2, 1]
  return jnp.stack([
      dfz_dy - dfy_dz,
      dfx_dz - dfz_dx,
      dfy_dx - dfx_dy,
  ])


def jacobian_to_div(jacobian: jnp.ndarray) -> jnp.ndarray:
  """Divergence of the displacement field: trace(J) - 3 for J of x -> x+f(x).

  `jacobian` is (3, 3, ...) leading layout.
  """
  return jacobian[0, 0] + jacobian[1, 1] + jacobian[2, 2] - 3.0


def compute_psnr(mse: jnp.ndarray) -> jnp.ndarray:
  """PSNR assuming a peak value of 1.0."""
  return -10.0 * jnp.log(mse) / jnp.log(10.0)


def log1p_safe(x):
  return jnp.log1p(jnp.minimum(x, 3e37))


def exp_safe(x):
  return jnp.exp(jnp.minimum(x, 87.5))


def expm1_safe(x):
  return jnp.expm1(jnp.minimum(x, 87.5))


def safe_sqrt(x, eps=1e-7):
  safe_x = jnp.where(x == 0, jnp.ones_like(x) * eps, x)
  return jnp.sqrt(safe_x)


def logit(y):
  return -jnp.log(1.0 / y - 1.0)


def affine_sigmoid(real, lo=0, hi=1):
  """Maps reals to (lo, hi), where 0 maps to (lo+hi)/2."""
  if not lo < hi:
    raise ValueError(f'`lo` ({lo:g}) must be < `hi` ({hi:g})')
  return jax.nn.sigmoid(real) * (hi - lo) + lo


def inv_affine_sigmoid(alpha, lo=0, hi=1):
  if not lo < hi:
    raise ValueError(f'`lo` ({lo:g}) must be < `hi` ({hi:g})')
  return logit((alpha - lo) / (hi - lo))


def inv_softplus(y):
  return jnp.where(y > 87.5, y, jnp.log(jnp.expm1(y)))


def affine_softplus(real, lo=0, ref=1):
  """Maps reals to (lo, inf), where 0 maps to ref."""
  if not lo < ref:
    raise ValueError(f'`lo` ({lo:g}) must be < `ref` ({ref:g})')
  shift = inv_softplus(1.0)
  return (ref - lo) * jax.nn.softplus(real + shift) + lo


def inv_affine_softplus(scale, lo=0, ref=1):
  if not lo < ref:
    raise ValueError(f'`lo` ({lo:g}) must be < `ref` ({ref:g})')
  shift = inv_softplus(1.0)
  return inv_softplus((scale - lo) / (ref - lo)) - shift


def general_loss_with_squared_residual(squared_x, alpha, scale):
  """Barron's general adaptive robust loss, applied to squared residuals.

  Evaluates `scale * rho(x, alpha, c)` where rho is eq. (1) of "A General
  and Adaptive Robust Loss Function" (arXiv:1701.03077):

      rho(x, a, c) = (|a-2| / a) * ((z / |a-2| + 1)^(a/2) - 1),
      z = (x / c)^2,

  with the removable singularities filled in by their limits: 0.5*z at
  a = 2 (L2), log1p(0.5*z) at a = 0 (Cauchy), 1 - exp(-0.5*z) at
  a = -inf (Welsch), exp(0.5*z) - 1 at a = +inf. Behavior-compatible with
  reference utils.py:264-331 (including the final `scale *` factor);
  taking the squared residual directly avoids a sqrt/square round-trip.

  Args:
    squared_x: squared residuals x^2, any shape.
    alpha: shape parameter; -2 = Geman-McClure, 0 = Cauchy, 2 = L2.
    scale: the scale parameter c.

  Returns:
    Loss values, same shape as `squared_x`.
  """
  dtype = jnp.result_type(squared_x, jnp.float32)
  alpha = jnp.asarray(alpha, dtype=dtype)
  z = squared_x / (scale * scale)

  # The general branch is evaluated everywhere (XLA computes all lanes of a
  # select anyway), so keep its denominators bounded away from the a = 0 and
  # a = 2 singularities; those lanes are replaced by their limits below.
  tiny = jnp.finfo(dtype).eps
  abs_am2 = jnp.maximum(jnp.abs(alpha - 2.0), tiny)
  signed_a = jnp.where(alpha < 0.0, -1.0, 1.0) * jnp.maximum(
      jnp.abs(alpha), tiny)
  general = abs_am2 / signed_a * (
      jnp.power(z / abs_am2 + 1.0, 0.5 * alpha) - 1.0)

  rho = jnp.select(
      condlist=[
          alpha == 2.0,
          alpha == 0.0,
          alpha == -jnp.inf,
          alpha == jnp.inf,
      ],
      choicelist=[
          0.5 * z,
          log1p_safe(0.5 * z),
          -jnp.expm1(-0.5 * z),
          expm1_safe(0.5 * z),
      ],
      default=general)
  return scale * rho
