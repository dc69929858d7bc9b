"""Batched quaternion algebra (xyzw convention).

Same capability surface as the reference quaternion library
(/root/reference/nerfies/quaternion.py:26-215) but natively batched over
leading dimensions. Quaternions are stored as ``(..., 4)`` arrays with the
imaginary part first: ``q = (x, y, z, w)``.
"""

import jax.numpy as jnp


def safe_acos(t: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
  """arccos with input clipped away from +-1 to keep gradients finite."""
  return jnp.arccos(jnp.clip(t, -1.0 + eps, 1.0 - eps))


def im(q: jnp.ndarray) -> jnp.ndarray:
  """Imaginary (vector) part of q."""
  return q[..., :3]


def re(q: jnp.ndarray) -> jnp.ndarray:
  """Real (scalar) part of q."""
  return q[..., 3:]


def identity(dtype=jnp.float32) -> jnp.ndarray:
  return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
  return jnp.concatenate([-im(q), re(q)], axis=-1)


def norm(q: jnp.ndarray) -> jnp.ndarray:
  return jnp.linalg.norm(q, axis=-1, keepdims=True)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
  return q / norm(q)


def inverse(q: jnp.ndarray) -> jnp.ndarray:
  return conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
  """Hamilton product of two quaternion arrays."""
  c = (re(q1) * im(q2) + re(q2) * im(q1) + jnp.cross(im(q1), im(q2)))
  w = re(q1) * re(q2) - jnp.sum(im(q1) * im(q2), axis=-1, keepdims=True)
  return jnp.concatenate([c, w], axis=-1)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
  """Rotates vectors v by unit quaternions q.

  Uses the expanded double-cross form (cheaper than q * v * q^-1 on the VPU):
    v' = v + 2 w (u x v) + 2 u x (u x v),  u = im(q), w = re(q).
  """
  u = im(q)
  w = re(q)
  uxv = jnp.cross(u, v)
  return v + 2.0 * (w * uxv + jnp.cross(u, uxv))


def log(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
  """Quaternion logarithm (maps unit quaternions to pure quaternions)."""
  mag = norm(q)
  v = im(q)
  s = re(q)
  w = jnp.log(mag)
  denom = jnp.maximum(
      jnp.linalg.norm(v, axis=-1, keepdims=True), eps * jnp.ones_like(v[..., :1]))
  xyz = v / denom * safe_acos(s / jnp.maximum(mag, eps))
  return jnp.concatenate([xyz, w], axis=-1)


def exp(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
  """Quaternion exponential (maps pure quaternions to unit quaternions)."""
  v = im(q)
  s = re(q)
  norm_v = jnp.maximum(
      jnp.linalg.norm(v, axis=-1, keepdims=True), eps * jnp.ones_like(v[..., :1]))
  scale = jnp.exp(s)
  xyz = scale * v / norm_v * jnp.sin(norm_v)
  w = scale * jnp.cos(norm_v)
  return jnp.concatenate([xyz, w], axis=-1)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
  """Converts unit quaternions (..., 4) to rotation matrices (..., 3, 3)."""
  x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
  row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
  row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
  return jnp.stack([row0, row1, row2], axis=-2)


def from_rotation_matrix(m: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
  """Converts rotation matrices (..., 3, 3) to unit quaternions (..., 4).

  Branch-free Shepperd's method: all four candidate quaternions are computed
  and the numerically best one is selected with `where` masks, so the whole
  op stays a single vectorized XLA program (the reference uses lax.cond
  chains on one matrix at a time, /root/reference/nerfies/quaternion.py:155).
  """
  m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
  m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
  m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

  tr = m00 + m11 + m22

  def _case(s_sq, build):
    s = jnp.sqrt(jnp.maximum(s_sq, eps))
    return build(s)

  # Case 0: trace positive.
  q0 = _case(tr + 1.0, lambda s: jnp.stack([
      (m21 - m12) / (2 * s), (m02 - m20) / (2 * s), (m10 - m01) / (2 * s),
      0.5 * s], axis=-1))
  # Case 1: m00 dominant.
  q1 = _case(1.0 + m00 - m11 - m22, lambda s: jnp.stack([
      0.5 * s, (m01 + m10) / (2 * s), (m02 + m20) / (2 * s),
      (m21 - m12) / (2 * s)], axis=-1))
  # Case 2: m11 dominant.
  q2 = _case(1.0 + m11 - m00 - m22, lambda s: jnp.stack([
      (m01 + m10) / (2 * s), 0.5 * s, (m12 + m21) / (2 * s),
      (m02 - m20) / (2 * s)], axis=-1))
  # Case 3: m22 dominant.
  q3 = _case(1.0 + m22 - m00 - m11, lambda s: jnp.stack([
      (m02 + m20) / (2 * s), (m12 + m21) / (2 * s), 0.5 * s,
      (m10 - m01) / (2 * s)], axis=-1))

  cond0 = (tr > 0.0)[..., None]
  cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
  cond2 = (m11 >= m22)[..., None]
  q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
  return normalize(q)
