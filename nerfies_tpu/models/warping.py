"""Deformation (warp) fields: dense translation and SE(3) fields.

Capability parity with /root/reference/nerfies/warping.py:29-389, with the
TPU-first restructurings:

  - Fields operate on natively batched points ``(..., 3)`` with per-ray (or
    per-point) metadata embeddings -- no `vmap_module` towers (reference
    warping.py:45-53). The same module instance therefore serves the
    (B, S, 3) ray-march path and the (N, 3) background-loss path with one
    set of parameters (the param-sharing trick the reference implements by
    re-instantiating a differently-vmapped module, training.py:117-135).
  - The warp Jacobian is computed with 3 broadcast JVP columns (the warp is
    pointwise in its input, so a basis tangent broadcast across the batch
    yields one Jacobian column per forward pass) instead of a per-point
    `jax.jacfwd` under two vmaps (reference warping.py:196,386).
  - The SE(3) action is applied with the fused vector form
    `rigid.se3_apply` (no 4x4 matrix materialization, no homogeneous
    divide).
"""

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfies_tpu.models import glo
from nerfies_tpu.models import modules
from nerfies_tpu.ops import encoding
from nerfies_tpu.ops import rigid


def create_warp_field(field_type: str, num_freqs: int, num_embeddings: int,
                      num_features: int, metadata_encoder_type: str = 'glo',
                      use_remat: bool = False, **kwargs):
  """Factory for warp fields (parity: reference warping.py:29-59).

  Unlike the reference there is no `num_batch_dims`: fields are natively
  batched over arbitrary leading dimensions.
  """
  if field_type == 'translation':
    field_cls = TranslationField
  elif field_type == 'se3':
    field_cls = SE3Field
  else:
    raise ValueError(f'Unknown warp field type: {field_type!r}')
  if use_remat:
    # __call__(self, points, metadata, extra, return_jacobian,
    # metadata_encoded): the two trailing bools are trace-static.
    field_cls = nn.remat(field_cls, static_argnums=(4, 5))
  return field_cls(
      num_freqs=num_freqs,
      num_embeddings=num_embeddings,
      num_embedding_features=num_features,
      metadata_encoder_type=metadata_encoder_type,
      **kwargs)


def _pointwise_jacobian(warp_fn, points: jnp.ndarray):
  """Primal + Jacobian of a pointwise map via 3 broadcast tangent columns.

  `warp_fn` maps (..., 3) -> (..., 3) with each output point depending only
  on its own input point; a constant basis tangent therefore extracts one
  full Jacobian column per linear pass. `jax.linearize` shares one primal
  evaluation across the three columns (vs 3 primal+tangent evaluations for
  repeated `jax.jvp`), and the primal is returned so the caller skips its
  own forward pass entirely.

  Returns:
    (warped (..., 3), jacobian (3, 3, ...)) in the LEADING matrix layout
    of ops/svd3.py: jacobian[i, j] = d out_i / d in_j. Trailing [..., 3, 3]
    batches tile their two minor dims to (8, 128) on TPU -- a measured 42x
    padded-memory blow-up for train-step Jacobians -- while (3, 3, B, S)
    packs perfectly.
  """
  warped, jvp_fn = jax.linearize(warp_fn, points)
  eye = jnp.eye(3, dtype=points.dtype)
  # Sequential column passes: vmapping the 3 tangents into one batched
  # pass measured no faster (the linear passes are activation-bound, not
  # weight-bound at these batch sizes) and its 3x-wider concurrent
  # activations pushed the quarter-HD train step over the 16G HBM limit.
  columns = [jvp_fn(jnp.broadcast_to(eye[j], points.shape))
             for j in range(3)]  # each (..., i)
  return warped, jnp.stack(
      [jnp.stack([columns[j][..., i] for j in range(3)])
       for i in range(3)])  # (i, j, ...)


class _MetadataEncoderMixin:
  """Shared metadata-embedding setup/encode for warp fields."""

  def _setup_metadata_encoder(self):
    if self.metadata_encoder_type == 'glo':
      self.metadata_encoder = glo.GloEncoder(
          num_embeddings=self.num_embeddings,
          features=self.num_embedding_features)
    elif self.metadata_encoder_type == 'time':
      self.metadata_encoder = modules.TimeEncoder(
          num_freqs=self.metadata_encoder_num_freqs,
          features=self.num_embedding_features)
    elif self.metadata_encoder_type == 'blend':
      self.glo_encoder = glo.GloEncoder(
          num_embeddings=self.num_embeddings,
          features=self.num_embedding_features)
      self.time_encoder = modules.TimeEncoder(
          num_freqs=self.metadata_encoder_num_freqs,
          features=self.num_embedding_features)
    else:
      raise ValueError(
          f'Unknown metadata encoder type {self.metadata_encoder_type}')

  def encode_metadata(self, metadata: jnp.ndarray,
                      time_alpha: Optional[jnp.ndarray] = None):
    """metadata ids/timestamps (..., 1) -> embeddings (..., F)."""
    if self.metadata_encoder_type == 'time':
      return self.metadata_encoder(metadata, time_alpha)
    if self.metadata_encoder_type == 'blend':
      glo_embed = self.glo_encoder(metadata)
      time_embed = self.time_encoder(metadata)
      return (1.0 - time_alpha) * glo_embed + time_alpha * time_embed
    if self.metadata_encoder_type == 'glo':
      return self.metadata_encoder(metadata)
    raise RuntimeError(
        f'Unknown metadata encoder type {self.metadata_encoder_type}')


class TranslationField(nn.Module, _MetadataEncoderMixin):
  """Dense displacement field: warp(x) = x + MLP(PE(x), code).

  Parity: reference warping.py:62-199.
  """
  num_freqs: int
  num_embeddings: int
  num_embedding_features: int
  min_freq_log2: int = 0
  max_freq_log2: Optional[int] = None
  use_identity_map: bool = True

  metadata_encoder_type: str = 'glo'
  metadata_encoder_num_freqs: int = 1

  skips: Tuple[int, ...] = (4,)
  depth: int = 6
  hidden_channels: int = 128
  activation: Any = nn.relu
  hidden_init: Any = nn.initializers.xavier_uniform()
  output_init: Any = nn.initializers.uniform(scale=1e-4)
  dtype: Any = None

  def setup(self):
    self._setup_metadata_encoder()
    self.mlp = modules.MLP(
        width=self.hidden_channels,
        depth=self.depth,
        skips=self.skips,
        hidden_init=self.hidden_init,
        hidden_activation=self.activation,
        output_init=self.output_init,
        output_channels=3,
        dtype=self.dtype)

  def warp(self, points: jnp.ndarray, metadata_embed: jnp.ndarray,
           extra: Dict[str, Any]) -> jnp.ndarray:
    points_embed = encoding.posenc(
        points, num_freqs=self.num_freqs, min_freq_log2=self.min_freq_log2,
        max_freq_log2=self.max_freq_log2, use_identity=self.use_identity_map,
        alpha=extra.get('alpha'))
    # Per-ray codes (B, F) align against per-sample points (B, S, 3) by
    # inserting the sample axis; the MLP's SplitDense path consumes them
    # without ever tiling the codes across samples in HBM.
    while metadata_embed.ndim < points.ndim:
      metadata_embed = metadata_embed[..., None, :]
    return points + self.mlp(
        [points_embed, metadata_embed]).astype(points.dtype)

  def __call__(self, points: jnp.ndarray, metadata: jnp.ndarray,
               extra: Dict[str, Any], return_jacobian: bool = False,
               metadata_encoded: bool = False) -> Dict[str, jnp.ndarray]:
    """Warps points; optionally returns per-point Jacobians.

    Args:
      points: (..., 3).
      metadata: (..., 1) ids/timestamps, or (..., F) if metadata_encoded.
      extra: {'alpha': ..., 'time_alpha': ...} annealing scalars.
      return_jacobian: also compute d(warp)/d(points).
      metadata_encoded: metadata is already an embedding.

    Returns:
      {'warped_points': (..., 3) [, 'jacobian': (3, 3, ...) leading
      layout, see ops/svd3.py]}.
    """
    if metadata_encoded:
      metadata_embed = metadata
    else:
      metadata_embed = self.encode_metadata(metadata, extra.get('time_alpha'))

    if return_jacobian:
      warped, jacobian = _pointwise_jacobian(
          lambda p: self.warp(p, metadata_embed, extra), points)
      return {'warped_points': warped, 'jacobian': jacobian}
    return {'warped_points': self.warp(points, metadata_embed, extra)}


class SE3Field(nn.Module, _MetadataEncoderMixin):
  """Dense SE(3) field: trunk MLP -> screw axis (w, v) -> exp_se3 action.

  Parity: reference warping.py:202-389 (trunk + w/v branches, optional
  pivot/translation branches, theta = |w| normalization).
  """
  num_freqs: int
  num_embeddings: int
  num_embedding_features: int
  min_freq_log2: int = 0
  max_freq_log2: Optional[int] = None
  use_identity_map: bool = True

  activation: Any = nn.relu
  skips: Tuple[int, ...] = (4,)
  trunk_depth: int = 6
  trunk_width: int = 128
  rotation_depth: int = 0
  rotation_width: int = 128
  pivot_depth: int = 0
  pivot_width: int = 128
  translation_depth: int = 0
  translation_width: int = 128
  metadata_encoder_type: str = 'glo'
  metadata_encoder_num_freqs: int = 1

  default_init: Any = nn.initializers.xavier_uniform()
  rotation_init: Any = nn.initializers.uniform(scale=1e-4)
  pivot_init: Any = nn.initializers.uniform(scale=1e-4)
  translation_init: Any = nn.initializers.uniform(scale=1e-4)
  dtype: Any = None

  use_pivot: bool = False
  use_translation: bool = False
  # Fuse the depth-0 w/v branch heads into ONE (width, 6) matmul: the two
  # (width, 3) heads read the same trunk output, and each 3-wide matmul
  # pads to a full 128-lane MXU tile — fusing halves the number of
  # padded head matmuls in the primal AND in each of the 3 Jacobian
  # tangent passes. Identical math: the fused kernel's first 3 columns
  # are w, the next 3 are v, each initialized with its own initializer.
  fuse_branch_heads: bool = True

  @property
  def _fused_heads(self) -> bool:
    return (self.fuse_branch_heads and self.rotation_depth == 0
            and self.pivot_depth == 0)

  def setup(self):
    self._setup_metadata_encoder()
    self.trunk = modules.MLP(
        depth=self.trunk_depth,
        width=self.trunk_width,
        hidden_activation=self.activation,
        hidden_init=self.default_init,
        skips=self.skips,
        dtype=self.dtype)

    branches = {}
    if self._fused_heads:
      rot_init, piv_init = self.rotation_init, self.pivot_init

      def wv_init(key, shape):
        key_w, key_v = jax.random.split(key)
        return jnp.concatenate(
            [rot_init(key_w, (shape[0], 3)), piv_init(key_v, (shape[0], 3))],
            axis=-1)

      branches['wv'] = modules.MLP(
          depth=0,
          width=self.rotation_width,
          hidden_activation=self.activation,
          hidden_init=self.default_init,
          output_init=wv_init,
          output_channels=6,
          dtype=self.dtype)
    else:
      branches['w'] = modules.MLP(
          depth=self.rotation_depth,
          width=self.rotation_width,
          hidden_activation=self.activation,
          hidden_init=self.default_init,
          output_init=self.rotation_init,
          output_channels=3,
          dtype=self.dtype)
      branches['v'] = modules.MLP(
          depth=self.pivot_depth,
          width=self.pivot_width,
          hidden_activation=self.activation,
          hidden_init=self.default_init,
          output_init=self.pivot_init,
          output_channels=3,
          dtype=self.dtype)
    if self.use_pivot:
      branches['p'] = modules.MLP(
          depth=self.pivot_depth,
          width=self.pivot_width,
          hidden_activation=self.activation,
          hidden_init=self.default_init,
          output_init=self.pivot_init,
          output_channels=3)
    if self.use_translation:
      branches['t'] = modules.MLP(
          depth=self.translation_depth,
          width=self.translation_width,
          hidden_activation=self.activation,
          hidden_init=self.default_init,
          output_init=self.translation_init,
          output_channels=3)
    self.branches = branches

  def warp(self, points: jnp.ndarray, metadata_embed: jnp.ndarray,
           extra: Dict[str, Any]) -> jnp.ndarray:
    points_embed = encoding.posenc(
        points, num_freqs=self.num_freqs, min_freq_log2=self.min_freq_log2,
        max_freq_log2=self.max_freq_log2, use_identity=self.use_identity_map,
        alpha=extra.get('alpha'))
    # Per-ray codes (B, F) align against per-sample points (B, S, 3) by
    # inserting the sample axis; the trunk's SplitDense path consumes them
    # without ever tiling the codes across samples in HBM.
    while metadata_embed.ndim < points.ndim:
      metadata_embed = metadata_embed[..., None, :]
    trunk_output = self.trunk([points_embed, metadata_embed])

    # Screw-axis math stays float32 regardless of the MLP compute dtype,
    # and uses the RAW-twist exponential: the reference's w/|w|
    # normalization (warping.py:334-342) divides by zero whenever a
    # near-identity rotation's |w|^2 underflows -- live on TPU, where
    # denormals flush to zero; one such sample NaNs the whole step
    # through the gradient. `se3_apply_raw` is exactly equal for
    # |w| > 0 and exactly the v-translation with finite gradients at
    # w = 0.
    if self._fused_heads:
      wv = self.branches['wv'](trunk_output).astype(jnp.float32)
      w, v = wv[..., :3], wv[..., 3:]
    else:
      w = self.branches['w'](trunk_output).astype(jnp.float32)
      v = self.branches['v'](trunk_output).astype(jnp.float32)

    warped_points = points.astype(jnp.float32)
    if self.use_pivot:
      pivot = self.branches['p'](trunk_output).astype(jnp.float32)
      warped_points = warped_points + pivot

    warped_points = rigid.se3_apply_raw(w, v, warped_points)

    if self.use_pivot:
      warped_points = warped_points - pivot
    if self.use_translation:
      warped_points = warped_points + self.branches['t'](
          trunk_output).astype(jnp.float32)
    return warped_points

  def __call__(self, points: jnp.ndarray, metadata: jnp.ndarray,
               extra: Dict[str, Any], return_jacobian: bool = False,
               metadata_encoded: bool = False) -> Dict[str, jnp.ndarray]:
    """Warps points; optionally returns per-point Jacobians.

    Args / returns: see `TranslationField.__call__`.
    """
    if metadata_encoded:
      metadata_embed = metadata
    else:
      metadata_embed = self.encode_metadata(metadata, extra.get('time_alpha'))

    if return_jacobian:
      warped, jacobian = _pointwise_jacobian(
          lambda p: self.warp(p, metadata_embed, extra), points)
      return {'warped_points': warped, 'jacobian': jacobian}
    return {'warped_points': self.warp(points, metadata_embed, extra)}
