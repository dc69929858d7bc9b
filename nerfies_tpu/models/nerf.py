"""The deformable NeRF model: coarse+fine MLPs with an optional warp field.

Capability parity with /root/reference/nerfies/models.py:31-489. Structural
differences (TPU-first):

  - Encoders are batched functions (`ops.encoding.posenc`), not vmapped
    modules; conditions stay per-ray all the way into `NerfMLP`'s
    SplitDense layers.
  - Warp metadata is embedded once per ray and broadcast inside the field
    (the reference broadcasts raw ids to every sample and embeds per
    sample, models.py:255-257 -- same math, S times the gathers).
  - `apply_warp` exposes the warp field on arbitrarily-shaped point sets
    with the same parameters, replacing the reference's re-instantiated
    vmapped module in the background loss (training.py:117-135).

Fixed vs reference (documented bugs, see SURVEY.md):
  - `use_rgb_condition` gates the rgb-branch appearance condition (the
    reference checks `use_alpha_condition` twice, models.py:204-207).
  - density noise applies to the raw sigma array (the reference passes a
    dict into an array-slicing function; the code path only survives
    because `noise_std` defaults to None, models.py:274, model_utils.py:281).
"""

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
from flax.core import FrozenDict
import jax
import jax.numpy as jnp
from jax import random

from nerfies_tpu import configs
from nerfies_tpu.models import glo
from nerfies_tpu.models import modules
from nerfies_tpu.models import warping
from nerfies_tpu.ops import encoding
from nerfies_tpu.ops import rendering


class NerfModel(nn.Module):
  """Coarse+fine NeRF with optional SE(3)/translation deformation field.

  Attribute semantics follow the reference (models.py:34-117); see
  `configs.ModelConfig` for documentation of each field.
  """
  num_coarse_samples: int
  num_fine_samples: int
  use_viewdirs: bool
  near: float
  far: float
  noise_std: Optional[float]
  rgb_padding: float
  nerf_trunk_depth: int
  nerf_trunk_width: int
  nerf_rgb_branch_depth: int
  nerf_rgb_branch_width: int
  nerf_skips: Tuple[int, ...]
  alpha_channels: int
  rgb_channels: int
  use_stratified_sampling: bool
  num_nerf_point_freqs: int
  num_nerf_viewdir_freqs: int

  appearance_ids: Sequence[int]
  camera_ids: Sequence[int]
  warp_ids: Sequence[int]

  num_appearance_features: int
  num_camera_features: int
  num_warp_features: int
  num_warp_freqs: int

  activation: Any = nn.relu
  sigma_activation: Any = nn.relu
  use_white_background: bool = False
  use_linear_disparity: bool = False
  use_sample_at_infinity: bool = True

  warp_field_type: str = 'se3'
  warp_metadata_encoder_type: str = 'glo'
  use_appearance_metadata: bool = False
  use_camera_metadata: bool = False
  use_warp: bool = False
  use_warp_jacobian: bool = False
  use_weights: bool = False
  use_trunk_condition: bool = False
  use_alpha_condition: bool = False
  use_rgb_condition: bool = False
  use_remat: bool = True
  remat_policy: str = 'dots'
  use_bfloat16: bool = False
  use_fused_mlp: bool = False
  use_fused_warp: bool = True
  warp_kwargs: Mapping[str, Any] = FrozenDict()

  metadata_encoded: bool = False

  @property
  def num_appearance_embeddings(self):
    return max(self.appearance_ids) + 1

  @property
  def num_warp_embeddings(self):
    return max(self.warp_ids) + 1

  @property
  def num_camera_embeddings(self):
    return max(self.camera_ids) + 1

  @property
  def compute_dtype(self):
    return jnp.bfloat16 if self.use_bfloat16 else None

  def setup(self):
    if self.use_warp:
      self.warp_field = warping.create_warp_field(
          field_type=self.warp_field_type,
          num_freqs=self.num_warp_freqs,
          num_embeddings=self.num_warp_embeddings,
          num_features=self.num_warp_features,
          metadata_encoder_type=self.warp_metadata_encoder_type,
          use_remat=self.use_remat,
          dtype=self.compute_dtype,
          **dict(self.warp_kwargs))

    if self.use_appearance_metadata:
      self.appearance_encoder = glo.GloEncoder(
          num_embeddings=self.num_appearance_embeddings,
          features=self.num_appearance_features)
    if self.use_camera_metadata:
      self.camera_encoder = glo.GloEncoder(
          num_embeddings=self.num_camera_embeddings,
          features=self.num_camera_features)

    # Rematerialization: recompute trunk activations in the backward pass
    # instead of holding (B, S, width) f32 tensors in HBM per layer.
    if self.use_remat:
      policy = (jax.checkpoint_policies.dots_saveable
                if self.remat_policy == 'dots' else None)
      nerf_mlp_cls = nn.remat(modules.NerfMLP, policy=policy)
    else:
      nerf_mlp_cls = modules.NerfMLP
    nerf_mlps = {
        'coarse': nerf_mlp_cls(
            trunk_depth=self.nerf_trunk_depth,
            trunk_width=self.nerf_trunk_width,
            rgb_branch_depth=self.nerf_rgb_branch_depth,
            rgb_branch_width=self.nerf_rgb_branch_width,
            activation=self.activation,
            skips=self.nerf_skips,
            alpha_channels=self.alpha_channels,
            rgb_channels=self.rgb_channels,
            dtype=self.compute_dtype)
    }
    if self.num_fine_samples > 0:
      nerf_mlps['fine'] = nerf_mlp_cls(
          trunk_depth=self.nerf_trunk_depth,
          trunk_width=self.nerf_trunk_width,
          rgb_branch_depth=self.nerf_rgb_branch_depth,
          rgb_branch_width=self.nerf_rgb_branch_width,
          activation=self.activation,
          skips=self.nerf_skips,
          alpha_channels=self.alpha_channels,
          rgb_channels=self.rgb_channels,
          dtype=self.compute_dtype)
    self.nerf_mlps = nerf_mlps

  def get_condition_inputs(self, viewdirs, metadata, metadata_encoded=False):
    """Builds per-ray (B, C) trunk/alpha/rgb condition vectors."""
    trunk_conditions = []
    alpha_conditions = []
    rgb_conditions = []

    if self.use_viewdirs:
      viewdirs_embed = encoding.posenc(
          viewdirs, num_freqs=self.num_nerf_viewdir_freqs)
      rgb_conditions.append(viewdirs_embed)

    if self.use_appearance_metadata:
      if metadata_encoded:
        appearance_code = metadata['appearance']
      else:
        appearance_code = self.appearance_encoder(metadata['appearance'])
      if self.use_trunk_condition:
        trunk_conditions.append(appearance_code)
      if self.use_alpha_condition:
        alpha_conditions.append(appearance_code)
      if self.use_rgb_condition:
        rgb_conditions.append(appearance_code)

    if self.use_camera_metadata:
      if metadata_encoded:
        camera_code = metadata['camera']
      else:
        camera_code = self.camera_encoder(metadata['camera'])
      rgb_conditions.append(camera_code)

    concat = lambda cs: jnp.concatenate(cs, axis=-1) if cs else None
    return (concat(trunk_conditions), concat(alpha_conditions),
            concat(rgb_conditions))

  def apply_warp(self, points, warp_metadata, warp_extra,
                 return_jacobian=False, metadata_encoded=False):
    """Applies the warp field to an arbitrary point set (shared params)."""
    return self.warp_field(points, warp_metadata, warp_extra,
                           return_jacobian, metadata_encoded)

  def render_samples(self,
                     level,
                     points,
                     z_vals,
                     directions,
                     viewdirs,
                     metadata,
                     warp_extra,
                     use_warp=True,
                     use_warp_jacobian=False,
                     metadata_encoded=False,
                     return_points=False,
                     return_weights=False):
    """Evaluates one sampling level: warp -> PE -> MLP -> compositing."""
    trunk_condition, alpha_condition, rgb_condition = (
        self.get_condition_inputs(viewdirs, metadata, metadata_encoded))

    out = {}
    if return_points:
      out['points'] = points

    if use_warp:
      warp_metadata = (
          metadata['time']
          if self.warp_metadata_encoder_type == 'time' else metadata['warp'])
      warp_out = self.warp_field(points, warp_metadata, warp_extra,
                                 use_warp_jacobian, metadata_encoded)
      points = warp_out['warped_points']
      if 'jacobian' in warp_out:
        out['warp_jacobian'] = warp_out['jacobian']
      if return_points:
        out['warped_points'] = warp_out['warped_points']

    points_embed = encoding.posenc(
        points, num_freqs=self.num_nerf_point_freqs)

    raw = self.nerf_mlps[level](points_embed, trunk_condition,
                                alpha_condition, rgb_condition)
    raw_sigma = jnp.squeeze(raw['alpha'], axis=-1)
    raw_sigma = rendering.noise_regularize(
        self.make_rng(level) if (self.noise_std and
                                 self.use_stratified_sampling) else None,
        raw_sigma, self.noise_std, self.use_stratified_sampling)
    rgb = nn.sigmoid(raw['rgb'])
    if self.rgb_padding:
      # Widened sigmoid (see configs.ModelConfig.rgb_padding): keeps a
      # finite-logit optimum for saturated 0/1 targets.
      rgb = rgb * (1.0 + 2.0 * self.rgb_padding) - self.rgb_padding
    sigma = self.sigma_activation(raw_sigma)
    out.update(rendering.volumetric_rendering(
        rgb,
        sigma,
        z_vals,
        directions,
        return_weights=return_weights,
        use_white_background=self.use_white_background,
        sample_at_infinity=self.use_sample_at_infinity))
    return out

  def __call__(
      self,
      rays_dict: Dict[str, Any],
      warp_extra: Dict[str, Any],
      metadata_encoded=False,
      use_warp=True,
      return_points=False,
      return_weights=False,
      return_warp_jacobian=False,
      deterministic=False,
  ):
    """Renders a batch of rays at coarse (+fine) levels.

    Args:
      rays_dict: {'origins' (B,3), 'directions' (B,3), 'viewdirs'? (B,3),
        'metadata': {'warp'/'camera'/'appearance' (B,1) uint32,
        'time' (B,1) float32}}.
      warp_extra: {'alpha', 'time_alpha'} annealing scalars.
      metadata_encoded: metadata already holds embeddings.
      use_warp: apply the warp field (if the model has one).
      return_points: include (warped) sample points in the output.
      return_weights: include compositing weights.
      return_warp_jacobian: include warp Jacobians.
      deterministic: unused; sampling determinism is controlled by
        `use_stratified_sampling` (kept for API parity).

    Returns:
      {'coarse': {...}, 'fine'?: {...}} render dicts.
    """
    del deterministic
    use_warp = self.use_warp and use_warp
    return_weights_out = self.use_weights or return_weights
    origins = rays_dict['origins']
    directions = rays_dict['directions']
    metadata = rays_dict['metadata']
    viewdirs = rays_dict.get('viewdirs', directions)

    z_vals, points = rendering.sample_along_rays(
        self.make_rng('coarse') if self.use_stratified_sampling else None,
        origins, directions, self.num_coarse_samples, self.near, self.far,
        self.use_stratified_sampling, self.use_linear_disparity)
    coarse_ret = self.render_samples(
        'coarse',
        points,
        z_vals,
        directions,
        viewdirs,
        metadata,
        warp_extra,
        use_warp=use_warp,
        use_warp_jacobian=return_warp_jacobian or self.use_warp_jacobian,
        metadata_encoded=metadata_encoded,
        return_points=return_points,
        return_weights=True)
    out = {'coarse': coarse_ret}

    if self.num_fine_samples > 0:
      z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
      z_vals, points = rendering.sample_pdf(
          self.make_rng('fine') if self.use_stratified_sampling else None,
          z_vals_mid, coarse_ret['weights'][..., 1:-1],
          origins, directions, z_vals, self.num_fine_samples,
          self.use_stratified_sampling)
      out['fine'] = self.render_samples(
          'fine',
          points,
          z_vals,
          directions,
          viewdirs,
          metadata,
          warp_extra,
          use_warp=use_warp,
          use_warp_jacobian=return_warp_jacobian,
          metadata_encoded=metadata_encoded,
          return_points=return_points,
          return_weights=return_weights_out)

    if not return_weights_out:
      del out['coarse']['weights']
    return out


def construct_nerf(key,
                   config: 'configs.ModelConfig',
                   batch_size: int,
                   appearance_ids: Sequence[int],
                   camera_ids: Sequence[int],
                   warp_ids: Sequence[int],
                   near: float,
                   far: float,
                   use_warp_jacobian: bool = False,
                   use_weights: bool = False):
  """Builds a NerfModel from a ModelConfig and initializes its parameters.

  Signature parity with reference models.py:378-489.

  Returns:
    (model, params) where params is the 'params' collection.
  """
  model = NerfModel(
      num_coarse_samples=config.num_coarse_samples,
      num_fine_samples=config.num_fine_samples,
      use_viewdirs=config.use_viewdirs,
      near=near,
      far=far,
      noise_std=config.noise_std,
      rgb_padding=config.rgb_padding,
      nerf_trunk_depth=config.nerf_trunk_depth,
      nerf_trunk_width=config.nerf_trunk_width,
      nerf_rgb_branch_depth=config.nerf_rgb_branch_depth,
      nerf_rgb_branch_width=config.nerf_rgb_branch_width,
      use_trunk_condition=config.use_trunk_condition,
      use_alpha_condition=config.use_alpha_condition,
      use_rgb_condition=config.use_rgb_condition,
      activation=config.activation,
      sigma_activation=config.sigma_activation,
      nerf_skips=tuple(config.nerf_skips),
      alpha_channels=config.alpha_channels,
      rgb_channels=config.rgb_channels,
      use_stratified_sampling=config.use_stratified_sampling,
      use_white_background=config.use_white_background,
      use_sample_at_infinity=config.use_sample_at_infinity,
      num_nerf_point_freqs=config.num_nerf_point_freqs,
      num_nerf_viewdir_freqs=config.num_nerf_viewdir_freqs,
      use_linear_disparity=config.use_linear_disparity,
      use_warp_jacobian=use_warp_jacobian,
      use_weights=use_weights,
      use_appearance_metadata=config.use_appearance_metadata,
      use_camera_metadata=config.use_camera_metadata,
      use_warp=config.use_warp,
      appearance_ids=tuple(appearance_ids),
      camera_ids=tuple(camera_ids),
      warp_ids=tuple(warp_ids),
      num_appearance_features=config.appearance_metadata_dims,
      num_camera_features=config.camera_metadata_dims,
      num_warp_freqs=config.num_warp_freqs,
      num_warp_features=config.num_warp_features,
      warp_field_type=config.warp_field_type,
      warp_metadata_encoder_type=config.warp_metadata_encoder_type,
      warp_kwargs=FrozenDict(config.warp_kwargs),
      use_remat=config.use_remat,
      remat_policy=config.remat_policy,
      use_bfloat16=config.use_bfloat16,
      use_fused_mlp=config.use_fused_mlp,
      use_fused_warp=config.use_fused_warp,
  )

  # Parameter shapes (and init values) are independent of the ray batch, so
  # init runs at a small batch on the host CPU backend: compiling the full
  # forward on a remote TPU just to draw parameters takes minutes, while
  # the CPU init is seconds. Params return as host arrays; callers place
  # them on the mesh (train.py device_puts the TrainState).
  init_batch = min(batch_size, 64)
  init_rays_dict = {
      'origins': jnp.ones((init_batch, 3), jnp.float32),
      'directions': jnp.ones((init_batch, 3), jnp.float32),
      'metadata': {
          'warp': jnp.ones((init_batch, 1), jnp.uint32),
          'camera': jnp.ones((init_batch, 1), jnp.uint32),
          'appearance': jnp.ones((init_batch, 1), jnp.uint32),
          'time': jnp.ones((init_batch, 1), jnp.float32),
      }
  }
  warp_extra = {'alpha': 0.0, 'time_alpha': 0.0}

  key, key1, key2 = random.split(key, 3)
  try:
    # local_devices, not devices: in a multi-process run the global list
    # starts with process 0's devices, and eagerly initializing on a
    # non-addressable device crashes.
    init_device = jax.local_devices(backend='cpu')[0]
  except RuntimeError:
    init_device = None
  with jax.default_device(init_device):
    params = model.init(
        {'params': key, 'coarse': key1, 'fine': key2},
        init_rays_dict,
        warp_extra=warp_extra)['params']
  return model, jax.device_get(params)
