"""Experiment / model / train / eval configuration dataclasses.

Field-parity with /root/reference/nerfies/configs.py:35-213 so the reference
config zoo (configs/*.gin) parses unchanged against ``nerfies_tpu.minigin``.
TPU-specific additions are grouped at the bottom of each class and default to
reference behavior.
"""

import dataclasses
from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn

from nerfies_tpu import minigin as gin

ScheduleDef = Any

# Activations reachable from config files as @nn.<name> (reference
# configs.py:27-32).
for _act_name in ('elu', 'relu', 'leaky_relu', 'tanh', 'sigmoid', 'softplus'):
  gin.external_configurable(getattr(nn, _act_name), name=_act_name,
                            module='flax.nn')
  gin.register_external(f'nn.{_act_name}', getattr(nn, _act_name))


@gin.configurable
@dataclasses.dataclass
class ModelConfig:
  """Parameters for the NeRF model (reference configs.py:35-105)."""
  # Sample linearly in disparity rather than depth.
  use_linear_disparity: bool = False
  # Use white as the default background.
  use_white_background: bool = False
  # Use stratified sampling.
  use_stratified_sampling: bool = True
  # Use the sample at infinity.
  use_sample_at_infinity: bool = True
  # The standard deviation of the alpha noise.
  noise_std: Optional[float] = None
  # Widened-sigmoid rgb padding: rgb = sigmoid(x)*(1+2p) - p. With p=0
  # (reference parity) a pure-0/1 target pixel drives its logit toward
  # +/-inf until sigmoid saturates EXACTLY in f32 and its gradient dies
  # bitwise — measured killing a 90%-white synthetic fit dead at step
  # ~2k (docs/PERFORMANCE.md). p>0 (e.g. 0.001, the multinerf setting)
  # gives saturated targets a finite-logit optimum.
  rgb_padding: float = 0.0

  # Trunk depth/width of the NeRF MLP.
  nerf_trunk_depth: int = 8
  nerf_trunk_width: int = 256
  # Conditional (rgb) branch depth/width.
  nerf_rgb_branch_depth: int = 1
  nerf_rgb_branch_width: int = 128
  # Intermediate / sigma activations.
  activation: Any = nn.relu
  sigma_activation: Any = nn.relu
  # Skip connection layers.
  nerf_skips: Tuple[int, ...] = (4,)
  # Output channel counts.
  alpha_channels: int = 1
  rgb_channels: int = 3
  # Positional encoding octaves.
  num_nerf_point_freqs: int = 10
  num_nerf_viewdir_freqs: int = 4
  # Samples per ray.
  num_coarse_samples: int = 64
  num_fine_samples: int = 128
  # Conditioning switches.
  use_viewdirs: bool = True
  use_trunk_condition: bool = False
  use_alpha_condition: bool = False
  use_rgb_condition: bool = False

  # Appearance / camera GLO metadata.
  use_appearance_metadata: bool = False
  appearance_metadata_dims: int = 8
  use_camera_metadata: bool = False
  camera_metadata_dims: int = 2

  # Warp field.
  use_warp: bool = False
  num_warp_freqs: int = 8
  num_warp_features: int = 8
  warp_field_type: str = 'translation'  # 'translation' | 'se3'
  warp_metadata_encoder_type: str = 'glo'
  warp_kwargs: Mapping[str, Any] = dataclasses.field(default_factory=dict)

  # --- TPU-native extensions (default = reference behavior) ---
  # Run the NeRF/warp MLP matmuls in bfloat16 with float32 accumulation and
  # compositing. MXU-friendly; ~2x matmul throughput on TPU.
  use_bfloat16: bool = False
  # Rematerialize MLP activations in the backward pass (jax.checkpoint).
  # Trades ~1/3 extra forward FLOPs for O(width * samples) less HBM --
  # required to fit the quarter-HD batch (6144 rays x 256 samples) on a
  # single 16 GB chip.
  use_remat: bool = True
  # Remat policy: 'nothing' recomputes everything (least memory);
  # 'dots' saves matmul outputs and recomputes only elementwise ops
  # (measured ~4% faster on the quarter-HD step, still fits 16 GB).
  remat_policy: str = 'dots'
  # Run the NeRF MLP stacks of the TRAIN step through the fused Pallas
  # custom-VJP kernel (ops/fused_mlp.nerf_mlp_train): one HBM pass per
  # stack per direction with tile-wise activation recompute in VMEM,
  # instead of XLA's HBM-bandwidth-bound per-layer schedule. Falls back
  # to the flax path when the architecture is unsupported
  # (fused_train.supported).
  use_fused_mlp: bool = False
  # When the fused train path is active, also run the warp field's trunk
  # (primal + 3 Jacobian tangent chains) through the fused Pallas kernel
  # (ops/fused_warp.warp_mlp_train). Off routes the warp through the flax
  # module while keeping the fused NeRF MLPs -- a measurement toggle for
  # attributing on-chip gains per kernel.
  use_fused_warp: bool = True


@gin.configurable
@dataclasses.dataclass
class ExperimentConfig:
  """Experiment configuration (reference configs.py:108-124)."""
  subname: Optional[str] = None
  # Image scale; should be a power of 2.
  image_scale: int = 4
  # Random seed for all experiment RNGs.
  random_seed: int = 12345
  # Datasource type; 'nerfies' is the on-disk capture format.
  datasource_type: str = 'nerfies'
  datasource_spec: Optional[Mapping[str, Any]] = None
  datasource_kwargs: Mapping[str, Any] = dataclasses.field(
      default_factory=dict)


@gin.configurable
@dataclasses.dataclass
class TrainConfig:
  """Training parameters (reference configs.py:127-190)."""
  batch_size: Any = gin.REQUIRED

  lr_schedule: ScheduleDef = dataclasses.field(default_factory=lambda: {
      'type': 'exponential',
      'initial_value': 0.001,
      'final_value': 0.0001,
      'num_steps': 1000000,
  })
  max_steps: int = 1000000

  warp_alpha_schedule: ScheduleDef = dataclasses.field(default_factory=lambda: {
      'type': 'linear',
      'initial_value': 0.0,
      'final_value': 8.0,
      'num_steps': 80000,
  })
  time_alpha_schedule: ScheduleDef = ('constant', 0.0)

  # Elastic regularization.
  use_elastic_loss: bool = False
  elastic_loss_weight_schedule: ScheduleDef = ('constant', 0.0)
  elastic_reduce_method: str = 'weight'  # 'weight' | 'median'
  elastic_loss_type: str = 'log_svals'
  # Background regularization.
  use_background_loss: bool = False
  background_loss_weight: float = 0.0
  background_points_batch_size: int = 16384
  # Warp regularization.
  use_warp_reg_loss: bool = False
  warp_reg_loss_weight: float = 0.0
  warp_reg_loss_alpha: float = -2.0
  warp_reg_loss_scale: float = 0.001

  # Data pipeline shuffle buffer (kept for config-zoo compatibility; the
  # TPU ray-pool pipeline always performs full-pool permutation shuffles).
  shuffle_buffer_size: int = 5000000
  # Logging cadence.
  save_every: int = 10000
  log_every: int = 500
  histogram_every: int = 5000
  print_every: int = 25


@gin.configurable
@dataclasses.dataclass
class EvalConfig:
  """Evaluation parameters (reference configs.py:193-213)."""
  eval_once: bool = False
  save_output: bool = True
  # Rays per render dispatch.
  chunk: int = 8192
  # Renders rotate after this many checkpoints.
  max_render_checkpoints: int = 3

  num_val_eval: Optional[int] = 10
  num_train_eval: Optional[int] = 10
  num_test_eval: Optional[int] = 10

  # LPIPS perceptual metric (paper-parity table). With no weights file the
  # metric falls back to a seeded random-feature distance and is reported
  # as `lpips_uncal` instead of `lpips` (see nerfies_tpu/lpips.py).
  compute_lpips: bool = True
  lpips_weights: Optional[str] = None

  # Fast-render preset: override the per-ray sample counts at eval time
  # (parameters are sample-count independent, so the trained weights
  # render at any sampling rate). None = use the training sample counts.
  # Halving both counts roughly doubles render throughput; the measured
  # quality delta on the synthetic benchmark scene is documented in
  # docs/PERFORMANCE.md.
  num_coarse_samples: Optional[int] = None
  num_fine_samples: Optional[int] = None

  # Occupancy-grid empty-space skipping (serving acceleration; see
  # nerfies_tpu/occupancy.py and docs/PERFORMANCE.md's serving table).
  # Requires the fused serving path (fast_render.supported(model) and
  # deterministic sampling) — eval logs a warning and renders unculled
  # otherwise. The grid is re-baked from each restored checkpoint's
  # density field over the COLMAP point-cloud bounds (+ margin).
  use_occupancy_culling: bool = False
  occupancy_resolution: int = 128
  occupancy_sigma_threshold: float = 0.05
  # Bounding-box margin as a fraction of the point cloud's largest extent
  # (plus the same value in absolute scene units).
  occupancy_bbox_margin: float = 0.2
  # Samples kept per level after culling; None leaves that level unculled.
  occupancy_keep_coarse: Optional[int] = None
  occupancy_keep_fine: Optional[int] = None

  # One-flag serving preset (`eval.py --fast_preview` or gin
  # `EvalConfig.fast_preview = True`): 32+64 samples/ray with occupancy
  # culling to 16+32 — the fastest mode measured by
  # scripts/serve_bench.py (docs/serve_quality.json; quality delta and
  # frame time in docs/PERFORMANCE.md's serving table). Explicitly-set
  # sample-count / occupancy fields win over the preset.
  fast_preview: bool = False
