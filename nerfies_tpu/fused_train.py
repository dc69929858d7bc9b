"""Training forward pass with the custom-VJP fused NeRF-MLP kernel.

The training analog of fast_render.py: sampling, warp (through the
module's `apply_warp`, so elastic Jacobians and the background loss keep
their exact shared-parameter semantics and `jax.linearize` path), ray
conditions and compositing stay plain differentiable jnp; the two NeRF
MLP evaluations — the HBM-bandwidth-bound ~55% of the step under XLA's
per-layer schedule (docs/PERFORMANCE.md) — run through
`ops.fused_mlp.nerf_mlp_train`, whose hand-written VJP recomputes
activations tile-wise in VMEM (remat-equivalent memory, one HBM pass per
stack per direction).

Behavioral notes vs `model.apply`:
  - Stratified sample jitter draws from the raw per-step keys instead of
    flax's `make_rng` folding — statistically identical, not bit-equal.
    Deterministic sampling is bit-comparable (pinned by
    tests/test_fused_train.py).
  - `noise_std` density regularization applies post-kernel (raw sigma is
    plain jnp by then) with a key folded from the level's sampling key
    instead of flax's `make_rng(level)` stream — again statistically
    identical, not bit-equal.

Enable via `ModelConfig.use_fused_mlp` (train.py / bench.py plumb it to
`training.train_step`, which routes here when the model opts in).
"""

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfies_tpu import fast_render
from nerfies_tpu.ops import encoding
from nerfies_tpu.ops import fused_mlp
from nerfies_tpu.ops import fused_warp
from nerfies_tpu.ops import rendering
from nerfies_tpu.ops import rigid


def supported(model) -> bool:
  """Whether the fused training path covers this model architecture."""
  return fast_render.supported(model)


def _apply_warp_kernel(model, params, points, warp_metadata, warp_extra,
                       return_jacobian, points_depend_on_params,
                       interpret):
  """SE(3)/translation warp (+ spatial Jacobian) via the fused trunk
  kernel (ops/fused_warp.py).

  Shares one `jax.linearize` primal for the three posenc tangent columns
  and one for the SE(3) action, mirroring warping._pointwise_jacobian's
  semantics exactly (parity pinned by tests/test_fused_warp.py).
  `points_depend_on_params=False` (the coarse level: raw ray samples
  carry no parameter dependence) skips the kernel's (N, C) input
  cotangents entirely.
  """
  wf = params['warp_field']
  kwargs = dict(model.warp_kwargs)
  b, s = points.shape[:2]
  n = b * s
  is_translation = model.warp_field_type == 'translation'
  if is_translation:
    trunk_depth = int(kwargs.get('depth', 6))
    mlp_tree = wf['mlp']
    trunk = {k: v for k, v in mlp_tree.items() if k.startswith('hidden')}
    head = mlp_tree['logit']
  else:
    trunk_depth = int(kwargs.get('trunk_depth', 6))
    trunk = wf['trunk']
    if 'branches_wv' in wf:
      head = wf['branches_wv']['logit']
    else:
      w_l, v_l = wf['branches_w']['logit'], wf['branches_v']['logit']
      head = {
          'kernel': jnp.concatenate([w_l['kernel'], v_l['kernel']], -1),
          'bias': jnp.concatenate([w_l['bias'], v_l['bias']], -1)}
  skips = tuple(kwargs.get('skips', (4,)))

  table = wf['metadata_encoder']['embed']['embedding']
  embed = table[warp_metadata[:, 0]]  # (B, F)
  embed_flat = jnp.repeat(embed, s, axis=0)

  pe_fn = lambda p: encoding.posenc(
      p, num_freqs=model.num_warp_freqs,
      min_freq_log2=kwargs.get('min_freq_log2', 0),
      max_freq_log2=kwargs.get('max_freq_log2'),
      use_identity=kwargs.get('use_identity_map', True),
      alpha=warp_extra.get('alpha'))
  if return_jacobian:
    pe, pe_jvp = jax.linearize(pe_fn, points)
    eye = jnp.eye(3, dtype=points.dtype)
    tangents = tuple(
        pe_jvp(jnp.broadcast_to(eye[j], points.shape)).reshape(n, -1)
        for j in range(3))
  else:
    pe, tangents = pe_fn(points), ()
  c_pe = pe.shape[-1]

  kparams = {'trunk': trunk, 'head': {'logit': head}}
  out, jouts = fused_warp.warp_mlp_train(
      pe.reshape(n, c_pe), embed_flat, tangents, kparams, trunk_depth,
      skips, points_depend_on_params, interpret)

  if is_translation:
    warped = points + out[:, :3].reshape(b, s, 3).astype(points.dtype)
    ret = {'warped_points': warped}
    if return_jacobian:
      eye = jnp.eye(3, dtype=jnp.float32)
      cols = [jouts[j][:, :3].reshape(b, s, 3) + eye[j]
              for j in range(3)]
      ret['jacobian'] = jnp.stack(
          [jnp.stack([cols[j][..., i] for j in range(3)])
           for i in range(3)])
    return ret

  w = out[:, :3].reshape(b, s, 3)
  v = out[:, 3:6].reshape(b, s, 3)
  pts32 = points.astype(jnp.float32)
  if not return_jacobian:
    return {'warped_points': rigid.se3_apply_raw(w, v, pts32)}
  warped, se3_jvp = jax.linearize(rigid.se3_apply_raw, w, v, pts32)
  eye = jnp.eye(3, dtype=jnp.float32)
  cols = [se3_jvp(jouts[j][:, :3].reshape(b, s, 3),
                  jouts[j][:, 3:6].reshape(b, s, 3),
                  jnp.broadcast_to(eye[j], pts32.shape))
          for j in range(3)]
  return {'warped_points': warped,
          'jacobian': jnp.stack(
              [jnp.stack([cols[j][..., i] for j in range(3)])
               for i in range(3)])}


def _mlp_level(params, model, level, points, z_vals, directions,
               rgb_condition, alpha_condition, return_weights, interpret,
               noise_key=None):
  b, s = points.shape[:2]
  pe = encoding.posenc(points, num_freqs=model.num_nerf_point_freqs)
  c_pe = pe.shape[-1]
  mlp_params = params[f'nerf_mlps_{level}']
  width = mlp_params['trunk_hidden_0']['kernel'].shape[1]
  bf16 = jnp.bfloat16

  rgb_row_bias = None
  if rgb_condition is not None:
    rgb_k = mlp_params['rgb_hidden_0']['kernel']
    rgb_row_bias = jnp.repeat(
        rgb_condition.astype(bf16), s, axis=0) @ rgb_k[width:].astype(bf16)
  alpha, rgb_raw = fused_mlp.nerf_mlp_train(
      pe.reshape(b * s, c_pe).astype(bf16), rgb_row_bias, mlp_params,
      model.nerf_trunk_depth, tuple(model.nerf_skips), interpret)
  raw_sigma = alpha[:, 0].reshape(b, s)
  if alpha_condition is not None:
    alpha_k = mlp_params['alpha_logit']['kernel']
    raw_sigma = raw_sigma + (
        alpha_condition.astype(bf16)
        @ alpha_k[width:].astype(bf16)).astype(jnp.float32)
  rgb = nn.sigmoid(rgb_raw[:, :3].reshape(b, s, 3))
  if model.rgb_padding:
    rgb = rgb * (1.0 + 2.0 * model.rgb_padding) - model.rgb_padding
  # noise_std regularization lives OUTSIDE the kernel: raw sigma is
  # already a plain jnp array here, so the fused path adds the same
  # gaussian perturbation the flax model does (models/nerf.py:246-249)
  # with no kernel change.
  raw_sigma = rendering.noise_regularize(
      noise_key, raw_sigma, model.noise_std,
      model.use_stratified_sampling)
  sigma = model.sigma_activation(raw_sigma)
  return rendering.volumetric_rendering(
      rgb, sigma, z_vals, directions,
      use_white_background=model.use_white_background,
      sample_at_infinity=model.use_sample_at_infinity,
      return_weights=return_weights)


def model_forward(model,
                  params: Dict[str, Any],
                  batch: Dict[str, Any],
                  warp_extra: Dict[str, Any],
                  coarse_key,
                  fine_key,
                  return_points: bool = False,
                  return_weights: bool = False,
                  interpret: bool = False) -> Dict[str, Any]:
  """Train-time forward matching `model.apply`'s output contract.

  Mirrors NerfModel.__call__ (models/nerf.py:260-339): coarse level
  always returns weights (the PDF resampler consumes them) and computes
  warp Jacobians when `model.use_warp_jacobian`; the fine level follows
  `return_weights`.
  """
  origins = batch['origins']
  directions = batch['directions']
  metadata = batch['metadata']
  viewdirs = batch.get('viewdirs', directions)

  rgb_condition, alpha_condition = fast_render._conditions(
      params, model, viewdirs, metadata)
  warp_metadata = (
      metadata['time'] if model.warp_metadata_encoder_type == 'time'
      else metadata['warp'])

  def level_outputs(level, points, z_vals, use_warp_jacobian,
                    want_weights, sample_key=None):
    # Density-noise key: the flax model draws a distinct `make_rng(level)`
    # stream; here the level's sampling key is folded — statistically
    # identical, not bit-equal (same note as the stratified jitter above).
    noise_key = (jax.random.fold_in(sample_key, 0x5e11)
                 if sample_key is not None else None)
    out = {}
    if return_points:
      out['points'] = points
    if model.use_warp:
      if model.use_fused_warp:
        # Coarse sample points are raw ray ladder positions with no
        # parameter dependence, so the warp kernel skips their input
        # cotangents; fine points flow from the coarse weights' PDF.
        warp_out = _apply_warp_kernel(
            model, params, points, warp_metadata, warp_extra,
            return_jacobian=use_warp_jacobian,
            points_depend_on_params=(level != 'coarse'),
            interpret=interpret)
      else:
        warp_out = model.apply({'params': params}, points, warp_metadata,
                               warp_extra, use_warp_jacobian, False,
                               method=model.apply_warp)
      mlp_points = warp_out['warped_points']
      if 'jacobian' in warp_out:
        out['warp_jacobian'] = warp_out['jacobian']
      if return_points:
        out['warped_points'] = warp_out['warped_points']
    else:
      mlp_points = points
    out.update(_mlp_level(params, model, level, mlp_points, z_vals,
                          directions, rgb_condition, alpha_condition,
                          want_weights, interpret, noise_key=noise_key))
    return out

  z_vals, points = rendering.sample_along_rays(
      coarse_key if model.use_stratified_sampling else None,
      origins, directions, model.num_coarse_samples, model.near,
      model.far, model.use_stratified_sampling,
      model.use_linear_disparity)
  out = {'coarse': level_outputs(
      'coarse', points, z_vals,
      use_warp_jacobian=model.use_warp_jacobian, want_weights=True,
      sample_key=coarse_key)}

  return_weights_out = model.use_weights or return_weights
  if model.num_fine_samples > 0:
    z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_vals, points = rendering.sample_pdf(
        fine_key if model.use_stratified_sampling else None,
        z_vals_mid, out['coarse']['weights'][..., 1:-1],
        origins, directions, z_vals, model.num_fine_samples,
        model.use_stratified_sampling)
    out['fine'] = level_outputs(
        'fine', points, z_vals, use_warp_jacobian=False,
        want_weights=return_weights_out, sample_key=fine_key)
  if not return_weights_out:
    del out['coarse']['weights']
  return out
