"""The fast serving renderer: lean forward over the param pytree.

A pure-function render path for trained models: sampling, warp,
encodings and compositing as plain jnp ops, with the two MLP stacks
executed either by XLA dot chains (`mlp='xla'`, the default — XLA's
per-layer pipeline measured faster at render on v5e: 157.8k vs 132.4k
rays/s at the 32+64 preset) or by the fused Pallas kernels
(`mlp='pallas'`, ops/fused_mlp.py — whose VMEM-resident custom VJP is
the TRAINING default, where its remat-equivalent memory wins).

Beyond the lean dispatch, this path owns the serving-only accelerations:
reduced-sample presets (EvalConfig.num_{coarse,fine}_samples) and
occupancy-grid empty-space skipping (occupancy.py, `keep_samples`).

This is deliberately NOT a flax module: serving reads straight from the
checkpoint's param pytree (the same tree `model.apply` uses — proven
equivalent by tests/test_fast_render.py), so there is no module
re-instantiation, no rng plumbing, and nothing the compiler has to
de-virtualize. Deterministic rendering only (no stratified jitter, no
density noise) — exactly the eval configuration
(/root/reference/eval.py:330-353 renders the same way).

`supported(model)` reports whether a model's architecture is covered by
the fused path (standard NerfMLP shape, GLO or no warp metadata, no
trunk condition); `evaluation.make_render_fn` falls back to `model.apply`
otherwise.
"""

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from nerfies_tpu import occupancy as occupancy_lib
from nerfies_tpu.ops import encoding
from nerfies_tpu.ops import fused_mlp
from nerfies_tpu.ops import rendering
from nerfies_tpu.ops import rigid


def supported(model) -> bool:
  """Whether the fused render path covers this model architecture."""
  if model.use_trunk_condition:
    return False
  if model.metadata_encoded:
    return False
  if model.use_warp and model.warp_metadata_encoder_type != 'glo':
    return False
  if model.use_warp and model.warp_field_type not in ('se3', 'translation'):
    return False
  if model.use_warp:
    kwargs = dict(model.warp_kwargs)
    if kwargs.get('use_pivot') or kwargs.get('use_translation'):
      return False
  return True


def _glo_lookup(encoder_params, ids: jnp.ndarray) -> jnp.ndarray:
  """(B, 1) uint ids -> (B, F) codes, straight from the embedding table."""
  table = encoder_params['embed']['embedding']
  return table[ids[:, 0]]


def _repeat_rows(per_ray: jnp.ndarray, s: int) -> jnp.ndarray:
  """(B, C) per-ray -> (B*S, C) per-row, matching reshape(B*S, ...)."""
  return jnp.repeat(per_ray, s, axis=0)


def _apply_warp_fused(params, model, points, warp_ids, warp_extra,
                      interpret, mlp='xla'):
  """SE(3)/translation warp of (B, S, 3) points via the fused trunk."""
  warp_params = params['warp_field']
  b, s = points.shape[:2]
  kwargs = dict(model.warp_kwargs)
  num_freqs = model.num_warp_freqs
  skips = tuple(kwargs.get('skips', (4,)))
  # SE3Field names its depth 'trunk_depth'; TranslationField uses 'depth'.
  if model.warp_field_type == 'translation':
    trunk_depth = int(kwargs.get('depth', 6))
  else:
    trunk_depth = int(kwargs.get('trunk_depth', 6))

  pe = encoding.posenc(points, num_freqs=num_freqs,
                       alpha=warp_extra.get('alpha'))
  c_pe = pe.shape[-1]
  embed = _glo_lookup(warp_params['metadata_encoder'], warp_ids)
  embed = _repeat_rows(embed, s).astype(jnp.bfloat16)  # (N, F)

  if model.warp_field_type == 'translation':
    mlp_tree = warp_params['mlp']
    trunk = {k: v for k, v in mlp_tree.items() if k.startswith('hidden')}
    head = mlp_tree['logit']
  else:
    trunk = warp_params['trunk']
    # SE(3): fused or separate w/v heads both map to one (width, 6) head.
    if 'branches_wv' in warp_params:
      head = warp_params['branches_wv']['logit']
    else:
      w_l, v_l = (warp_params['branches_w']['logit'],
                  warp_params['branches_v']['logit'])
      head = {
          'kernel': jnp.concatenate([w_l['kernel'], v_l['kernel']], -1),
          'bias': jnp.concatenate([w_l['bias'], v_l['bias']], -1)}

  # Metadata-embedding contributions enter as per-row biases at layer 0
  # and each skip layer (the SplitDense row blocks beyond the PE rows).
  width = trunk['hidden_0']['kernel'].shape[1]
  row_biases = [(0, embed @ trunk['hidden_0']['kernel'][c_pe:].astype(
      jnp.bfloat16))]
  for i in skips:
    if i < trunk_depth:
      k = trunk[f'hidden_{i}']['kernel']
      row_biases.append(
          (i, embed @ k[width + c_pe:].astype(jnp.bfloat16)))

  head_params = {'trunk': trunk, 'head': {'logit': head}}
  if mlp == 'pallas':
    out = fused_mlp.warp_trunk_forward(
        pe.reshape(b * s, c_pe), row_biases, head_params,
        trunk_depth=trunk_depth, skips=skips, head_key='head',
        interpret=interpret)
  else:
    out = fused_mlp.warp_trunk_reference(
        pe.reshape(b * s, c_pe), row_biases, head_params,
        trunk_depth=trunk_depth, skips=skips, head_key='head')
  if model.warp_field_type == 'translation':
    return points + out[:, :3].reshape(b, s, 3).astype(points.dtype)
  w = out[:, :3].reshape(b, s, 3)
  v = out[:, 3:6].reshape(b, s, 3)
  return rigid.se3_apply_raw(w, v, points.astype(jnp.float32))


def _conditions(params, model, viewdirs, metadata):
  """Per-ray rgb condition (B, C) and alpha condition (B, C_a) or None.

  Mirrors NerfModel.get_condition_inputs (models/nerf.py:165-197).
  """
  rgb_conditions = []
  alpha_condition = None
  if model.use_viewdirs:
    rgb_conditions.append(encoding.posenc(
        viewdirs, num_freqs=model.num_nerf_viewdir_freqs))
  if model.use_appearance_metadata:
    code = _glo_lookup(params['appearance_encoder'],
                       metadata['appearance'])
    if model.use_alpha_condition:
      alpha_condition = code
    if model.use_rgb_condition:
      rgb_conditions.append(code)
  if model.use_camera_metadata:
    rgb_conditions.append(_glo_lookup(params['camera_encoder'],
                                      metadata['camera']))
  rgb_condition = (jnp.concatenate(rgb_conditions, axis=-1)
                   if rgb_conditions else None)
  return rgb_condition, alpha_condition


def _render_level(params, model, level, points, z_vals, directions,
                  viewdirs, metadata, warp_extra, use_warp, interpret,
                  occupancy=None, keep=None, mlp='xla'):
  if use_warp:
    warp_ids = metadata['warp']
    points = _apply_warp_fused(params, model, points, warp_ids,
                               warp_extra, interpret, mlp=mlp)

  culled = occupancy is not None and keep is not None
  dists = None
  if culled:
    # Empty-space skipping: of the S depth-ordered candidates, only the
    # first `keep` whose (canonical, post-warp) position falls in an
    # occupied voxel reach the MLP — a static-shape top-K (occupancy.py).
    # Kept samples composite with their ORIGINAL ladder spacing.
    occ = occupancy.query(points)
    idx = occupancy_lib.select_occupied(occ, z_vals, keep)
    z_vals, points, dists = occupancy_lib.gather_samples(
        z_vals, points, idx,
        rendering.ladder_dists(z_vals, model.use_sample_at_infinity))

  b, s = points.shape[:2]
  pe = encoding.posenc(points, num_freqs=model.num_nerf_point_freqs)
  c_pe = pe.shape[-1]
  rgb_condition, alpha_condition = _conditions(params, model, viewdirs,
                                               metadata)

  mlp_params = params[f'nerf_mlps_{level}']
  width = mlp_params['trunk_hidden_0']['kernel'].shape[1]
  rgb_row_bias = None
  if rgb_condition is not None:
    rgb_k = mlp_params['rgb_hidden_0']['kernel']
    rgb_row_bias = _repeat_rows(
        rgb_condition.astype(jnp.bfloat16), s) @ rgb_k[width:].astype(
            jnp.bfloat16)
  if mlp == 'pallas':
    alpha, rgb_raw = fused_mlp.nerf_mlp_forward(
        pe.reshape(b * s, c_pe), rgb_row_bias, mlp_params,
        trunk_depth=model.nerf_trunk_depth,
        skips=tuple(model.nerf_skips), interpret=interpret)
  else:
    alpha, rgb_raw = fused_mlp.nerf_mlp_reference(
        pe.reshape(b * s, c_pe), rgb_row_bias, mlp_params,
        trunk_depth=model.nerf_trunk_depth,
        skips=tuple(model.nerf_skips))
  raw_sigma = alpha[:, 0].reshape(b, s)
  if alpha_condition is not None:
    alpha_k = mlp_params['alpha_logit']['kernel']
    raw_sigma = raw_sigma + (
        alpha_condition.astype(jnp.bfloat16)
        @ alpha_k[width:].astype(jnp.bfloat16)).astype(jnp.float32)
  rgb = nn.sigmoid(rgb_raw[:, :3].reshape(b, s, 3))
  if model.rgb_padding:
    rgb = rgb * (1.0 + 2.0 * model.rgb_padding) - model.rgb_padding
  sigma = model.sigma_activation(raw_sigma)
  out = rendering.volumetric_rendering(
      rgb, sigma, z_vals, directions,
      use_white_background=model.use_white_background,
      sample_at_infinity=model.use_sample_at_infinity,
      return_weights=True, dists=dists)
  if culled:
    # The kept depth ladder, for the fine level's PDF resampling.
    out['kept_z_vals'] = z_vals
  return out


def render_rays(params: Dict[str, Any],
                rays_dict: Dict[str, Any],
                warp_extra: Dict[str, Any],
                model,
                use_warp: bool = True,
                return_weights: bool = False,
                interpret: bool = False,
                occupancy=None,
                keep_samples: Optional[Tuple[int, int]] = None,
                mlp: str = 'xla') -> Dict[str, Any]:
  """Deterministic coarse(+fine) render of a flat ray batch.

  Drop-in output contract of `model.apply` at render settings
  (deterministic sampling, no noise): {'coarse': {...}, 'fine'?: {...}}
  with rgb/depth/med_depth/acc (+weights if requested) per level.

  With `occupancy` (an occupancy.OccupancyGrid baked from this model's
  density) and `keep_samples=(k_coarse, k_fine)`, each level evaluates
  the MLP on only the first k occupied candidates per ray — empty-space
  skipping with static shapes (see occupancy.py). Exact up to the grid's
  build threshold; pass None for either k to leave that level unculled.
  """
  use_warp = use_warp and model.use_warp
  origins = rays_dict['origins']
  directions = rays_dict['directions']
  metadata = rays_dict['metadata']
  viewdirs = rays_dict.get('viewdirs', directions)

  keep_coarse, keep_fine = keep_samples or (None, None)
  z_vals, points = rendering.sample_along_rays(
      None, origins, directions, model.num_coarse_samples,
      model.near, model.far, False, model.use_linear_disparity)
  out = {'coarse': _render_level(
      params, model, 'coarse', points, z_vals, directions, viewdirs,
      metadata, warp_extra, use_warp, interpret,
      occupancy=occupancy, keep=keep_coarse, mlp=mlp)}

  # With coarse culling, z_vals/weights below are already the kept
  # subset — the PDF then concentrates fine samples inside it.
  z_vals = out['coarse'].pop('kept_z_vals', z_vals)
  if model.num_fine_samples > 0:
    z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_vals, points = rendering.sample_pdf(
        None, z_vals_mid, out['coarse']['weights'][..., 1:-1],
        origins, directions, z_vals, model.num_fine_samples, False)
    out['fine'] = _render_level(
        params, model, 'fine', points, z_vals, directions, viewdirs,
        metadata, warp_extra, use_warp, interpret,
        occupancy=occupancy, keep=keep_fine, mlp=mlp)
    out['fine'].pop('kept_z_vals', None)
  if not return_weights:
    for level in out:
      out[level].pop('weights', None)
  return out
