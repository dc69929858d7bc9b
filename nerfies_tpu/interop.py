"""Reference-checkpoint interop: map upstream nerfies params to nerfies_tpu.

The rebuild keeps every kernel's shape and row order identical to the
reference (SplitDense over [per_sample, per_ray] inputs has the same
(sum C_i, W) kernel as the reference's tile+concat+Dense; skip layers
order rows [hidden, inputs] in both, reference modules.py:38-62), so a
trained upstream checkpoint maps into this framework by pure tree
renaming plus one concat (the fused SE(3) w/v head). This module is that
mapping; `tests/test_golden_model.py` proves the mapped forward pass
reproduces the reference bit-for-bit-level outputs.

Reference param tree (reference models.py:143-183 `setup`):
  nerf_mlps_{coarse,fine}/MLP_0  -> trunk ('hidden_i')
  nerf_mlps_{coarse,fine}/MLP_1  -> rgb branch ('hidden_i' + 'logit')
  nerf_mlps_{coarse,fine}/MLP_2  -> alpha branch ('hidden_i' + 'logit')
  nerf_mlps_{coarse,fine}/bottleneck
  warp_field/{trunk,branches_w,branches_v[,branches_p,branches_t],
              metadata_encoder}
  {appearance,camera}_encoder/embed/embedding
"""

from typing import Any, Dict

import numpy as np


def _as_dict(tree) -> Dict[str, Any]:
  return {k: dict(v) if not isinstance(v, np.ndarray) else v
          for k, v in dict(tree).items()}


def map_nerf_mlp(ref_mlp: Dict[str, Any]) -> Dict[str, Any]:
  """Reference NerfMLP params (MLP_0/1/2 + bottleneck) -> nerfies_tpu names."""
  out = {}
  for name, ours in (('MLP_0', 'trunk'), ('MLP_1', 'rgb'), ('MLP_2', 'alpha')):
    sub = dict(ref_mlp[name])
    for layer, arrs in sub.items():
      if layer == 'logit':
        out[f'{ours}_logit'] = arrs
      else:  # hidden_i
        out[f'{ours}_{layer}'] = arrs
  if 'bottleneck' in ref_mlp:
    out['bottleneck'] = ref_mlp['bottleneck']
  return out


def map_warp_field(ref_warp: Dict[str, Any],
                   fuse_branch_heads: bool = True) -> Dict[str, Any]:
  """Reference warp-field params -> nerfies_tpu warp-field params."""
  out = {}
  for key, value in dict(ref_warp).items():
    if key in ('branches_w', 'branches_v') and fuse_branch_heads:
      continue
    out[key] = value
  if fuse_branch_heads and 'branches_w' in ref_warp:
    w, v = dict(ref_warp['branches_w']), dict(ref_warp['branches_v'])
    if set(w) == {'logit'}:  # depth-0 heads fuse into one (width, 6) matmul
      out['branches_wv'] = {'logit': {
          'kernel': np.concatenate(
              [np.asarray(w['logit']['kernel']),
               np.asarray(v['logit']['kernel'])], axis=-1),
          'bias': np.concatenate(
              [np.asarray(w['logit']['bias']),
               np.asarray(v['logit']['bias'])], axis=-1),
      }}
    else:  # deep branches are kept separate in both implementations
      out['branches_w'] = w
      out['branches_v'] = v
  return out


def map_reference_params(ref_params: Dict[str, Any],
                         fuse_branch_heads: bool = True) -> Dict[str, Any]:
  """Maps a reference `params` collection to the nerfies_tpu layout.

  Args:
    ref_params: the 'params' tree of the upstream model
      (reference models.py:378-489 `construct_nerf`).
    fuse_branch_heads: whether the target SE3Field fuses the depth-0
      w/v heads (`SE3Field.fuse_branch_heads`, the default).

  Returns:
    A params tree loadable into `nerfies_tpu.models.nerf.NerfModel`.
  """
  out = {}
  for key, value in dict(ref_params).items():
    if key.startswith('nerf_mlps_'):
      out[key] = map_nerf_mlp(dict(value))
    elif key == 'warp_field':
      out[key] = map_warp_field(dict(value), fuse_branch_heads)
    else:  # embedding encoders: identical structure
      out[key] = value
  return out
