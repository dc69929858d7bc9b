"""LPIPS perceptual distance in JAX.

The paper-parity metric set (BASELINE.md north star) reports PSNR + LPIPS;
the reference repo computes neither LPIPS nor ships weights for it. This
implements the LPIPS computation graph (Zhang et al. 2018) natively:

  1. an AlexNet-style conv feature extractor with ImageNet input
     normalization,
  2. per-layer unit-normalization of feature maps across channels,
  3. squared differences, non-negative 1x1 linear weighting,
  4. spatial mean and sum across the five taps.

Weights load from an .npz produced by `convert_torch_weights` (run it once
on a machine with the `lpips` pip package to export the official
calibrated tensors; this build environment has zero egress and no cached
torch weights, so the file cannot be produced here -- see docs/LPIPS.md).
Without a weights file the network falls back to a seeded random-feature
distance -- the LPIPS paper (sec. 5.4) shows randomly-initialized nets
already track perceptual similarity, and the fallback is clearly flagged
(`lpips_uncal`) so reported numbers are never silently miscalibrated. The
fallback's perceptual behavior is pinned on a 12-pair distortion ladder
in tests/test_lpips.py (monotone per family; Spearman 1.0 vs MS-SSIM
within family, 0.70 mixed).
"""

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics used by the official implementation's scaling layer
# (inputs in [-1, 1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stack:
# (out_channels, kernel, stride, max_pool_before, padding).
# Padding is the torch AlexNet's explicit per-layer value — NOT 'SAME':
# conv1 (k=11, s=4) pads 2 on each side where SAME would pad 3/4, which
# shifts the feature grid and changes output sizes; calibrated weights
# only reproduce official LPIPS numbers with the torch padding.
_ALEX_LAYERS = (
    (64, 11, 4, False, 2),
    (192, 5, 1, True, 2),
    (384, 3, 1, True, 1),
    (256, 3, 1, False, 1),
    (256, 3, 1, False, 1),
)


def init_random_params(seed: int = 0) -> Dict[str, np.ndarray]:
  """He-normal conv stack + uniform linear taps (uncalibrated fallback)."""
  rng = np.random.RandomState(seed)
  params = {}
  in_ch = 3
  for i, (out_ch, k, _, _, _) in enumerate(_ALEX_LAYERS):
    fan_in = in_ch * k * k
    params[f'conv{i}_w'] = rng.normal(
        0.0, np.sqrt(2.0 / fan_in), (k, k, in_ch, out_ch)).astype(
            np.float32)
    params[f'conv{i}_b'] = np.zeros((out_ch,), np.float32)
    params[f'lin{i}_w'] = np.full((out_ch,), 1.0 / out_ch, np.float32)
    in_ch = out_ch
  params['calibrated'] = np.zeros((), np.bool_)
  return params


def load_params(weights_path) -> Dict[str, np.ndarray]:
  """Loads calibrated weights exported by `convert_torch_weights`."""
  data = np.load(weights_path)
  params = {k: data[k] for k in data.files}
  for i in range(len(_ALEX_LAYERS)):
    for key in (f'conv{i}_w', f'conv{i}_b', f'lin{i}_w'):
      if key not in params:
        raise ValueError(f'LPIPS weights file missing {key!r}')
  params['calibrated'] = np.ones((), np.bool_)
  return params


def convert_torch_weights(out_path) -> None:
  """Exports the official calibrated LPIPS-alex tensors to .npz.

  Run offline on a machine with the `lpips` package; the conv kernels
  (torch OIHW) transpose to HWIO and the 1x1 linear taps flatten to
  per-channel vectors.
  """
  import lpips as lpips_torch  # optional; never imported at eval time
  import torch
  net = lpips_torch.LPIPS(net='alex')
  params = {}
  # The torch module exposes conv layers under net.net.sliceN; walk them
  # in order and collect Conv2d weights.
  conv_idx = 0
  for slice_name in ('slice1', 'slice2', 'slice3', 'slice4', 'slice5'):
    for module in getattr(net.net, slice_name):
      if isinstance(module, torch.nn.Conv2d):
        params[f'conv{conv_idx}_w'] = (
            module.weight.detach().numpy().transpose(2, 3, 1, 0))
        params[f'conv{conv_idx}_b'] = module.bias.detach().numpy()
        conv_idx += 1
  for i, lin in enumerate(net.lins):
    params[f'lin{i}_w'] = (
        lin.model[-1].weight.detach().numpy().reshape(-1))
  np.savez(out_path, **params)


def _extract_features(params, image: jnp.ndarray) -> Sequence[jnp.ndarray]:
  """The five relu feature taps for an NHWC image in [0, 1]."""
  x = 2.0 * image - 1.0
  x = (x - _SHIFT) / _SCALE
  feats = []
  for i, (_, _, stride, pool_before, pad) in enumerate(_ALEX_LAYERS):
    if pool_before:
      x = jax.lax.reduce_window(
          x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(params[f'conv{i}_w']),
        window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x = jax.nn.relu(x + jnp.asarray(params[f'conv{i}_b']))
    feats.append(x)
  return feats


def _normalize_channels(feat: jnp.ndarray, eps: float = 1e-10):
  norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
  return feat / jnp.maximum(norm, eps)


def lpips_distance(params, image1: jnp.ndarray,
                   image2: jnp.ndarray) -> jnp.ndarray:
  """LPIPS between (..., H, W, 3) images in [0, 1]; returns per-batch."""
  squeeze = image1.ndim == 3
  if squeeze:
    image1, image2 = image1[None], image2[None]
  total = 0.0
  feats1 = _extract_features(params, image1)
  feats2 = _extract_features(params, image2)
  for i, (f1, f2) in enumerate(zip(feats1, feats2)):
    diff = (_normalize_channels(f1) - _normalize_channels(f2)) ** 2
    weighted = diff * jnp.asarray(params[f'lin{i}_w'])
    total = total + jnp.sum(weighted, axis=-1).mean(axis=(1, 2))
  return total[0] if squeeze else total


class LPIPS:
  """Stateful wrapper: holds params and a jitted distance function."""

  def __init__(self, weights_path=None, seed: int = 0):
    if weights_path is not None:
      self.params = load_params(weights_path)
      self.calibrated = True
    else:
      self.params = init_random_params(seed)
      self.calibrated = False
    self._jitted = jax.jit(lpips_distance)

  def __call__(self, image1, image2) -> float:
    return float(self._jitted(self.params, jnp.asarray(image1),
                              jnp.asarray(image2)))
