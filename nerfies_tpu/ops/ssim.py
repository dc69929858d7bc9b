"""SSIM and multi-scale SSIM in pure JAX.

The reference computes MS-SSIM with TensorFlow
(/root/reference/eval.py:58-62 calls tf.image.ssim_multiscale); this is a
jittable JAX implementation with matching semantics (11x11 gaussian window,
sigma 1.5, standard power weights, 2x average-pool between scales).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Power weights from Wang et al. (2003), as used by tf.image.ssim_multiscale.
MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecial_gauss(size: int, sigma: float) -> jnp.ndarray:
  """1-D gaussian window (separable filtering)."""
  coords = jnp.arange(size, dtype=jnp.float32) - (size - 1.0) / 2.0
  g = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
  return g / jnp.sum(g)


def _filter2d(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
  """Separable 'valid' convolution over (H, W, C) images."""
  # Filter rows then columns; vectorized over channels via feature grouping.
  size = window.shape[0]
  def conv1d(x, axis):
    kernel_shape = [1, 1, 1, 1]
    kernel_shape[axis] = size
    kernel = window.reshape(kernel_shape[:2] + [1, 1]
                            if axis == 0 else [1, size, 1, 1])
    x = x[None]  # NHWC
    # Precision.HIGHEST is load-bearing on TPU: at default precision the
    # conv inputs are cast to bf16 (~1e-3 absolute quantization on [0,1]
    # images), and the downstream E[x^2] - mu^2 variance cancellation on
    # smooth low-variance regions then yields NEGATIVE sigma estimates,
    # driving the (sigma00 + sigma11 + c2) denominator through zero —
    # measured SSIM values of 7.2/21.4 (mathematically <= 1) on real
    # renders of the env-background scene before the fix.
    out = jax.lax.conv_general_dilated(
        x, jnp.tile(kernel, (1, 1, 1, x.shape[-1])),
        window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST)
    return out[0]
  return conv1d(conv1d(img, 0), 1)


def ssim(img0: jnp.ndarray,
         img1: jnp.ndarray,
         max_val: float = 1.0,
         filter_size: int = 11,
         filter_sigma: float = 1.5,
         k1: float = 0.01,
         k2: float = 0.03,
         return_cs: bool = False):
  """SSIM between two (H, W, C) images.

  Returns the mean SSIM (and mean contrast-structure term if return_cs).
  """
  window = _fspecial_gauss(filter_size, filter_sigma)
  c1 = (k1 * max_val) ** 2
  c2 = (k2 * max_val) ** 2

  mu0 = _filter2d(img0, window)
  mu1 = _filter2d(img1, window)
  mu00 = mu0 * mu0
  mu11 = mu1 * mu1
  mu01 = mu0 * mu1
  sigma00 = _filter2d(img0 * img0, window) - mu00
  sigma11 = _filter2d(img1 * img1, window) - mu11
  sigma01 = _filter2d(img0 * img1, window) - mu01

  cs = (2.0 * sigma01 + c2) / (sigma00 + sigma11 + c2)
  luminance = (2.0 * mu01 + c1) / (mu00 + mu11 + c1)
  ssim_map = luminance * cs
  if return_cs:
    return jnp.mean(ssim_map), jnp.mean(cs)
  return jnp.mean(ssim_map)


def _avg_pool2(img: jnp.ndarray) -> jnp.ndarray:
  """2x2 average pooling with stride 2 (pads odd dims like tf)."""
  h, w, _ = img.shape
  img = jnp.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode='edge')
  x = img[None]
  out = jax.lax.reduce_window(
      x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID') / 4.0
  return out[0]


def max_feasible_scales(height: int, width: int,
                        filter_size: int = 11) -> int:
  """Largest number of MS-SSIM scales the image size supports.

  Each scale halves the image (ceil), and the 'valid' gaussian filtering
  needs at least `filter_size` pixels per side at the coarsest scale.
  """
  scales = 0
  side = min(height, width)
  while side >= filter_size and scales < len(MSSSIM_WEIGHTS):
    scales += 1
    side = (side + 1) // 2
  return scales


def multiscale_ssim(img0: jnp.ndarray,
                    img1: jnp.ndarray,
                    max_val: float = 1.0,
                    filter_size: int = 11,
                    filter_sigma: float = 1.5,
                    k1: float = 0.01,
                    k2: float = 0.03,
                    weights: Tuple[float, ...] = MSSSIM_WEIGHTS) -> jnp.ndarray:
  """Multi-scale SSIM between two (H, W, C) images in [0, max_val].

  Matches tf.image.ssim_multiscale semantics: the contrast-structure term
  at every scale but the last, full SSIM at the coarsest scale, combined by
  power weights. Images must be at least filter_size * 2**(len(weights)-1)
  on each side.
  """
  weights = jnp.asarray(weights)
  num_scales = weights.shape[0]
  values = []
  im0, im1 = img0, img1
  for scale in range(num_scales):
    if scale == num_scales - 1:
      mean_ssim = ssim(im0, im1, max_val, filter_size, filter_sigma, k1, k2)
      values.append(jnp.maximum(mean_ssim, 0.0))
    else:
      _, mean_cs = ssim(im0, im1, max_val, filter_size, filter_sigma, k1, k2,
                        return_cs=True)
      values.append(jnp.maximum(mean_cs, 0.0))
      im0, im1 = _avg_pool2(im0), _avg_pool2(im1)
  values = jnp.stack(values)
  return jnp.prod(values ** weights)
