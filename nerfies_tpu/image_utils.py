"""Host-side image utilities: IO, integer-factor rescaling, conversions.

Capability parity with /root/reference/nerfies/image_utils.py:33-189.
Fixed vs reference: `rescale_image` uses INTER_LINEAR for upsampling (the
reference routes non-integer and up-scales through INTER_AREA, which is a
downsampling filter -- image_utils.py:59-67).
"""

import math
from typing import Tuple, Union

import cv2
import numpy as np

UINT8_MAX = 255
UINT16_MAX = 65535


def make_divisible(image: np.ndarray, divisor: int) -> np.ndarray:
  """Center-crops spatial dims down to multiples of `divisor`."""
  if all(s % divisor == 0 for s in image.shape[:2]):
    return image
  height, width = image.shape[:2]
  new_height = height - height % divisor
  new_width = width - width % divisor
  offset_h = (height - new_height) // 2
  offset_w = (width - new_width) // 2
  return image[offset_h:offset_h + new_height, offset_w:offset_w + new_width]


def downsample_image(image: np.ndarray, scale: int) -> np.ndarray:
  """Anti-aliased integer-factor downsampling (area filter)."""
  if scale == 1:
    return image
  height, width = image.shape[:2]
  if height % scale > 0 or width % scale > 0:
    raise ValueError(f'Image shape ({height},{width}) must be divisible by '
                     f'the scale ({scale}).')
  out_height, out_width = height // scale, width // scale
  return cv2.resize(image, (out_width, out_height),
                    interpolation=cv2.INTER_AREA)


def upsample_image(image: np.ndarray, scale: int) -> np.ndarray:
  """Integer-factor upsampling (bilinear)."""
  if scale == 1:
    return image
  height, width = image.shape[:2]
  return cv2.resize(image, (width * scale, height * scale),
                    interpolation=cv2.INTER_LINEAR)


def reshape_image(image: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
  """Resizes to an exact (height, width)."""
  out_height, out_width = shape
  interpolation = (cv2.INTER_AREA
                   if out_height <= image.shape[0] else cv2.INTER_LINEAR)
  return cv2.resize(image, (out_width, out_height),
                    interpolation=interpolation)


def rescale_image(image: np.ndarray, scale_factor: float) -> np.ndarray:
  """Rescales by a factor, preferring exact integer paths."""
  # int.is_integer() only exists on Python >= 3.12; accept int factors.
  scale_factor = float(scale_factor)
  if scale_factor <= 0.0:
    raise ValueError('scale_factor must be a non-negative number.')
  if scale_factor == 1.0:
    return image
  height, width = image.shape[:2]
  if scale_factor.is_integer():
    return upsample_image(image, int(scale_factor))
  inv_scale = 1.0 / scale_factor
  if (inv_scale.is_integer() and (scale_factor * height).is_integer()
      and (scale_factor * width).is_integer()):
    return downsample_image(image, int(inv_scale))
  out_height = math.ceil(height * scale_factor)
  out_width = math.ceil(width * scale_factor)
  return reshape_image(image, (out_height, out_width))


def rescale_depth_image(depth: np.ndarray,
                        scale_factor: float) -> np.ndarray:
  """Rescales a depth map with nearest-neighbor sampling.

  Bilinear/area filters blend invalid (0) pixels with valid depths at
  silhouette boundaries, producing small nonzero depths that pass the
  `depth > 0` validity mask downstream and bias depth metrics; nearest
  keeps every output pixel an actual input depth.
  """
  scale_factor = float(scale_factor)
  if scale_factor <= 0.0:
    raise ValueError('scale_factor must be a non-negative number.')
  if scale_factor == 1.0:
    return depth
  height, width = depth.shape[:2]
  out_height = math.ceil(height * scale_factor)
  out_width = math.ceil(width * scale_factor)
  return cv2.resize(depth, (out_width, out_height),
                    interpolation=cv2.INTER_NEAREST)


def variance_of_laplacian(image: np.ndarray) -> float:
  """Blur metric: variance of the Laplacian response."""
  return cv2.Laplacian(image_to_uint8(image), cv2.CV_64F).var()


def image_to_uint8(image: np.ndarray) -> np.ndarray:
  if image.dtype == np.uint8:
    return image
  if not issubclass(image.dtype.type, np.floating):
    raise ValueError(f'Input image should be a floating type but is of type '
                     f'{image.dtype!r}')
  return (image * UINT8_MAX).clip(0.0, UINT8_MAX).astype(np.uint8)


def image_to_uint16(image: np.ndarray) -> np.ndarray:
  if image.dtype == np.uint16:
    return image
  if not issubclass(image.dtype.type, np.floating):
    raise ValueError(f'Input image should be a floating type but is of type '
                     f'{image.dtype!r}')
  return (image * UINT16_MAX).clip(0.0, UINT16_MAX).astype(np.uint16)


def image_to_float32(image: np.ndarray) -> np.ndarray:
  if image.dtype == np.float32:
    return image
  dtype = image.dtype
  if dtype == np.uint8:
    return image.astype(np.float32) / UINT8_MAX
  if dtype == np.uint16:
    return image.astype(np.float32) / UINT16_MAX
  if issubclass(dtype.type, np.floating):
    return image.astype(np.float32)
  raise ValueError(f'Not sure how to handle dtype {dtype}')


def load_image(path) -> np.ndarray:
  """Loads an image as uint8 RGB(A)."""
  with open(path, 'rb') as f:
    raw = np.frombuffer(f.read(), dtype=np.uint8)
  image = cv2.imdecode(raw, cv2.IMREAD_UNCHANGED)
  if image is None:
    raise IOError(f'Could not decode image: {path}')
  if image.ndim == 3 and image.shape[-1] >= 3:
    image[..., :3] = image[..., 2::-1]  # BGR -> RGB
  return image


def save_image(path, image: np.ndarray) -> None:
  """Saves uint8/uint16 RGB(A) to `path` (format from extension)."""
  if not image.flags['C_CONTIGUOUS']:
    image = np.ascontiguousarray(image)
  if image.ndim == 3 and image.shape[-1] >= 3:
    image = image.copy()
    image[..., :3] = image[..., 2::-1]  # RGB -> BGR
  ext = str(path).rsplit('.', 1)[-1]
  ok, buf = cv2.imencode(f'.{ext}', image)
  if not ok:
    raise IOError(f'Could not encode image for {path}')
  with open(path, 'wb') as f:
    f.write(buf.tobytes())


def save_depth(path, depth: np.ndarray) -> None:
  """Stores depth (meters) as uint16 millimeters, parity with reference."""
  save_image(path, image_to_uint16(depth / 1000.0))


def load_depth(path) -> np.ndarray:
  depth = load_image(path)
  if depth.dtype != np.uint16:
    raise ValueError('Depth image must be of type uint16.')
  return image_to_float32(depth) * 1000.0


def checkerboard(h: int, w: int, size: int = 8,
                 true_val: Union[float, np.ndarray] = 1.0,
                 false_val: Union[float, np.ndarray] = 0.0) -> np.ndarray:
  """A checkerboard pattern (used to composite alpha renders)."""
  ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
  mask = ((ii // size + jj // size) % 2).astype(bool)
  return np.where(mask[..., None], true_val, false_val)
