"""Host-side utilities: telemetry meters, interpolation, batching helpers.

Capability parity with the non-differentiable half of
/root/reference/nerfies/utils.py:113-465 (the differentiable half lives in
`nerfies_tpu.ops.mathutils`). The `shard`/`unshard` helpers are kept for
API parity but note the jit+mesh path does not need a leading device axis.
"""

import collections
import contextlib
import time
from concurrent import futures
from typing import List, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy import interpolate
from scipy.spatial import transform as scipy_transform

# Re-exported differentiable helpers (historical single-module API).
from nerfies_tpu.ops.mathutils import (  # noqa: F401  pylint: disable=unused-import
    affine_sigmoid, affine_softplus, compute_psnr, exp_safe, expm1_safe,
    general_loss_with_squared_residual, inv_affine_sigmoid,
    inv_affine_softplus, inv_softplus, jacobian_to_curl, jacobian_to_div,
    log1p_safe, logit, safe_norm, safe_sqrt)


def robust_whiten(x):
  median = jnp.nanmedian(x)
  mad = jnp.nanmean(jnp.abs(x - median))
  return (x - median) / mad


def learning_rate_decay(step, init_lr=5e-4, decay_steps=100000,
                        decay_rate=0.1):
  """lr = init_lr * decay_rate**(step / decay_steps)."""
  power = step / decay_steps
  return init_lr * (decay_rate ** power)


def interpolate_codes(codes: Union[np.ndarray, List[np.ndarray]],
                      num_samples: int, method: str = 'spline') -> np.ndarray:
  """Interpolates latent codes along the exemplar axis."""
  if isinstance(codes, list):
    codes = np.array(codes)
  t = np.arange(len(codes))
  xs = np.linspace(0, len(codes) - 1, num_samples)
  if method == 'spline':
    cs = interpolate.CubicSpline(t, codes, bc_type='natural')
    return cs(xs).astype(np.float32)
  if method == 'linear':
    interp = interpolate.interp1d(t, codes, axis=0)
    return interp(xs).astype(np.float32)
  raise ValueError(f'Unknown method {method!r}')


def interpolate_cameras(cameras, num_samples: int):
  """Slerp orientations + cubic-spline positions along a camera path."""
  rotations = [camera.orientation for camera in cameras]
  positions = [camera.position for camera in cameras]

  in_times = np.linspace(0, 1, len(rotations))
  slerp = scipy_transform.Slerp(
      in_times, scipy_transform.Rotation.from_matrix(rotations))
  spline = interpolate.CubicSpline(in_times, positions)

  out_times = np.linspace(0, 1, num_samples)
  out_rots = slerp(out_times).as_matrix()
  out_positions = spline(out_times)

  ref_camera = cameras[0]
  out_cameras = []
  for out_rot, out_pos in zip(out_rots, out_positions):
    out_camera = ref_camera.copy()
    out_camera.orientation = out_rot
    out_camera.position = out_pos
    out_cameras.append(out_camera)
  return out_cameras


def normalize(x):
  return x / np.linalg.norm(x)


def to_device(xs):
  return jax.tree.map(jnp.asarray, xs)


def broadcast_feature_to(array, shape):
  """Broadcasts batch dims, keeping the array's own channel count.

  Parity: reference model_utils.py:285-299 -- match everything except the
  trailing channel dim.
  """
  return jnp.broadcast_to(array, (*shape[:-1], array.shape[-1]))


def metadata_like(rays, metadata_id):
  """A uint32 metadata column shaped like a ray batch.

  Parity: reference model_utils.py:302-304.
  """
  return jnp.full_like(rays[..., :1], fill_value=metadata_id,
                       dtype=jnp.uint32)


def parallel_map(f, iterable, max_threads=None, show_pbar=False, **kwargs):
  """Thread-pool version of map()."""
  with futures.ThreadPoolExecutor(max_threads) as executor:
    results = executor.map(f, iterable, **kwargs)
    if show_pbar:
      try:
        import tqdm
        results = tqdm.tqdm(results, total=len(iterable))
      except ImportError:
        pass
    return list(results)


def strided_subset(sequence, count):
  """Every k-th element so that ~count remain.

  count=None keeps everything (reference eval.py semantics); count=0
  selects nothing.
  """
  if count is None:
    return sequence
  if count == 0:
    return type(sequence)()
  stride = max(1, len(sequence) // count)
  return sequence[::stride]


def tree_collate(list_of_pytrees):
  """Stacks a list of identical pytrees leaf-wise."""
  return jax.tree.map(lambda *x: np.stack(x), *list_of_pytrees)


@contextlib.contextmanager
def print_time(name):
  start = time.time()
  yield
  print(f'[{name}] time elapsed: {time.time() - start:.04f}')


class ValueMeter:
  """Tracks running statistics of a scalar stream."""

  def __init__(self):
    self._values = []

  def reset(self):
    self._values.clear()

  def update(self, value):
    self._values.append(value)

  def reduce(self, reduction='mean'):
    if reduction == 'mean':
      return np.mean(self._values)
    if reduction == 'std':
      return np.std(self._values)
    if reduction == 'last':
      return self._values[-1]
    raise ValueError(f'Unknown reduction {reduction}')


class TimeTracker:
  """tic/toc wall-clock buckets with steps/sec summaries."""

  def __init__(self):
    self._meters = collections.defaultdict(ValueMeter)
    self._marked_time = collections.defaultdict(float)

  @contextlib.contextmanager
  def record_time(self, key: str):
    start = time.time()
    yield
    self.update(key, time.time() - start)

  def update(self, key, value):
    self._meters[key].update(value)

  def tic(self, *args):
    for key in args:
      self._marked_time[key] = time.time()

  def toc(self, *args):
    for key in args:
      self.update(key, time.time() - self._marked_time[key])
      del self._marked_time[key]

  def reset(self):
    for meter in self._meters.values():
      meter.reset()

  def summary(self, reduction='mean'):
    time_dict = {k: v.reduce(reduction) for k, v in self._meters.items()}
    if 'total' not in time_dict:
      time_dict['total'] = sum(time_dict.values())
    time_dict['steps_per_sec'] = 1.0 / max(time_dict['total'], 1e-12)
    return time_dict

  def summary_str(self, reduction='mean'):
    return ', '.join(
        f'{k}={v:.04f}' for k, v in self.summary(reduction).items())
