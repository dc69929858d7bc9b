"""Occupancy-grid empty-space skipping: grid bake/query, static top-K
selection, compositing exactness over the kept subset, and the culled
fast_render path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import fast_render
from nerfies_tpu import occupancy
from nerfies_tpu.ops import rendering


def _sphere_sigma(center=(0.0, 0.0, 1.5), radius=0.4, height=25.0):
  center = jnp.asarray(center)

  def sigma_fn(points):
    d = jnp.linalg.norm(points - center, axis=-1)
    return jnp.where(d < radius, height, 0.0)

  return sigma_fn


def test_build_and_query_sphere():
  grid = occupancy.build_grid(
      _sphere_sigma(), bbox_min=(-1, -1, 0), bbox_max=(1, 1, 3),
      resolution=32, sigma_threshold=1.0, dilate=False)
  assert bool(grid.query(jnp.array([0.0, 0.0, 1.5])))
  assert not bool(grid.query(jnp.array([0.9, 0.9, 0.1])))
  # Clamping: far outside the box falls back to the boundary voxel.
  assert not bool(grid.query(jnp.array([10.0, 10.0, 10.0])))
  # Batched query matches pointwise.
  pts = jnp.array([[0.0, 0.0, 1.5], [0.9, 0.9, 0.1]])
  np.testing.assert_array_equal(np.asarray(grid.query(pts)),
                                [True, False])


def test_dilation_is_conservative():
  # A surface just inside a voxel face must keep its neighbor voxels.
  def point_sigma(points):
    d = jnp.linalg.norm(points - jnp.asarray([0.5, 0.5, 0.5]), axis=-1)
    # Radius just over half a voxel diagonal so at least one (but not
    # every) voxel center falls inside at resolution 8.
    return jnp.where(d < 0.12, 100.0, 0.0)

  kwargs = dict(bbox_min=(0, 0, 0), bbox_max=(1, 1, 1), resolution=8,
                sigma_threshold=1.0)
  raw = occupancy.build_grid(point_sigma, dilate=False, **kwargs)
  dil = occupancy.build_grid(point_sigma, dilate=True, **kwargs)
  n_raw = int(np.asarray(raw.occupied).sum())
  n_dil = int(np.asarray(dil.occupied).sum())
  assert n_raw >= 1
  assert n_dil > n_raw
  # Dilated grid is a superset.
  assert bool(np.all(~np.asarray(raw.occupied) | np.asarray(dil.occupied)))


def test_select_occupied_first_k_in_depth_order():
  occ = jnp.array([[0, 1, 0, 1, 1, 0, 1, 0],
                   [1, 1, 1, 1, 1, 1, 1, 1],
                   [0, 0, 0, 0, 0, 0, 0, 0]], bool)
  z = jnp.broadcast_to(jnp.arange(8.0), occ.shape)
  idx = occupancy.select_occupied(occ, z, 3, keep_last=False)
  assert idx.shape == (3, 3)
  np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 4])
  np.testing.assert_array_equal(np.asarray(idx[1]), [0, 1, 2])
  # An all-empty ray pads with (empty) leading candidates, ascending.
  assert np.all(np.diff(np.asarray(idx[2])) > 0)

  # Default: the final (background shell) sample is always kept.
  idx = occupancy.select_occupied(occ, z, 3)
  np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 7])
  np.testing.assert_array_equal(np.asarray(idx[1]), [0, 1, 7])
  assert int(idx[2, -1]) == 7

  # k >= S keeps everything.
  idx_all = occupancy.select_occupied(occ, z, 8)
  np.testing.assert_array_equal(np.asarray(idx_all),
                                np.broadcast_to(np.arange(8), (3, 8)))


def test_gather_compositing_exact_when_dropped_sigma_zero():
  """Compositing over the kept subset == full compositing when every
  dropped sample has zero density."""
  rng = np.random.RandomState(0)
  b, s, k = 4, 16, 6
  z_vals = jnp.asarray(np.sort(rng.uniform(0.5, 3.0, (b, s)), axis=-1))
  occ = np.zeros((b, s), bool)
  for i in range(b):
    occ[i, rng.choice(s, size=4, replace=False)] = True
  sigma = jnp.asarray(occ * rng.uniform(5, 30, (b, s)))
  rgb = jnp.asarray(rng.uniform(size=(b, s, 3)).astype(np.float32))
  directions = jnp.asarray(rng.randn(b, 3).astype(np.float32))

  full = rendering.volumetric_rendering(
      rgb, sigma, z_vals, directions, use_white_background=False,
      sample_at_infinity=False, return_weights=False)

  idx = occupancy.select_occupied(jnp.asarray(occ), z_vals, k)
  z_k, rgb_k, d_k = occupancy.gather_samples(
      z_vals, rgb, idx, rendering.ladder_dists(z_vals, False))
  sigma_k = jnp.take_along_axis(sigma, idx, axis=-1)
  culled = rendering.volumetric_rendering(
      rgb_k, sigma_k, z_k, directions, use_white_background=False,
      sample_at_infinity=False, return_weights=False, dists=d_k)

  np.testing.assert_allclose(np.asarray(culled['rgb']),
                             np.asarray(full['rgb']), atol=1e-5)
  np.testing.assert_allclose(np.asarray(culled['acc']),
                             np.asarray(full['acc']), atol=1e-5)
  np.testing.assert_allclose(np.asarray(culled['depth']),
                             np.asarray(full['depth']), atol=1e-4)


# Reuse the fast_render test fixtures for the end-to-end culled path.
from tests.test_fast_render import _build, _rays, _WARP_EXTRA  # noqa: E402


def test_culled_render_matches_full_when_grid_all_occupied():
  """Plumbing: an all-occupied grid with k == S is a no-op cull."""
  model, params = _build(warp_field_type='se3')
  rays = _rays()
  grid = occupancy.OccupancyGrid(
      occupied=jnp.ones((8, 8, 8), bool),
      bbox_min=jnp.array([-5.0, -5.0, -5.0]),
      bbox_max=jnp.array([5.0, 5.0, 5.0]))
  want = fast_render.render_rays(params, rays, _WARP_EXTRA, model,
                                 interpret=True)
  got = fast_render.render_rays(
      params, rays, _WARP_EXTRA, model, interpret=True,
      occupancy=grid,
      keep_samples=(model.num_coarse_samples,
                    model.num_coarse_samples + model.num_fine_samples))
  for level in want:
    for key in ('rgb', 'depth', 'acc'):
      np.testing.assert_allclose(
          np.asarray(got[level][key]), np.asarray(want[level][key]),
          atol=1e-5, rtol=1e-5, err_msg=f'{level}/{key}')


def test_culled_render_close_with_model_grid():
  """Bake the grid from the model's own density; cull to half the
  samples; rgb must stay close (dropped samples are sub-threshold)."""
  model, params = _build(warp_field_type='se3')
  rays = _rays(seed=7)
  sigma_fn = occupancy.sigma_fn_from_params(params, model, level='fine',
                                            interpret=True)
  grid = occupancy.build_grid(
      sigma_fn, bbox_min=(-4, -4, -4), bbox_max=(4, 4, 4), resolution=24,
      sigma_threshold=0.05, chunk=8192)
  want = fast_render.render_rays(params, rays, _WARP_EXTRA, model,
                                 interpret=True)
  got = fast_render.render_rays(
      params, rays, _WARP_EXTRA, model, interpret=True,
      occupancy=grid, keep_samples=(6, 10))
  # A random-init density is diffuse, so the sub-threshold leak sets the
  # tolerance; the structural claim is "no gross divergence".
  np.testing.assert_allclose(np.asarray(got['fine']['rgb']),
                             np.asarray(want['fine']['rgb']),
                             atol=0.15)
  assert np.isfinite(np.asarray(got['fine']['depth'])).all()
