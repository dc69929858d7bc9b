"""Rendering math: sampling, compositing, PDF resampling, encodings."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfies_tpu.ops import encoding
from nerfies_tpu.ops import rendering


def test_sample_along_rays_uniform():
  origins = jnp.zeros((4, 3))
  directions = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1))
  z, pts = rendering.sample_along_rays(
      None, origins, directions, num_samples=8, near=2.0, far=6.0,
      use_stratified_sampling=False, use_linear_disparity=False)
  np.testing.assert_allclose(np.asarray(z[0]), np.linspace(2, 6, 8), atol=1e-6)
  np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(z), atol=1e-6)
  np.testing.assert_allclose(np.asarray(pts[..., :2]), 0.0, atol=1e-6)


def test_sample_along_rays_stratified_within_bins():
  key = jax.random.PRNGKey(0)
  origins = jnp.zeros((64, 3))
  directions = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (64, 1))
  z, _ = rendering.sample_along_rays(
      key, origins, directions, num_samples=16, near=1.0, far=5.0,
      use_stratified_sampling=True, use_linear_disparity=False)
  z = np.asarray(z)
  assert (z >= 1.0 - 1e-5).all() and (z <= 5.0 + 1e-5).all()
  assert (np.diff(z, axis=-1) > -1e-5).all()  # sorted within each ray


def test_sample_linear_disparity():
  origins = jnp.zeros((1, 3))
  directions = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 1))
  z, _ = rendering.sample_along_rays(
      None, origins, directions, num_samples=3, near=1.0, far=100.0,
      use_stratified_sampling=False, use_linear_disparity=True)
  np.testing.assert_allclose(
      np.asarray(z[0]), 1.0 / np.linspace(1.0, 0.01, 3), rtol=1e-5)


def test_volumetric_rendering_opaque_wall():
  # A single fully opaque slab at z=2 should render that slab's color.
  B, S = 4, 32
  z_vals = jnp.tile(jnp.linspace(1.0, 3.0, S)[None], (B, 1))
  sigma = jnp.where((z_vals > 1.9) & (z_vals < 2.5), 1e5, 0.0)
  rgb = jnp.tile(jnp.asarray([1.0, 0.5, 0.25]), (B, S, 1))
  dirs = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1))
  out = rendering.volumetric_rendering(
      rgb, sigma, z_vals, dirs, use_white_background=False,
      sample_at_infinity=False)
  np.testing.assert_allclose(np.asarray(out['rgb']),
                             np.tile([1.0, 0.5, 0.25], (B, 1)), atol=1e-3)
  np.testing.assert_allclose(np.asarray(out['acc']), 1.0, atol=1e-3)
  assert (np.abs(np.asarray(out['med_depth']) - 2.0) < 0.2).all()


def test_volumetric_rendering_empty_space_white_background():
  B, S = 2, 16
  z_vals = jnp.tile(jnp.linspace(1.0, 3.0, S)[None], (B, 1))
  sigma = jnp.zeros((B, S))
  rgb = jnp.zeros((B, S, 3))
  dirs = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1))
  out = rendering.volumetric_rendering(
      rgb, sigma, z_vals, dirs, use_white_background=True,
      sample_at_infinity=False)
  np.testing.assert_allclose(np.asarray(out['rgb']), 1.0, atol=1e-4)
  np.testing.assert_allclose(np.asarray(out['acc']), 0.0, atol=1e-4)


def test_volumetric_rendering_weights_sum_and_direction_norm():
  # Doubling |direction| doubles effective distances.
  B, S = 3, 16
  z_vals = jnp.tile(jnp.linspace(1.0, 2.0, S)[None], (B, 1))
  sigma = jnp.full((B, S), 2.0)
  rgb = jnp.full((B, S, 3), 0.5)
  out1 = rendering.volumetric_rendering(
      rgb, sigma, z_vals, jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1)),
      use_white_background=False, sample_at_infinity=False,
      return_weights=True)
  out2 = rendering.volumetric_rendering(
      rgb, sigma, z_vals, jnp.tile(jnp.asarray([0.0, 0.0, 2.0]), (B, 1)),
      use_white_background=False, sample_at_infinity=False,
      return_weights=True)
  assert np.asarray(out2['acc']).mean() > np.asarray(out1['acc']).mean()
  w = np.asarray(out1['weights'])
  assert (w.sum(-1) <= 1.0 + 1e-4).all()


def test_sample_at_infinity_acc_excludes_last():
  B, S = 2, 8
  z_vals = jnp.tile(jnp.linspace(1.0, 2.0, S)[None], (B, 1))
  sigma = jnp.zeros((B, S)).at[:, -1].set(1.0)  # density only at infinity
  rgb = jnp.zeros((B, S, 3))
  dirs = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1))
  out = rendering.volumetric_rendering(
      rgb, sigma, z_vals, dirs, use_white_background=False,
      sample_at_infinity=True)
  # All weight lands on the infinity sample, which `acc` must exclude.
  np.testing.assert_allclose(np.asarray(out['acc']), 0.0, atol=1e-5)


def test_piecewise_constant_pdf_concentrates_samples():
  B, n_bins = 8, 32
  bins = jnp.tile(jnp.linspace(0.0, 1.0, n_bins + 1)[None], (B, 1))
  weights = jnp.zeros((B, n_bins)).at[:, 20:24].set(10.0)
  z = rendering.piecewise_constant_pdf(
      jax.random.PRNGKey(0), bins, weights, num_samples=128,
      use_stratified_sampling=True)
  z = np.asarray(z)
  bin_lo, bin_hi = 20 / n_bins, 24 / n_bins
  frac_inside = ((z >= bin_lo) & (z <= bin_hi)).mean()
  assert frac_inside > 0.9


def test_piecewise_constant_pdf_uniform_weights_statistics():
  B, n_bins = 4, 16
  bins = jnp.tile(jnp.linspace(2.0, 6.0, n_bins + 1)[None], (B, 1))
  weights = jnp.ones((B, n_bins))
  z = np.asarray(rendering.piecewise_constant_pdf(
      jax.random.PRNGKey(1), bins, weights, num_samples=4096,
      use_stratified_sampling=True))
  assert abs(z.mean() - 4.0) < 0.05
  assert (z >= 2.0).all() and (z <= 6.0).all()


def test_sample_pdf_merges_and_sorts():
  B, n_c = 2, 8
  z_vals = jnp.tile(jnp.linspace(1.0, 2.0, n_c)[None], (B, 1))
  bins = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
  weights = jnp.ones((B, n_c - 2))
  origins = jnp.zeros((B, 3))
  directions = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1))
  z_all, pts = rendering.sample_pdf(
      jax.random.PRNGKey(2), bins, weights, origins, directions, z_vals,
      num_samples=8, use_stratified_sampling=True)
  assert z_all.shape == (B, n_c + 8)
  assert pts.shape == (B, n_c + 8, 3)
  assert (np.diff(np.asarray(z_all), axis=-1) >= 0).all()


def test_depth_index_and_map():
  weights = jnp.asarray([[0.1, 0.2, 0.4, 0.3],
                         [0.6, 0.2, 0.1, 0.1]])
  z_vals = jnp.asarray([[1.0, 2.0, 3.0, 4.0]] * 2)
  idx = np.asarray(rendering.compute_depth_index(weights))
  np.testing.assert_array_equal(idx, [2, 0])
  depth = np.asarray(rendering.compute_depth_map(weights, z_vals))
  np.testing.assert_allclose(depth, [3.0, 1.0], atol=1e-6)


def test_noise_regularize():
  key = jax.random.PRNGKey(3)
  raw = jnp.zeros((16, 8))
  noised = rendering.noise_regularize(key, raw, 1.0, True)
  assert np.asarray(noised).std() > 0.5
  same = rendering.noise_regularize(key, raw, None, True)
  np.testing.assert_array_equal(np.asarray(same), 0.0)
  same2 = rendering.noise_regularize(key, raw, 1.0, False)
  np.testing.assert_array_equal(np.asarray(same2), 0.0)


# --- positional encodings ---


def test_posenc_matches_closed_form():
  x = jnp.asarray([[0.3, -0.7]])
  out = np.asarray(encoding.posenc(x, num_freqs=3, use_identity=True))
  assert out.shape == (1, 2 + 2 * 3 * 2)
  expected = [0.3, -0.7]
  for f in [1.0, 2.0, 4.0]:
    expected += list(np.sin(f * np.asarray([0.3, -0.7])))
    expected += list(np.cos(f * np.asarray([0.3, -0.7])))
  np.testing.assert_allclose(out[0], expected, atol=1e-6)


def test_posenc_zero_freqs_identity():
  x = jnp.asarray([[1.0, 2.0, 3.0]])
  np.testing.assert_array_equal(
      np.asarray(encoding.posenc(x, num_freqs=0)), np.asarray(x))


def test_cosine_easing_window_endpoints():
  w0 = np.asarray(encoding.cosine_easing_window(8, 0.0))
  np.testing.assert_allclose(w0, 0.0, atol=1e-7)
  w_full = np.asarray(encoding.cosine_easing_window(8, 8.0))
  np.testing.assert_allclose(w_full, 1.0, atol=1e-7)
  w_half = np.asarray(encoding.cosine_easing_window(8, 4.5))
  np.testing.assert_allclose(w_half[:4], 1.0, atol=1e-6)
  np.testing.assert_allclose(w_half[4], 0.5, atol=1e-6)
  np.testing.assert_allclose(w_half[5:], 0.0, atol=1e-6)


def test_annealed_posenc_full_alpha_equals_plain():
  x = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
  plain = encoding.posenc(x, num_freqs=4)
  annealed = encoding.posenc(x, num_freqs=4, alpha=jnp.asarray(4.0))
  np.testing.assert_allclose(np.asarray(annealed), np.asarray(plain),
                             atol=1e-6)
  # alpha=0 kills all frequency features, keeping the identity part.
  zeroed = np.asarray(encoding.posenc(x, num_freqs=4, alpha=jnp.asarray(0.0)))
  np.testing.assert_allclose(zeroed[:, 3:], 0.0, atol=1e-7)
  np.testing.assert_allclose(zeroed[:, :3], np.asarray(x), atol=1e-7)


def test_posenc_output_dim():
  assert encoding.posenc_output_dim(3, 10, True) == 63
  assert encoding.posenc_output_dim(3, 10, False) == 60
  assert encoding.posenc_output_dim(3, 0) == 3
