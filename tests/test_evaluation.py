"""Evaluation: chunked sharded rendering, SSIM/MS-SSIM, visualization."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import configs
from nerfies_tpu import evaluation
from nerfies_tpu import training
from nerfies_tpu import visualization
from nerfies_tpu.models import nerf
from nerfies_tpu.ops import ssim as ssim_lib
from nerfies_tpu.parallel import mesh as mesh_lib


def _tiny_model():
  config = configs.ModelConfig(
      num_coarse_samples=4, num_fine_samples=4,
      nerf_trunk_depth=2, nerf_trunk_width=16,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=8,
      nerf_skips=(1,), num_nerf_point_freqs=2, num_nerf_viewdir_freqs=1,
      num_warp_freqs=2, use_warp=True, warp_field_type='se3',
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 8},
      sigma_activation=nn.softplus, use_stratified_sampling=False)
  return nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=8,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0,),
      near=0.5, far=3.0)


def _image_rays(h, w):
  yy, xx = np.meshgrid(np.linspace(-0.2, 0.2, h),
                       np.linspace(-0.3, 0.3, w), indexing='ij')
  directions = np.stack(
      [xx, yy, np.ones_like(xx)], axis=-1).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  return {
      'origins': np.zeros((h, w, 3), np.float32),
      'directions': directions,
      'metadata': {
          'warp': np.zeros((h, w, 1), np.uint32),
          'camera': np.zeros((h, w, 1), np.uint32),
          'appearance': np.zeros((h, w, 1), np.uint32),
          'time': np.zeros((h, w, 1), np.float32),
      },
  }


def test_render_image_shapes_and_chunking():
  model, params = _tiny_model()
  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  render_fn = evaluation.make_render_fn(model, mesh)
  h, w = 12, 18  # 216 rays: not divisible by chunk or device count
  out = evaluation.render_image(state, _image_rays(h, w), render_fn,
                                chunk=64)
  assert out['rgb'].shape == (h, w, 3)
  assert out['depth'].shape == (h, w)
  assert out['med_depth'].shape == (h, w)
  assert out['acc'].shape == (h, w)
  assert np.isfinite(out['rgb']).all()
  assert out['rays_per_sec'] > 0


def test_render_image_chunk_invariance():
  # The image must not depend on the chunk size (padding correctness).
  model, params = _tiny_model()
  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  render_fn = evaluation.make_render_fn(model, mesh)
  rays = _image_rays(8, 8)
  out1 = evaluation.render_image(state, rays, render_fn, chunk=16)
  out2 = evaluation.render_image(state, rays, render_fn, chunk=64)
  np.testing.assert_allclose(out1['rgb'], out2['rgb'], atol=1e-5)
  np.testing.assert_allclose(out1['depth'], out2['depth'], atol=1e-5)


def test_render_image_fused_matches_loop():
  """The single-dispatch lax.map path equals the per-chunk loop fallback."""
  import functools
  model, params = _tiny_model()
  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  render_fn = evaluation.make_render_fn(model, mesh)
  rays = _image_rays(10, 14)  # 140 rays: partial final chunk
  fused = evaluation.render_image(state, rays, render_fn, chunk=32)

  # A bare callable without .chunked exercises the loop fallback.
  plain_fn = functools.partial(render_fn)
  assert not hasattr(plain_fn, 'chunked')
  loop = evaluation.render_image(state, rays, plain_fn, chunk=32)
  for k in ('rgb', 'depth', 'med_depth', 'acc'):
    np.testing.assert_allclose(fused[k], loop[k], atol=1e-5, err_msg=k)


def test_render_camera_matches_host_rays():
  """On-device ray generation renders the same image as host-built rays.

  The camera path uploads only camera params + metadata scalars; the host
  path uploads the full (H, W, 3) origins/directions bundle built by the
  numpy Newton undistort. Both must produce the same pixels (same Newton
  iteration count on both paths).
  """
  from nerfies_tpu import camera as cam
  from nerfies_tpu.datasets import core as ds_core
  model, params = _tiny_model()
  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  render_fn = evaluation.make_render_fn(model, mesh)

  h, w = 10, 14
  camera = cam.Camera(
      orientation=np.eye(3), position=np.array([0.05, -0.1, -1.0]),
      focal_length=20.0, principal_point=np.array([w / 2, h / 2]),
      image_size=np.array([w, h]),
      radial_distortion=np.array([0.01, -0.005, 0.0]),
      tangential_distortion=np.array([0.001, -0.002]))
  metadata_ids = {'warp': 0, 'appearance': 0, 'camera': 0, 'time': 0.25}

  cam_out = evaluation.render_camera(state, camera, metadata_ids,
                                     render_fn, chunk=32)
  rays = ds_core.camera_to_rays(camera)
  rays_dict = {
      'origins': rays['origins'],
      'directions': rays['directions'],
      'metadata': {
          k: np.full((h, w, 1), v, np.float32 if k == 'time' else np.uint32)
          for k, v in metadata_ids.items()
      },
  }
  host_out = evaluation.render_image(state, rays_dict, render_fn, chunk=32)
  for k in ('rgb', 'depth', 'med_depth', 'acc'):
    np.testing.assert_allclose(cam_out[k], host_out[k], atol=2e-5,
                               err_msg=k)


def test_render_camera_chunk_invariance():
  from nerfies_tpu import camera as cam
  model, params = _tiny_model()
  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  render_fn = evaluation.make_render_fn(model, mesh)
  camera = cam.Camera(
      orientation=np.eye(3), position=np.array([0.0, 0.0, -1.0]),
      focal_length=16.0, principal_point=np.array([6.0, 4.0]),
      image_size=np.array([12, 8]))
  md = {'warp': 0, 'appearance': 0, 'camera': 0, 'time': 0.0}
  out1 = evaluation.render_camera(state, camera, md, render_fn, chunk=16)
  out2 = evaluation.render_camera(state, camera, md, render_fn, chunk=64)
  np.testing.assert_allclose(out1['rgb'], out2['rgb'], atol=1e-5)
  np.testing.assert_allclose(out1['depth'], out2['depth'], atol=1e-5)


# --- SSIM ---


def test_ssim_identical_images():
  img = jnp.asarray(np.random.RandomState(0).uniform(
      size=(48, 64, 3)).astype(np.float32))
  val = float(ssim_lib.ssim(img, img))
  assert abs(val - 1.0) < 1e-5


def test_ssim_noise_lowers_score():
  rng = np.random.RandomState(1)
  img = rng.uniform(size=(48, 64, 3)).astype(np.float32)
  noisy = np.clip(img + 0.2 * rng.randn(48, 64, 3), 0, 1).astype(np.float32)
  val = float(ssim_lib.ssim(jnp.asarray(img), jnp.asarray(noisy)))
  assert 0.0 < val < 0.9


def test_msssim_matches_tensorflow():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(2)
  # Smooth-ish images (MS-SSIM needs >= 176 px per side for 5 scales).
  base = rng.uniform(size=(192, 192, 3)).astype(np.float32)
  import scipy.ndimage
  img0 = scipy.ndimage.gaussian_filter(base, (3, 3, 0)).astype(np.float32)
  img1 = np.clip(
      img0 + 0.05 * rng.randn(192, 192, 3), 0, 1).astype(np.float32)

  ours = float(ssim_lib.multiscale_ssim(jnp.asarray(img0),
                                        jnp.asarray(img1)))
  theirs = float(tf.image.ssim_multiscale(
      tf.convert_to_tensor(img0), tf.convert_to_tensor(img1), max_val=1.0))
  assert abs(ours - theirs) < 0.015


def test_msssim_identical():
  img = jnp.asarray(np.random.RandomState(3).uniform(
      size=(176, 176, 3)).astype(np.float32))
  val = float(ssim_lib.multiscale_ssim(img, img))
  assert abs(val - 1.0) < 1e-4


def test_ssim_smooth_low_variance_images_stay_bounded():
  """SSIM <= 1 on smooth images — the TPU-precision regression case.

  On smooth low-variance regions (the env-background scene renders) the
  E[x^2] - mu^2 variance cancellation sits at ~1e-6 while bf16 input
  quantization error is ~1e-3: at default matmul precision the TPU conv
  produced NEGATIVE sigma estimates and SSIM values of 7.2/21.4 on real
  renders (quality_bench, round 4). _filter2d must force
  Precision.HIGHEST; this test pins the invariant on whatever backend the
  suite runs on.
  """
  yy, xx = np.mgrid[0:192, 0:192].astype(np.float32) / 192.0
  img0 = np.stack([0.6 + 0.01 * xx, 0.6 + 0.01 * yy,
                   np.full_like(xx, 0.6)], axis=-1)
  img1 = np.clip(img0 + 1e-3 * np.random.RandomState(4).randn(192, 192, 3),
                 0, 1).astype(np.float32)
  im0, im1 = jnp.asarray(img0), jnp.asarray(img1)
  for _ in range(3):
    val, cs = ssim_lib.ssim(im0, im1, return_cs=True)
    assert -1.0 <= float(val) <= 1.0 + 1e-6, float(val)
    assert -1.0 <= float(cs) <= 1.0 + 1e-6, float(cs)
    im0, im1 = ssim_lib._avg_pool2(im0), ssim_lib._avg_pool2(im1)
  ms = float(ssim_lib.multiscale_ssim(jnp.asarray(img0), jnp.asarray(img1)))
  assert 0.0 <= ms <= 1.0 + 1e-6, ms


# --- visualization ---


def test_colorize_shapes_and_range():
  depth = np.random.RandomState(0).uniform(1.0, 3.0, (24, 32))
  colored = visualization.colorize(depth, cmap='turbo')
  assert colored.shape == (24, 32, 3)
  assert colored.min() >= 0.0 and colored.max() <= 1.0


def test_colorize_constant_array():
  colored = visualization.colorize(np.ones((8, 8)), cmin=0.0, cmax=1.0)
  assert np.isfinite(colored).all()


def test_colorize_binary_logits():
  logits = np.random.RandomState(1).randn(16, 16, 4)
  colored = visualization.colorize_binary_logits(logits)
  assert colored.shape == (16, 16, 3)


def test_msssim_feasible_scales():
  assert ssim_lib.max_feasible_scales(180, 240) == 5
  assert ssim_lib.max_feasible_scales(64, 64) == 3
  assert ssim_lib.max_feasible_scales(11, 11) == 1
  assert ssim_lib.max_feasible_scales(8, 300) == 0


def test_msssim_small_image_truncated_scales():
  rng = np.random.default_rng(5)
  img0 = rng.random((48, 64, 3), dtype=np.float32)
  img1 = np.clip(img0 + 0.05 * rng.standard_normal(img0.shape), 0, 1)
  img1 = img1.astype(np.float32)
  scales = ssim_lib.max_feasible_scales(48, 64)
  weights = ssim_lib.MSSSIM_WEIGHTS[:scales]
  weights = tuple(w / sum(weights) for w in weights)
  val = float(ssim_lib.multiscale_ssim(jnp.asarray(img0), jnp.asarray(img1),
                                       weights=weights))
  assert 0.0 < val < 1.0
