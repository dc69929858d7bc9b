"""LPIPS perceptual distance: metric axioms + weight-file round trip."""

import numpy as np
import pytest

from nerfies_tpu import lpips


@pytest.fixture(scope='module')
def metric():
  return lpips.LPIPS(seed=0)


def _image(seed, h=64, w=64):
  return np.random.RandomState(seed).rand(h, w, 3).astype(np.float32)


def test_identical_images_zero(metric):
  img = _image(0)
  assert metric(img, img) == pytest.approx(0.0, abs=1e-6)


def test_symmetric_and_positive(metric):
  a, b = _image(1), _image(2)
  d_ab = metric(a, b)
  d_ba = metric(b, a)
  assert d_ab > 0
  assert d_ab == pytest.approx(d_ba, rel=1e-5)


def test_small_perturbation_smaller_distance(metric):
  a = _image(3)
  near = np.clip(a + 0.01 * _image(4) - 0.005, 0, 1)
  far = _image(5)
  assert metric(a, near) < metric(a, far)


def test_batched_matches_single(metric):
  a = np.stack([_image(6), _image(7)])
  b = np.stack([_image(8), _image(9)])
  batched = lpips.lpips_distance(metric.params, a, b)
  assert batched.shape == (2,)
  np.testing.assert_allclose(
      np.asarray(batched),
      [metric(a[0], b[0]), metric(a[1], b[1])], rtol=1e-5)


def test_uncalibrated_flag(metric):
  assert not metric.calibrated


def test_weight_file_roundtrip(tmp_path):
  params = lpips.init_random_params(seed=1)
  params.pop('calibrated')
  np.savez(tmp_path / 'w.npz', **params)
  loaded = lpips.LPIPS(weights_path=tmp_path / 'w.npz')
  assert loaded.calibrated
  a, b = _image(10), _image(11)
  ref = lpips.LPIPS(seed=1)
  assert loaded(a, b) == pytest.approx(ref(a, b), rel=1e-6)


def test_missing_weight_key_raises(tmp_path):
  np.savez(tmp_path / 'bad.npz', conv0_w=np.zeros((11, 11, 3, 64)))
  with pytest.raises(ValueError, match='missing'):
    lpips.load_params(tmp_path / 'bad.npz')


# ---- Calibration-graph enforcement -------------------------------------
# The official calibrated .npz cannot be vendored in this environment
# (zero network egress, no local torch/lpips caches), so these tests
# instead pin the COMPUTATION GRAPH hard enough that dropping in the
# exporter's .npz reproduces official numbers: feature-map geometry must
# match torch AlexNet exactly, and the whole forward must agree with an
# independent from-scratch numpy implementation (catches transposed
# kernels, wrong padding, off-by-one strides that axiom tests miss).


def test_feature_geometry_matches_torch_alexnet(metric):
  """Spatial sizes per tap for a 64x64 input, from torch's conv arith:
  conv1 k=11 s=4 p=2 -> 15; pool k=3 s=2 -> 7; conv2 p=2 -> 7;
  pool -> 3; conv3-5 p=1 -> 3. SAME padding would give 16 at tap 1."""
  img = _image(0)[None]
  feats = lpips._extract_features(metric.params, img)
  shapes = [tuple(f.shape) for f in feats]
  assert shapes == [
      (1, 15, 15, 64),
      (1, 7, 7, 192),
      (1, 3, 3, 384),
      (1, 3, 3, 256),
      (1, 3, 3, 256),
  ]


def _numpy_lpips(params, im1, im2):
  """Independent numpy re-implementation of the LPIPS graph."""

  def conv2d(x, w, b, stride, pad):
    x = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    kh, kw, cin, cout = w.shape
    n, h, wdt, _ = x.shape
    oh = (h - kh) // stride + 1
    ow = (wdt - kw) // stride + 1
    out = np.zeros((n, oh, ow, cout), np.float32)
    for i in range(oh):
      for j in range(ow):
        patch = x[:, i * stride:i * stride + kh,
                  j * stride:j * stride + kw, :]
        out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3],
                                                       [0, 1, 2]))
    return out + b

  def maxpool(x, k=3, s=2):
    n, h, w, c = x.shape
    oh = (h - k) // s + 1
    ow = (w - k) // s + 1
    out = np.zeros((n, oh, ow, c), np.float32)
    for i in range(oh):
      for j in range(ow):
        out[:, i, j, :] = x[:, i * s:i * s + k, j * s:j * s + k, :].max(
            axis=(1, 2))
    return out

  def feats(img):
    x = 2.0 * img - 1.0
    x = (x - lpips._SHIFT) / lpips._SCALE
    taps = []
    for i, (_, _, stride, pool_before, pad) in enumerate(lpips._ALEX_LAYERS):
      if pool_before:
        x = maxpool(x)
      x = conv2d(x, np.asarray(params[f'conv{i}_w']),
                 np.asarray(params[f'conv{i}_b']), stride, pad)
      x = np.maximum(x, 0.0)
      taps.append(x)
    return taps

  total = 0.0
  for i, (f1, f2) in enumerate(zip(feats(im1), feats(im2))):
    n1 = f1 / np.maximum(
        np.sqrt((f1 ** 2).sum(-1, keepdims=True)), 1e-10)
    n2 = f2 / np.maximum(
        np.sqrt((f2 ** 2).sum(-1, keepdims=True)), 1e-10)
    diff = (n1 - n2) ** 2 * np.asarray(params[f'lin{i}_w'])
    total = total + diff.sum(-1).mean(axis=(1, 2))
  return total


def test_matches_independent_numpy_implementation(metric):
  a, b = _image(20, 48, 40)[None], _image(21, 48, 40)[None]
  want = _numpy_lpips(metric.params, a, b)
  got = np.asarray(lpips.lpips_distance(metric.params, a, b))
  np.testing.assert_allclose(got, want, rtol=2e-4)


def test_known_value_regression(metric):
  """Pins the seed-0 fallback metric's values: any graph change that
  alters reported numbers must be deliberate and show up here."""
  d1 = metric(_image(1), _image(2))
  d2 = metric(_image(3), np.clip(_image(3) + 0.1, 0, 1))
  # Values recorded at the padding-fixed revision (round 3).
  assert d1 == pytest.approx(0.0226259, rel=2e-3), d1
  assert d2 == pytest.approx(0.0021823, rel=2e-3), d2


# ---- Uncalibrated-fallback perceptual correlation -----------------------
# The official calibrated tensors are unobtainable in this environment
# (zero egress; no torchvision/lpips packages or torch caches on disk —
# see docs/LPIPS.md), so the shipped fallback is the seeded random-feature
# net that the LPIPS paper (sec 5.4, "random networks") shows already
# tracks perceptual similarity. These tests pin that claim for OUR
# fallback on a known distortion pair-set: distances must grow
# monotonically with distortion severity within each distortion family,
# and the mixed-set ranking must agree with the MS-SSIM ranking.


def _structured_image(h=96, w=96):
  """A textured base image (edges + smooth shading, not iid noise)."""
  yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                       indexing='ij')
  r = 0.5 + 0.5 * np.sin(14 * xx) * np.cos(10 * yy)
  g = np.clip(xx + 0.3 * np.sin(20 * yy), 0, 1)
  b = ((np.floor(xx * 6) + np.floor(yy * 6)) % 2)
  return np.stack([r, g, b], -1).astype(np.float32)


def _blur(img, iterations):
  out = img.astype(np.float32)
  for _ in range(iterations):
    p = np.pad(out, ((1, 1), (1, 1), (0, 0)), mode='edge')
    out = (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
           + p[1:-1, 1:-1]) / 5.0
  return out


def _distortion_ladder():
  """(name, severity, distorted) triples over a structured base image."""
  base = _structured_image()
  rng = np.random.RandomState(0)
  noise = rng.randn(*base.shape).astype(np.float32)
  ladder = []
  for s, sigma in enumerate((0.03, 0.08, 0.15, 0.3)):
    ladder.append(('noise', s, np.clip(base + sigma * noise, 0, 1)))
  for s, it in enumerate((1, 3, 8, 20)):
    ladder.append(('blur', s, _blur(base, it)))
  for s, a in enumerate((0.85, 0.65, 0.45, 0.25)):
    ladder.append(('contrast', s, a * (base - 0.5) + 0.5))
  return base, ladder


def test_fallback_monotone_in_distortion_severity(metric):
  base, ladder = _distortion_ladder()
  by_type = {}
  for name, severity, img in ladder:
    by_type.setdefault(name, []).append((severity, metric(base, img)))
  for name, rows in by_type.items():
    dists = [d for _, d in sorted(rows)]
    assert all(a < b for a, b in zip(dists, dists[1:])), (name, dists)


def _spearman(xs, ys):
  def ranks(v):
    order = np.argsort(v)
    r = np.empty(len(v))
    r[order] = np.arange(len(v))
    return r
  rx, ry = ranks(xs), ranks(ys)
  n = len(xs)
  return 1 - 6 * np.sum((rx - ry) ** 2) / (n * (n ** 2 - 1))


def test_fallback_ranking_agrees_with_ms_ssim(metric):
  """Spearman rank correlation vs MS-SSIM over the distortion pair-set.

  MS-SSIM is itself a validated perceptual metric. Within each
  distortion family the two metrics must order severities identically
  (rho = 1.0). Across families the mixed-set rho is weaker by nature --
  equating 'how bad is this much blur vs this much noise' is exactly
  where perceptual metrics (calibrated ones included) disagree -- so the
  mixed-set floor is 0.5 and the measured value (~0.70 at this revision)
  is recorded in docs/LPIPS.md."""
  import jax.numpy as jnp
  from nerfies_tpu.ops import ssim as ssim_ops

  base, ladder = _distortion_ladder()
  rows = []
  for name, severity, img in ladder:
    num_scales = ssim_ops.max_feasible_scales(*base.shape[:2])
    weights = ssim_ops.MSSSIM_WEIGHTS[:num_scales]
    weights = tuple(w / sum(weights) for w in weights)
    ms = 1.0 - float(ssim_ops.multiscale_ssim(
        jnp.asarray(base), jnp.asarray(img), weights=weights))
    rows.append((name, severity, metric(base, img), ms))

  for family in ('noise', 'blur', 'contrast'):
    fam = [(lp, ms) for name, _, lp, ms in rows if name == family]
    rho = _spearman([lp for lp, _ in fam], [ms for _, ms in fam])
    assert rho == pytest.approx(1.0), (family, fam)

  mixed = _spearman([lp for _, _, lp, _ in rows],
                    [ms for _, _, _, ms in rows])
  assert mixed >= 0.5, (mixed, rows)
