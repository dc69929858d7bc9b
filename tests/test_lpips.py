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
