"""Host utilities: meters, interpolation, batching helpers."""

import time

import numpy as np

from nerfies_tpu import utils
from nerfies_tpu.datasets import synthetic


def test_value_meter():
  meter = utils.ValueMeter()
  for v in (1.0, 2.0, 3.0):
    meter.update(v)
  assert meter.reduce('mean') == 2.0
  assert meter.reduce('last') == 3.0
  assert meter.reduce('std') > 0
  meter.reset()
  meter.update(5.0)
  assert meter.reduce('mean') == 5.0


def test_time_tracker():
  tracker = utils.TimeTracker()
  tracker.tic('a')
  time.sleep(0.01)
  tracker.toc('a')
  with tracker.record_time('b'):
    time.sleep(0.01)
  summary = tracker.summary('mean')
  assert summary['a'] > 0
  assert summary['b'] > 0
  assert summary['steps_per_sec'] > 0
  assert 'a=' in tracker.summary_str()


def test_interpolate_codes():
  codes = np.stack([np.zeros(4), np.ones(4)])
  out = utils.interpolate_codes(codes, num_samples=5, method='linear')
  assert out.shape == (5, 4)
  np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
  np.testing.assert_allclose(out[-1], 1.0, atol=1e-6)
  np.testing.assert_allclose(out[2], 0.5, atol=1e-6)
  out_s = utils.interpolate_codes(codes, num_samples=5, method='spline')
  assert out_s.shape == (5, 4)


def test_interpolate_cameras():
  cams = [synthetic.make_orbit_camera(t) for t in (0.0, 0.5, 1.0)]
  out = utils.interpolate_cameras(cams, num_samples=7)
  assert len(out) == 7
  np.testing.assert_allclose(out[0].position, cams[0].position, atol=1e-5)
  np.testing.assert_allclose(out[-1].position, cams[-1].position, atol=1e-5)
  for cam in out:
    np.testing.assert_allclose(cam.orientation @ cam.orientation.T,
                               np.eye(3), atol=1e-6)


def test_strided_subset():
  seq = list(range(10))
  assert len(utils.strided_subset(seq, 5)) == 5
  assert utils.strided_subset(seq, None) == seq


def test_tree_collate():
  trees = [{'a': np.ones(3), 'b': {'c': np.zeros(2)}} for _ in range(4)]
  out = utils.tree_collate(trees)
  assert out['a'].shape == (4, 3)
  assert out['b']['c'].shape == (4, 2)


def test_learning_rate_decay():
  assert abs(utils.learning_rate_decay(0) - 5e-4) < 1e-12
  assert abs(utils.learning_rate_decay(100000) - 5e-5) < 1e-12


def test_parallel_map():
  out = utils.parallel_map(lambda x: x * 2, [1, 2, 3])
  assert out == [2, 4, 6]
