"""True multi-process (simulated multi-host) training equivalence.

Spawns N CPU processes with jax.distributed and asserts that the final
parameters after a few optimizer steps match a single-process run with the
same number of global devices: the per-host input slicing
(iterator_from_pool), global-batch assembly (mesh.shard_batch via
jax.make_array_from_process_local_data), gradient all-reduce, and the
all-host orbax checkpoint path must all compose correctly.

Parity target: the reference's per-host feeding semantics
(/root/reference/train.py:153) which were never actually exercised with
process_count > 1 (SURVEY.md section 4).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).parent.parent
DRIVER = Path(__file__).parent / 'multiprocess_driver.py'


def _free_port():
  with socket.socket() as s:
    s.bind(('localhost', 0))
    return s.getsockname()[1]


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
  from nerfies_tpu.datasets import synthetic
  path = tmp_path_factory.mktemp('mp_scene')
  synthetic.write_synthetic_dataset(
      path, num_train=4, num_val=1, image_size=(24, 16),
      motion_amplitude=0.05)
  return path


def _run_driver(scene_dir, out_dir, num_processes, devices_per_process):
  out_dir.mkdir(parents=True, exist_ok=True)
  port = _free_port()
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)  # driver sets its own device count
  procs = [
      subprocess.Popen(
          [sys.executable, str(DRIVER), str(pid), str(num_processes),
           str(port), str(scene_dir), str(out_dir),
           str(devices_per_process)],
          env=env, cwd=REPO_ROOT,
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
      for pid in range(num_processes)
  ]
  outputs = []
  for p in procs:
    out, _ = p.communicate(timeout=900)
    outputs.append(out)
  for p, out in zip(procs, outputs):
    assert p.returncode == 0, f'driver failed:\n{out[-4000:]}'
  data = np.load(out_dir / 'params.npz')
  return {k: data[k] for k in data.files}


def test_two_process_matches_single_process(scene_dir, tmp_path):
  """2 hosts x 2 devices must train identically to 1 host x 4 devices."""
  single = _run_driver(scene_dir, tmp_path / 'single', 1, 4)
  multi = _run_driver(scene_dir, tmp_path / 'multi', 2, 2)
  assert single.keys() == multi.keys()
  for k in single:
    np.testing.assert_allclose(
        single[k], multi[k], rtol=2e-5, atol=1e-6,
        err_msg=f'param leaf {k} diverged between 1- and 2-process runs')
