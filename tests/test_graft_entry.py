"""Driver entry points: single-chip compile and multi-chip dry run."""

import jax
import numpy as np

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
  fn, args = graft.entry()
  out = jax.jit(fn)(*args)
  assert out['fine']['rgb'].shape == (512, 3)
  assert np.isfinite(np.asarray(out['fine']['rgb'])).all()


def test_dryrun_multichip_8():
  assert jax.device_count() == 8
  graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
  graft.dryrun_multichip(2)
