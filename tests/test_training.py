"""Training: losses, sharded train step, optimization progress, ckpts."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfies_tpu import checkpoints
from nerfies_tpu import configs
from nerfies_tpu import training
from nerfies_tpu.ops import svd3
from nerfies_tpu.models import nerf
from nerfies_tpu.parallel import mesh as mesh_lib


def _tiny_setup(batch_size=16, use_warp=True, **model_overrides):
  model_kwargs = dict(
      num_coarse_samples=4,
      num_fine_samples=4,
      nerf_trunk_depth=2,
      nerf_trunk_width=16,
      nerf_rgb_branch_depth=1,
      nerf_rgb_branch_width=8,
      nerf_skips=(1,),
      num_nerf_point_freqs=2,
      num_nerf_viewdir_freqs=1,
      num_warp_freqs=2,
      use_warp=use_warp,
      warp_field_type='se3',
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 8},
      sigma_activation=nn.softplus,
  )
  model_kwargs.update(model_overrides)
  config = configs.ModelConfig(**model_kwargs)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=batch_size,
      appearance_ids=(0, 1), camera_ids=(0,), warp_ids=(0, 1),
      near=0.5, far=3.0,
      use_warp_jacobian=True, use_weights=True)
  return model, params


def _fake_batch(batch_size=16, with_background=False):
  key = jax.random.PRNGKey(1)
  directions = jax.random.normal(key, (batch_size, 3))
  directions /= jnp.linalg.norm(directions, axis=-1, keepdims=True)
  batch = {
      'origins': np.zeros((batch_size, 3), np.float32),
      'directions': np.asarray(directions),
      'rgb': np.random.RandomState(0).uniform(
          size=(batch_size, 3)).astype(np.float32),
      'metadata': {
          'warp': np.zeros((batch_size, 1), np.uint32),
          'camera': np.zeros((batch_size, 1), np.uint32),
          'appearance': np.zeros((batch_size, 1), np.uint32),
          'time': np.zeros((batch_size, 1), np.float32),
      },
  }
  if with_background:
    batch['background_points'] = np.random.RandomState(1).randn(
        24, 3).astype(np.float32)
  return batch


@pytest.mark.parametrize('loss_type', [
    'log_svals', 'svals', 'jtj', 'div', 'det', 'log_det', 'nr'])
def test_elastic_loss_types(loss_type):
  # Leading (3, 3, B, S) Jacobian layout (ops/svd3.py).
  J = svd3.from_trailing(jnp.eye(3)[None, None] + 0.1 * jax.random.normal(
      jax.random.PRNGKey(0), (4, 5, 3, 3)))
  loss, residual = training.compute_elastic_loss(J, loss_type=loss_type)
  assert loss.shape == (4, 5)
  assert residual.shape == (4, 5)
  assert np.isfinite(np.asarray(loss)).all()
  # Identity Jacobians give (near) zero loss.
  loss_id, _ = training.compute_elastic_loss(
      jnp.broadcast_to(jnp.eye(3)[..., None, None], (3, 3, 2, 2)),
      loss_type=loss_type)
  assert np.abs(np.asarray(loss_id)).max() < 1e-4


def test_elastic_loss_grad_finite():
  def f(J):
    loss, _ = training.compute_elastic_loss(J)
    return loss.sum()

  J = svd3.from_trailing(jnp.eye(3)[None] + 0.05 * jax.random.normal(
      jax.random.PRNGKey(1), (8, 3, 3)))
  g = jax.grad(f)(J)
  assert np.isfinite(np.asarray(g)).all()
  # Leading (3, 3, batch) layout: identity Jacobians for a batch of 4.
  g_id = jax.grad(f)(jnp.broadcast_to(jnp.eye(3)[..., None], (3, 3, 4)))
  assert np.isfinite(np.asarray(g_id)).all()


def test_background_loss():
  model, params = _tiny_setup()
  state = training.create_train_state(params, warp_alpha=2.0)
  points = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
  loss = training.compute_background_loss(
      model, state, params, jax.random.PRNGKey(3), points, noise_std=0.001)
  assert loss.shape == (16,)
  # At init the warp is ~identity so the loss is tiny.
  assert np.asarray(loss).mean() < 1e-3


def test_train_step_runs_and_decreases_loss():
  model, params = _tiny_setup()
  state = training.create_train_state(params, warp_alpha=2.0)
  batch = _fake_batch()
  scalar_params = training.ScalarParams(learning_rate=1e-2)
  rng = jax.random.PRNGKey(0)

  import functools
  step_fn = jax.jit(functools.partial(
      training.train_step, model,
      use_elastic_loss=True, elastic_reduce_method='weight',
      use_background_loss=False, use_warp_reg_loss=False))

  batch_j = jax.tree.map(jnp.asarray, batch)
  first_loss = None
  for _ in range(10):
    state, stats, rng = step_fn(rng, state, batch_j, scalar_params)
    loss = float(stats['fine']['loss/rgb'])
    if first_loss is None:
      first_loss = loss
  assert int(state.step) == 10
  assert loss < first_loss
  assert np.isfinite(loss)
  assert 'loss/elastic' in stats['coarse']
  assert 'metric/psnr' in stats['fine']


def test_train_step_with_all_losses():
  model, params = _tiny_setup()
  state = training.create_train_state(params, warp_alpha=2.0)
  batch = jax.tree.map(jnp.asarray, _fake_batch(with_background=True))
  scalar_params = training.ScalarParams(
      learning_rate=1e-3, elastic_loss_weight=0.01,
      warp_reg_loss_weight=0.01, background_loss_weight=1.0)
  new_state, stats, _ = training.train_step(
      model, jax.random.PRNGKey(0), state, batch, scalar_params,
      use_elastic_loss=True, elastic_reduce_method='median',
      use_background_loss=True, use_warp_reg_loss=True)
  assert 'background_loss' in stats
  assert 'loss/warp_reg' in stats['coarse']
  assert np.isfinite(float(stats['coarse']['loss/total']))
  # Params actually changed.
  diff = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                      state.params, new_state.params)
  assert max(jax.tree.leaves(diff)) > 0


def test_median_elastic_gather_equals_dense():
  """Gathered-median Jacobians (training._median_jacobian) must reproduce
  the dense all-sample path: same losses, same parameter updates."""
  # Model A: dense path (model materializes all-sample Jacobians).
  model_a, params = _tiny_setup()
  # Model B: gather path (no in-model Jacobian; train_step linearizes at
  # the gathered median-depth points). Same init seed -> same params.
  config = configs.ModelConfig(
      num_coarse_samples=4, num_fine_samples=4, nerf_trunk_depth=2,
      nerf_trunk_width=16, nerf_rgb_branch_depth=1, nerf_rgb_branch_width=8,
      nerf_skips=(1,), num_nerf_point_freqs=2, num_nerf_viewdir_freqs=1,
      num_warp_freqs=2, use_warp=True, warp_field_type='se3',
      warp_kwargs={'trunk_depth': 2, 'trunk_width': 8},
      sigma_activation=nn.softplus)
  model_b, params_b = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=16,
      appearance_ids=(0, 1), camera_ids=(0,), warp_ids=(0, 1),
      near=0.5, far=3.0, use_warp_jacobian=False, use_weights=True)
  jax.tree.map(np.testing.assert_array_equal, params, params_b)

  batch = jax.tree.map(jnp.asarray, _fake_batch())
  scalar_params = training.ScalarParams(
      learning_rate=1e-3, elastic_loss_weight=0.01)
  rng = jax.random.PRNGKey(0)

  outs = []
  for model in (model_a, model_b):
    state = training.create_train_state(params, warp_alpha=2.0)
    new_state, stats, _ = training.train_step(
        model, rng, state, batch, scalar_params,
        use_elastic_loss=True, elastic_reduce_method='median')
    outs.append((new_state, stats))

  (state_a, stats_a), (state_b, stats_b) = outs
  np.testing.assert_allclose(
      float(stats_a['coarse']['loss/elastic']),
      float(stats_b['coarse']['loss/elastic']), rtol=1e-5)
  np.testing.assert_allclose(
      float(stats_a['coarse']['loss/total']),
      float(stats_b['coarse']['loss/total']), rtol=1e-5)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7),
      state_a.params, state_b.params)


def test_compiled_train_step_on_mesh():
  # The multi-device path: 8 virtual CPU devices, batch sharded over them.
  assert jax.device_count() == 8
  model, params = _tiny_setup()
  state = training.create_train_state(params, warp_alpha=2.0)
  mesh = mesh_lib.create_mesh()
  train_config = configs.TrainConfig(
      batch_size=16, use_elastic_loss=True, elastic_reduce_method='weight',
      use_background_loss=False, use_warp_reg_loss=False)
  step = training.compile_train_step(model, train_config, mesh)

  state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
  rng = jax.random.PRNGKey(0)
  scalar_params = training.ScalarParams(learning_rate=1e-3)
  batch = _fake_batch(batch_size=16)
  state, stats, rng = step(rng, state, batch, scalar_params)
  assert int(jax.device_get(state.step)) == 1
  assert np.isfinite(float(jax.device_get(stats['fine']['loss/rgb'])))
  # And again (donated buffers must not break reuse).
  batch = _fake_batch(batch_size=16)
  state, stats, rng = step(rng, state, batch, scalar_params)
  assert int(jax.device_get(state.step)) == 2


def test_mesh_sharded_equals_single_device():
  # The sharded step must compute the same numbers as an unsharded one.
  model, params = _tiny_setup()
  batch = jax.tree.map(jnp.asarray, _fake_batch())
  scalar_params = training.ScalarParams(learning_rate=1e-3)
  rng = jax.random.PRNGKey(0)

  state_a = training.create_train_state(params, warp_alpha=2.0)
  _, stats_a, _ = training.train_step(
      model, rng, state_a, batch, scalar_params,
      use_elastic_loss=False, use_background_loss=False,
      use_warp_reg_loss=False)

  mesh = mesh_lib.create_mesh()
  train_config = configs.TrainConfig(batch_size=16)
  step = training.compile_train_step(model, train_config, mesh)
  state_b = jax.device_put(training.create_train_state(params, warp_alpha=2.0),
                           mesh_lib.replicated_sharding(mesh))
  _, stats_b, _ = step(rng, state_b, _fake_batch(), scalar_params)

  np.testing.assert_allclose(
      float(jax.device_get(stats_a['fine']['loss/rgb'])),
      float(jax.device_get(stats_b['fine']['loss/rgb'])), rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
  model, params = _tiny_setup()
  state = training.create_train_state(params, warp_alpha=2.0)
  state = state.replace(step=jnp.asarray(7, jnp.int32))
  ckpt_dir = tmp_path / 'checkpoints'
  checkpoints.save_checkpoint(ckpt_dir, state)
  assert checkpoints.latest_checkpoint_step(ckpt_dir) == 7

  fresh = training.create_train_state(params)
  restored = checkpoints.restore_checkpoint(ckpt_dir, fresh)
  assert int(restored.step) == 7
  np.testing.assert_allclose(float(restored.warp_alpha), 2.0)
  orig_leaves = jax.tree.leaves(state.params)
  rest_leaves = jax.tree.leaves(restored.params)
  for a, b in zip(orig_leaves, rest_leaves):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_keep_rotation(tmp_path):
  model, params = _tiny_setup(batch_size=4)
  state = training.create_train_state(params)
  ckpt_dir = tmp_path / 'checkpoints'
  for step in (1, 2, 3):
    checkpoints.save_checkpoint(
        ckpt_dir, state.replace(step=jnp.asarray(step, jnp.int32)), keep=2)
  assert checkpoints.latest_checkpoint_step(ckpt_dir) == 3
  steps = sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())
  assert steps == [2, 3]


def test_restore_without_checkpoint_returns_state(tmp_path):
  model, params = _tiny_setup(batch_size=4)
  state = training.create_train_state(params)
  restored = checkpoints.restore_checkpoint(tmp_path / 'none', state)
  assert restored is state


def test_elastic_grad_through_se3_jacobian_finite_at_init():
  """Second-order regression: the elastic loss differentiates THROUGH the
  warp Jacobian, so the SE(3) twist exponential must have bounded
  derivatives at every order near w = 0 (init-scale rotation outputs).

  The reference's w/|w| normalization (warping.py:334-342) NaNs here:
  directly on TPU (denormal |w|^2 flushes to zero in the forward) and
  through the `where`-style guards' exploding higher derivatives on all
  backends. Reproduced as an immediate train-step NaN before the
  raw-twist rewrite (ops/rigid.py se3_apply_raw).
  """
  import flax.linen as nn
  config = configs.ModelConfig(
      num_coarse_samples=4, num_fine_samples=0,
      nerf_trunk_depth=2, nerf_trunk_width=16,
      nerf_rgb_branch_depth=1, nerf_rgb_branch_width=16,
      nerf_skips=(1,), num_nerf_point_freqs=2, num_nerf_viewdir_freqs=1,
      use_warp=True, warp_field_type='se3', num_warp_freqs=2,
      num_warp_features=2, sigma_activation=nn.softplus)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=8,
      appearance_ids=(0,), camera_ids=(0,), warp_ids=(0, 1),
      near=0.5, far=3.0, use_warp_jacobian=True, use_weights=True)
  rng = np.random.RandomState(0)
  directions = rng.randn(8, 3).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  rays = {
      'origins': jnp.zeros((8, 3)),
      'directions': jnp.asarray(directions),
      'metadata': {'warp': jnp.zeros((8, 1), jnp.uint32),
                   'appearance': jnp.zeros((8, 1), jnp.uint32),
                   'camera': jnp.zeros((8, 1), jnp.uint32)},
  }

  def loss_fn(p):
    out = model.apply(
        {'params': p}, rays,
        warp_extra={'alpha': jnp.asarray(0.0),
                    'time_alpha': jnp.asarray(0.0)},
        return_weights=True,
        rngs={'coarse': jax.random.PRNGKey(1),
              'fine': jax.random.PRNGKey(2)})
    el, _ = training.compute_elastic_loss(out['coarse']['warp_jacobian'])
    return el.mean()

  grads = jax.grad(loss_fn)(params)
  for leaf in jax.tree.leaves(grads):
    assert np.isfinite(np.asarray(leaf)).all()
