"""Training: loss stack, optimizer step, sharded step compilation, ckpts.

Capability parity with /root/reference/nerfies/training.py:35-271, rebuilt
for the jit+mesh SPMD model:

  - No pmap/pmean: the train step computes global-batch means under `jit`
    with the batch sharded over the mesh; XLA inserts the ICI all-reduce
    for the replicated-parameter gradients.
  - The elastic regularizer's singular values come from the closed-form
    batched 3x3 path (`ops.svd3`) instead of LAPACK-style `jnp.linalg.svd`
    (reference training.py:87-92), and apply to the whole (B, S) Jacobian
    batch with no vmap towers.
  - The background loss reuses the model's warp field via `apply_warp`
    (same parameters, any point-set shape) instead of re-instantiating a
    differently-vmapped module (reference training.py:117-135).
  - Optimizer is optax Adam (same hyperparameters as the reference's
    flax.optim.Adam) with the learning rate injected per step.
  - Checkpointing is orbax (async-capable) with the reference's keep=2
    rotation semantics.

Behavior notes (reference quirks preserved intentionally):
  - `compute_elastic_loss` uses alpha=-2.0, scale=0.03 regardless of
    ScalarParams, like the reference (training.py:111-113); the defaults
    are exposed as arguments for tuning.
"""

import functools
from typing import Any, Callable, Dict, Optional

from flax import struct
import jax
from jax import lax
from jax import random
import jax.numpy as jnp
import optax

from nerfies_tpu import configs
from nerfies_tpu import fused_train
from nerfies_tpu.ops import mathutils
from nerfies_tpu.ops import rendering
from nerfies_tpu.ops import svd3
from nerfies_tpu.parallel import mesh as mesh_lib


@struct.dataclass
class ScalarParams:
  """Per-step scalar hyperparameters fed into the jitted step."""
  learning_rate: Any
  elastic_loss_weight: Any = 0.0
  warp_reg_loss_weight: Any = 0.0
  warp_reg_loss_alpha: Any = -2.0
  warp_reg_loss_scale: Any = 0.001
  background_loss_weight: Any = 0.0
  background_noise_std: Any = 0.001


@struct.dataclass
class TrainState:
  """Replicated training state (pytree)."""
  step: jnp.ndarray
  params: Any
  opt_state: Any
  warp_alpha: jnp.ndarray = 0.0
  time_alpha: jnp.ndarray = 0.0

  @property
  def warp_extra(self):
    return {'alpha': self.warp_alpha, 'time_alpha': self.time_alpha}


def create_optimizer() -> optax.GradientTransformation:
  """Adam moments; the learning rate is applied separately each step."""
  return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(params, warp_alpha=0.0, time_alpha=0.0) -> TrainState:
  tx = create_optimizer()
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=tx.init(params),
      warp_alpha=jnp.asarray(warp_alpha, jnp.float32),
      time_alpha=jnp.asarray(time_alpha, jnp.float32))


def compute_elastic_loss(jacobian: jnp.ndarray, eps: float = 1e-6,
                         loss_type: str = 'log_svals', alpha: float = -2.0,
                         scale: float = 0.03):
  """Elastic deformation regularizer on warp Jacobians.

  Seven variants, parity with reference training.py:71-114 but natively
  batched and TPU-friendly: `jacobian` uses the LEADING (3, 3, ...) layout
  of ops/svd3.py, and spectra are closed-form.

  Returns:
    (loss, residual), each shaped like the Jacobian batch (...,).
  """
  if loss_type == 'log_svals':
    svals = svd3.svals3(jacobian, eps=eps ** 2)
    log_svals = jnp.log(jnp.maximum(svals, eps))
    sq_residual = jnp.sum(log_svals ** 2, axis=0)
  elif loss_type == 'svals':
    svals = svd3.svals3(jacobian, eps=eps ** 2)
    sq_residual = jnp.sum((svals - 1.0) ** 2, axis=0)
  elif loss_type == 'jtj':
    # || J J^T - I ||_F^2 / 4 from the 6 unique entries of J J^T
    # (explicit multiply-adds; einsum over the 3-axis lowers to a
    # batch-leading dot_general, re-creating trailing [..., 3, 3]).
    def row_dot(i, k):
      return (jacobian[i, 0] * jacobian[k, 0]
              + jacobian[i, 1] * jacobian[k, 1]
              + jacobian[i, 2] * jacobian[k, 2])
    sq_residual = ((row_dot(0, 0) - 1.0) ** 2 + (row_dot(1, 1) - 1.0) ** 2
                   + (row_dot(2, 2) - 1.0) ** 2
                   + 2.0 * (row_dot(0, 1) ** 2 + row_dot(0, 2) ** 2
                            + row_dot(1, 2) ** 2)) / 4.0
  elif loss_type == 'div':
    div = mathutils.jacobian_to_div(jacobian)
    sq_residual = div ** 2
  elif loss_type == 'det':
    det = svd3.det3(jacobian)
    sq_residual = (det - 1.0) ** 2
  elif loss_type == 'log_det':
    det = svd3.det3(jacobian)
    sq_residual = jnp.log(jnp.maximum(det, eps)) ** 2
  elif loss_type == 'nr':
    rot = svd3.nearest_rotation(jacobian)
    sq_residual = jnp.sum((jacobian - rot) ** 2, axis=(0, 1))
  else:
    raise NotImplementedError(f'Unknown elastic loss type {loss_type!r}')
  residual = jnp.sqrt(sq_residual)
  loss = mathutils.general_loss_with_squared_residual(
      sq_residual, alpha=alpha, scale=scale)
  return loss, residual


def compute_background_loss(model, state: TrainState, params, key,
                            points: jnp.ndarray, noise_std,
                            alpha: float = -2.0, scale: float = 0.001):
  """Penalizes warping of known-static (COLMAP background) points.

  Re-applies the model's warp field -- with the SAME parameter subtree the
  ray-march uses -- to noised background points under random warp ids.
  Parity: reference training.py:117-135.
  """
  choice_key, noise_key = random.split(key)
  metadata = random.choice(
      choice_key, jnp.asarray(model.warp_ids, jnp.uint32),
      shape=(points.shape[0], 1))
  points = points + noise_std * random.normal(noise_key, points.shape)
  warp_out = model.apply({'params': params}, points, metadata,
                         state.warp_extra, False, False,
                         method=model.apply_warp)
  warped_points = warp_out['warped_points']
  sq_residual = jnp.sum((warped_points - points) ** 2, axis=-1)
  return mathutils.general_loss_with_squared_residual(
      sq_residual, alpha=alpha, scale=scale)


def train_step(model,
               rng_key,
               state: TrainState,
               batch: Dict[str, Any],
               scalar_params: ScalarParams,
               use_elastic_loss: bool = False,
               elastic_reduce_method: str = 'median',
               elastic_loss_type: str = 'log_svals',
               use_background_loss: bool = False,
               use_warp_reg_loss: bool = False):
  """One optimization step over the global (mesh-sharded) ray batch.

  Args:
    model: the NerfModel (static).
    rng_key: PRNG key for this step.
    state: TrainState.
    batch: {'origins', 'directions', 'rgb', 'metadata', ...,
      'background_points'?}.
    scalar_params: per-step scalars (lr, loss weights).
    use_*: static loss switches.

  Returns:
    (new_state, stats, new_rng_key).
  """
  rng_key, fine_key, coarse_key, reg_key = random.split(rng_key, 4)

  def _median_jacobian(params, model_out):
    """Gather-then-linearize: Jacobians ONLY at median-depth samples.

    In 'median' reduce mode only one sample per ray contributes to the
    elastic loss, so instead of materializing the (3, 3, B, S) Jacobian
    through 3 tangent passes over every sample (then discarding S-1 of
    S columns), gather each ray's median-depth point FIRST and linearize
    the warp on the (B, 1, 3) gathered set — an S-fold reduction of the
    Jacobian workload. Mathematically identical: the warp is pointwise
    and the coarse sample points carry no parameter dependence, so
    re-applying the (shared-parameter) warp field at the gathered points
    yields exactly the Jacobian columns the dense path would have
    selected.
    """
    weights = lax.stop_gradient(model_out['weights'])
    depth_indices = rendering.compute_depth_index(weights)
    points = model_out['points']  # (B, S, 3) pre-warp sample points
    median_points = jnp.take_along_axis(
        points, depth_indices[:, None, None], axis=-2)  # (B, 1, 3)
    warp_metadata = (
        batch['metadata']['time']
        if model.warp_metadata_encoder_type == 'time'
        else batch['metadata']['warp'])
    warp_out = model.apply({'params': params}, median_points, warp_metadata,
                           state.warp_extra, True, False,
                           method=model.apply_warp)
    return warp_out['jacobian']  # (3, 3, B, 1)

  def _compute_loss_and_stats(params, model_out, level_uses_elastic):
    rgb_loss = ((model_out['rgb'] - batch['rgb'][..., :3]) ** 2).mean()
    stats = {'loss/rgb': rgb_loss}
    loss = rgb_loss
    stats_jacobian = model_out.get('warp_jacobian')
    if level_uses_elastic:
      if elastic_reduce_method == 'median':
        if 'warp_jacobian' in model_out:
          # Dense path (model already computed all-sample Jacobians):
          # pick the median-depth column per ray.
          weights = lax.stop_gradient(model_out['weights'])
          depth_indices = rendering.compute_depth_index(weights)
          jacobian = jnp.take_along_axis(
              model_out['warp_jacobian'],
              depth_indices[None, None, :, None], axis=-1)
        else:
          jacobian = _median_jacobian(params, model_out)
          stats_jacobian = jacobian
      else:
        jacobian = model_out['warp_jacobian']
      elastic_loss, elastic_residual = compute_elastic_loss(
          jacobian, loss_type=elastic_loss_type)
      if elastic_reduce_method == 'weight':
        weights = lax.stop_gradient(model_out['weights'])
        elastic_loss = weights * elastic_loss
      elastic_loss = elastic_loss.sum(axis=-1).mean()
      stats['loss/elastic'] = elastic_loss
      stats['residual/elastic'] = jnp.mean(elastic_residual)
      loss = loss + scalar_params.elastic_loss_weight * elastic_loss

    if use_warp_reg_loss:
      weights = lax.stop_gradient(model_out['weights'])
      depth_indices = rendering.compute_depth_index(weights)
      warp_mag = ((model_out['points']
                   - model_out['warped_points']) ** 2).sum(axis=-1)
      warp_reg_residual = jnp.take_along_axis(
          warp_mag, depth_indices[..., None], axis=-1)
      warp_reg_loss = mathutils.general_loss_with_squared_residual(
          warp_reg_residual,
          alpha=scalar_params.warp_reg_loss_alpha,
          scale=scalar_params.warp_reg_loss_scale).mean()
      stats['loss/warp_reg'] = warp_reg_loss
      stats['residual/warp_reg'] = jnp.mean(
          mathutils.safe_sqrt(warp_reg_residual))
      loss = loss + scalar_params.warp_reg_loss_weight * warp_reg_loss

    if stats_jacobian is not None:
      # In gathered-median mode these diagnostics cover the median-depth
      # samples (the ones the loss sees) rather than all S samples.
      stats['metric/jacobian_det'] = jnp.mean(svd3.det3(stats_jacobian))
      stats['metric/jacobian_div'] = jnp.mean(
          mathutils.jacobian_to_div(stats_jacobian))
      stats['metric/jacobian_curl'] = jnp.mean(
          jnp.linalg.norm(mathutils.jacobian_to_curl(stats_jacobian),
                          axis=0))

    stats['loss/total'] = loss
    stats['metric/psnr'] = mathutils.compute_psnr(rgb_loss)
    return loss, stats

  def _loss_fn(params):
    need_points = use_warp_reg_loss or (
        use_elastic_loss and elastic_reduce_method == 'median')
    if model.use_fused_mlp and fused_train.supported(model):
      ret = fused_train.model_forward(
          model, params, batch, state.warp_extra, coarse_key, fine_key,
          return_points=need_points,
          return_weights=use_warp_reg_loss or use_elastic_loss,
          interpret=jax.devices()[0].platform != 'tpu')
    else:
      ret = model.apply({'params': params},
                        batch,
                        warp_extra=state.warp_extra,
                        return_points=need_points,
                        return_weights=use_warp_reg_loss or use_elastic_loss,
                        rngs={'fine': fine_key, 'coarse': coarse_key})

    losses = {}
    stats = {}
    if 'fine' in ret:
      losses['fine'], stats['fine'] = _compute_loss_and_stats(
          params, ret['fine'], level_uses_elastic=False)
    if 'coarse' in ret:
      losses['coarse'], stats['coarse'] = _compute_loss_and_stats(
          params, ret['coarse'], level_uses_elastic=use_elastic_loss)

    if use_background_loss:
      background_loss = compute_background_loss(
          model,
          state=state,
          params=params,
          key=reg_key,
          points=batch['background_points'],
          noise_std=scalar_params.background_noise_std).mean()
      losses['background'] = (
          scalar_params.background_loss_weight * background_loss)
      stats['background_loss'] = background_loss

    return sum(losses.values()), stats

  grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
  (_, stats), grad = grad_fn(state.params)
  tx = create_optimizer()
  updates, new_opt_state = tx.update(grad, state.opt_state, state.params)
  updates = jax.tree.map(
      lambda u: -scalar_params.learning_rate * u, updates)
  new_params = optax.apply_updates(state.params, updates)
  new_state = state.replace(
      step=state.step + 1, params=new_params, opt_state=new_opt_state)
  return new_state, stats, rng_key


def compile_train_step(model, train_config: 'configs.TrainConfig',
                       mesh) -> Callable:
  """Builds the jitted, mesh-sharded train step.

  The returned callable takes (rng, state, batch, scalar_params) where
  `batch` leaves are host numpy arrays with a global leading batch axis;
  they are placed with the batch sharding, state/rng/scalars replicated.
  """
  step_fn = functools.partial(
      train_step,
      model,
      use_elastic_loss=train_config.use_elastic_loss,
      elastic_reduce_method=train_config.elastic_reduce_method,
      elastic_loss_type=train_config.elastic_loss_type,
      use_background_loss=train_config.use_background_loss,
      use_warp_reg_loss=train_config.use_warp_reg_loss,
  )
  data_sharding = mesh_lib.batch_sharding(mesh)
  repl = mesh_lib.replicated_sharding(mesh)

  jitted = jax.jit(
      step_fn,
      in_shardings=(repl, repl, data_sharding, repl),
      out_shardings=(repl, repl, repl),
      # Donate only the state: its buffers alias the returned state
      # (params/opt-state update in place). Batch buffers never alias an
      # output, so donating them only produced "donated buffers were not
      # usable" warnings every compile.
      donate_argnums=(1,),
  )

  def run(rng, state, batch, scalar_params):
    batch = mesh_lib.shard_batch(batch, data_sharding)
    return jitted(rng, state, batch, scalar_params)

  run.jitted = jitted  # exposed for cost analysis (bench.py MFU estimate)
  return run
