"""Training CLI for nerfies_tpu.

Surface parity with /root/reference/train.py:43-326 (same flags, config
zoo, logging cadence, checkpoint layout) on the jit+mesh execution model:
one compiled SPMD step over a 1-D device mesh, batch sharded, parameters
replicated, gradient all-reduce inserted by XLA over ICI.
"""

import functools

from absl import app
from absl import flags
from absl import logging
import jax
from jax import random
import numpy as np

from nerfies_tpu import checkpoints
from nerfies_tpu import configs
from nerfies_tpu import datasets
from nerfies_tpu import gpath
from nerfies_tpu import minigin as gin
from nerfies_tpu import schedules
from nerfies_tpu import training
from nerfies_tpu import utils
from nerfies_tpu.datasets import core as datasets_core
from nerfies_tpu.models import nerf as models
from nerfies_tpu.parallel import mesh as mesh_lib

flags.DEFINE_string('base_folder', None, 'where to store ckpts and logs')
flags.mark_flag_as_required('base_folder')
flags.DEFINE_string('data_dir', None, 'input data directory.')
flags.DEFINE_multi_string('gin_bindings', None, 'Gin parameter bindings.')
flags.DEFINE_multi_string('gin_configs', (), 'Gin config files.')
flags.DEFINE_string('profile_dir', None,
                    'If set, capture a jax.profiler trace of steps '
                    '10-20 into this directory.')
FLAGS = flags.FLAGS


def _make_summary_writer(summary_dir):
  try:
    from torch.utils.tensorboard import SummaryWriter
    return SummaryWriter(str(summary_dir))
  except ImportError:
    logging.warning('No TensorBoard writer available; logging to console.')
    return None


def _log_to_tensorboard(writer, state, scalar_params, stats, time_dict):
  """Scalar logging (parity: reference train.py:56-81)."""
  if writer is None:
    return
  step = int(jax.device_get(state.step))
  writer.add_scalar('params/learning_rate', scalar_params.learning_rate, step)
  writer.add_scalar('params/warp_alpha',
                    float(jax.device_get(state.warp_alpha)), step)
  writer.add_scalar('params/time_alpha',
                    float(jax.device_get(state.time_alpha)), step)
  writer.add_scalar('params/elastic_loss/weight',
                    scalar_params.elastic_loss_weight, step)
  for branch in ('coarse', 'fine'):
    if branch not in stats:
      continue
    for stat_key, stat_value in stats[branch].items():
      writer.add_scalar(f'{stat_key}/{branch}',
                        float(jax.device_get(stat_value)), step)
  if 'background_loss' in stats:
    writer.add_scalar('loss/background',
                      float(jax.device_get(stats['background_loss'])), step)
  for k, v in time_dict.items():
    writer.add_scalar(f'time/{k}', v, step)


def _log_histograms(writer, model, state):
  """Embedding histograms (parity: reference train.py:84-97)."""
  if writer is None:
    return
  step = int(jax.device_get(state.step))
  params = jax.device_get(state.params)
  if 'appearance_encoder' in params:
    writer.add_histogram(
        'appearance_embedding',
        np.asarray(params['appearance_encoder']['embed']['embedding']), step)
  if 'camera_encoder' in params:
    writer.add_histogram(
        'camera_embedding',
        np.asarray(params['camera_encoder']['embed']['embedding']), step)
  if ('warp_field' in params
      and model.warp_metadata_encoder_type == 'glo'):
    writer.add_histogram(
        'warp_embedding',
        np.asarray(
            params['warp_field']['metadata_encoder']['embed']['embedding']),
        step)


def main(argv):
  del argv
  logging.info('*** Starting experiment')
  gin.add_search_path('configs')
  gin.parse_config_files_and_bindings(
      config_files=FLAGS.gin_configs, bindings=FLAGS.gin_bindings)

  exp_config = configs.ExperimentConfig()
  model_config = configs.ModelConfig()
  train_config = configs.TrainConfig()

  exp_dir = gpath.GPath(FLAGS.base_folder)
  if exp_config.subname:
    exp_dir = exp_dir / exp_config.subname
  summary_dir = exp_dir / 'summaries' / 'train'
  checkpoint_dir = exp_dir / 'checkpoints'

  if jax.process_index() == 0:
    for d in (exp_dir, summary_dir, checkpoint_dir):
      if not d.exists():
        d.mkdir(parents=True, exist_ok=True)
    config_str = gin.operative_config_str()
    logging.info('Configuration: \n%s', config_str)
    with (exp_dir / 'config.gin').open('w') as f:
      f.write(config_str)

  logging.info('Starting process %d of %d; %d local / %d total devices.',
               jax.process_index(), jax.process_count(),
               jax.local_device_count(), jax.device_count())

  rng = random.PRNGKey(exp_config.random_seed)
  np.random.seed(exp_config.random_seed + jax.process_index())

  if train_config.batch_size % jax.device_count() != 0:
    raise ValueError('Batch size must be divisible by the number of devices.')

  datasource_spec = exp_config.datasource_spec
  if datasource_spec is None:
    datasource_spec = {
        'type': exp_config.datasource_type,
        'data_dir': FLAGS.data_dir,
    }
  logging.info('Creating datasource: %s', datasource_spec)
  datasource = datasets.from_config(
      datasource_spec,
      image_scale=exp_config.image_scale,
      use_appearance_id=model_config.use_appearance_metadata,
      use_camera_id=model_config.use_camera_metadata,
      use_warp_id=model_config.use_warp,
      use_time=model_config.warp_metadata_encoder_type == 'time',
      random_seed=exp_config.random_seed,
      **dict(exp_config.datasource_kwargs))
  train_iter = datasource.create_iterator(
      datasource.train_ids,
      flatten=True,
      shuffle=True,
      batch_size=train_config.batch_size,
      prefetch_size=3)

  points_iter = None
  if train_config.use_background_loss:
    points = datasource.load_points(shuffle=True)
    points_batch_size = min(len(points),
                            train_config.background_points_batch_size)
    points_batch_size -= points_batch_size % jax.device_count()
    points_iter = datasets_core.iterator_from_arrays(
        points, batch_size=points_batch_size, shuffle=True,
        seed=exp_config.random_seed, prefetch_size=3)

  learning_rate_sched = schedules.from_config(train_config.lr_schedule)
  warp_alpha_sched = schedules.from_config(train_config.warp_alpha_schedule)
  time_alpha_sched = schedules.from_config(train_config.time_alpha_schedule)
  elastic_loss_weight_sched = schedules.from_config(
      train_config.elastic_loss_weight_schedule)

  rng, key = random.split(rng)
  model, params = models.construct_nerf(
      key,
      model_config,
      batch_size=train_config.batch_size,
      appearance_ids=datasource.appearance_ids,
      camera_ids=datasource.camera_ids,
      warp_ids=datasource.warp_ids,
      near=datasource.near,
      far=datasource.far,
      # 'median' reduce mode gathers each ray's median-depth point and
      # linearizes the warp on the gathered set inside the train step
      # (training._median_jacobian) — S-fold less Jacobian work than
      # materializing all-sample Jacobians in the forward pass.
      use_warp_jacobian=(train_config.use_elastic_loss
                         and train_config.elastic_reduce_method != 'median'),
      use_weights=train_config.use_elastic_loss)

  state = training.create_train_state(
      params,
      warp_alpha=warp_alpha_sched(0),
      time_alpha=time_alpha_sched(0))
  scalar_params = training.ScalarParams(
      learning_rate=learning_rate_sched(0),
      elastic_loss_weight=elastic_loss_weight_sched(0),
      warp_reg_loss_weight=train_config.warp_reg_loss_weight,
      warp_reg_loss_alpha=train_config.warp_reg_loss_alpha,
      warp_reg_loss_scale=train_config.warp_reg_loss_scale,
      background_loss_weight=train_config.background_loss_weight)
  state = checkpoints.restore_checkpoint(checkpoint_dir, state)
  init_step = int(jax.device_get(state.step)) + 1

  mesh = mesh_lib.create_mesh()
  state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
  train_step = training.compile_train_step(model, train_config, mesh)

  summary_writer = None
  if jax.process_index() == 0:
    summary_writer = _make_summary_writer(summary_dir)
    if summary_writer:
      summary_writer.add_text('gin/train', gin.operative_config_str(), 0)

  logging.info('Starting training from step %d', init_step)
  rng = random.fold_in(rng, jax.process_index())
  time_tracker = utils.TimeTracker()
  time_tracker.tic('data', 'total')

  step = init_step - 1
  for step, batch in zip(range(init_step, train_config.max_steps + 1),
                         train_iter):
    if points_iter is not None:
      batch['background_points'] = next(points_iter)
    time_tracker.toc('data')
    scalar_params = scalar_params.replace(
        learning_rate=learning_rate_sched(step),
        elastic_loss_weight=elastic_loss_weight_sched(step))
    state = state.replace(
        warp_alpha=jax.device_put(np.float32(warp_alpha_sched(step))),
        time_alpha=jax.device_put(np.float32(time_alpha_sched(step))))

    if FLAGS.profile_dir and step == init_step + 10:
      jax.profiler.start_trace(FLAGS.profile_dir)
    if FLAGS.profile_dir and step == init_step + 20:
      jax.profiler.stop_trace()

    with time_tracker.record_time('train_step'):
      step_rng = random.fold_in(rng, step)
      state, stats, _ = train_step(step_rng, state, batch, scalar_params)
      if step % train_config.print_every == 0:
        stats = jax.device_get(stats)  # sync for honest timing
      time_tracker.toc('total')

    if step % train_config.print_every == 0 and jax.process_index() == 0:
      logging.info('step=%d, warp_alpha=%.04f, time_alpha=%.04f, %s', step,
                   warp_alpha_sched(step), time_alpha_sched(step),
                   time_tracker.summary_str('last'))
      for branch in ('coarse', 'fine'):
        if branch in stats:
          metrics_str = ', '.join(
              f'{k}={np.asarray(v).mean():.04f}'
              for k, v in stats[branch].items())
          logging.info('\t%s metrics: %s', branch, metrics_str)

    if step % train_config.save_every == 0:
      # All processes participate: orbax's save/finalize barriers are
      # collective in multi-host runs (it gates the actual writes on the
      # primary host internally). Host-0-only calls would deadlock a pod.
      checkpoints.save_checkpoint(checkpoint_dir, state)

    if step % train_config.log_every == 0 and jax.process_index() == 0:
      _log_to_tensorboard(summary_writer, state, scalar_params,
                          jax.device_get(stats),
                          time_dict=time_tracker.summary('mean'))
      time_tracker.reset()

    if step % train_config.histogram_every == 0 and jax.process_index() == 0:
      _log_histograms(summary_writer, model, state)

    time_tracker.tic('data', 'total')

  if step >= init_step and step % train_config.save_every != 0:
    checkpoints.save_checkpoint(checkpoint_dir, state)


if __name__ == '__main__':
  app.run(main)
