"""Continuous evaluation CLI for nerfies_tpu.

Surface parity with /root/reference/eval.py:58-419: a poll-for-checkpoint
daemon that renders validation/train/test views, computes PSNR and MS-SSIM
(pure-JAX, no TensorFlow), writes colorized depth/acc/error maps to
TensorBoard and PNGs, and rotates saved renders to the newest
`max_render_checkpoints`.
"""

import collections
import functools
import time

from absl import app
from absl import flags
from absl import logging
import jax
from jax import random
import jax.numpy as jnp
import numpy as np

from nerfies_tpu import camera as camera_lib
from nerfies_tpu import checkpoints
from nerfies_tpu import configs
from nerfies_tpu import datasets
from nerfies_tpu import evaluation
from nerfies_tpu import gpath
from nerfies_tpu import image_utils
from nerfies_tpu import lpips
from nerfies_tpu import minigin as gin
from nerfies_tpu import schedules
from nerfies_tpu import training
from nerfies_tpu import utils
from nerfies_tpu import visualization as viz
from nerfies_tpu.models import nerf as models
from nerfies_tpu.ops import mathutils
from nerfies_tpu.ops import ssim as ssim_lib
from nerfies_tpu.parallel import mesh as mesh_lib

flags.DEFINE_string('base_folder', None, 'where to store ckpts and logs')
flags.mark_flag_as_required('base_folder')
flags.DEFINE_string('data_dir', None, 'input data directory.')
flags.DEFINE_multi_string('gin_bindings', None, 'Gin parameter bindings.')
flags.DEFINE_multi_string('gin_configs', (), 'Gin config files.')
flags.DEFINE_bool('fast_preview', False,
                  'One-flag fast serving preset: 32+64 samples/ray, '
                  'occupancy-culled to 16+32 (equivalent to '
                  'EvalConfig.fast_preview = True; measured frame time '
                  'and quality delta in docs/PERFORMANCE.md).')
FLAGS = flags.FLAGS


def _make_summary_writer(summary_dir):
  try:
    from torch.utils.tensorboard import SummaryWriter
    return SummaryWriter(str(summary_dir))
  except ImportError:
    return None


def compute_multiscale_ssim(image1: np.ndarray, image2: np.ndarray) -> float:
  """MS-SSIM between two float images (JAX impl; parity eval.py:58-62).

  Small renders (e.g. image_scale 8 test configs) cannot support the full
  5 dyadic scales of the 11px window; rather than silently dropping the
  metric, fall back to the feasible scale count with renormalized power
  weights and log a warning.
  """
  num_scales = ssim_lib.max_feasible_scales(image1.shape[0], image1.shape[1])
  weights = ssim_lib.MSSSIM_WEIGHTS
  if num_scales == 0:
    logging.warning('Image %dx%d smaller than the SSIM window; skipping '
                    'MS-SSIM.', image1.shape[0], image1.shape[1])
    return float('nan')
  if num_scales < len(weights):
    logging.warning(
        'Image %dx%d too small for %d-scale MS-SSIM; using %d scales '
        '(renormalized weights).', image1.shape[0], image1.shape[1],
        len(weights), num_scales)
    truncated = weights[:num_scales]
    weights = tuple(w / sum(truncated) for w in truncated)
  return float(ssim_lib.multiscale_ssim(jnp.asarray(image1),
                                        jnp.asarray(image2),
                                        weights=weights))


def process_batch(*, batch, rng, state, tag, item_id, step, render_fn,
                  summary_writer, save_dir, datasource, chunk=8192,
                  lpips_fn=None):
  """Renders one example and logs metrics/images.

  Parity: reference eval.py:83-153. Batches carrying 'camera_params'
  (+ scalar metadata ids) render through the on-device ray-generation
  path (evaluation.render_camera: only camera params cross H2D); batches
  carrying prebuilt 'origins'/'directions' arrays use render_image.
  """
  if 'camera_params' in batch:
    camera = camera_lib.Camera(**batch['camera_params'])
    out = evaluation.render_camera(state, camera, batch['metadata'],
                                   render_fn, rng=rng, chunk=chunk)
  else:
    rays_dict = {
        'origins': batch['origins'],
        'directions': batch['directions'],
        'metadata': batch['metadata'],
    }
    out = evaluation.render_image(state, rays_dict, render_fn, rng=rng,
                                  chunk=chunk)
  rgb = np.asarray(out['rgb'])
  acc = np.asarray(out['acc'])
  depth_exp = np.asarray(out['depth'])
  depth_med = np.asarray(out['med_depth'])
  stats = {'render_time': out['render_time'],
           'rays_per_sec': out['rays_per_sec']}

  depth_norm = functools.partial(
      viz.colorize, cmin=datasource.near, cmax=datasource.far, cmap='turbo',
      invert=True)
  images = {
      'rgb': rgb,
      'acc': viz.colorize(acc, cmin=0.0, cmax=1.0),
      'depth_expected': depth_norm(depth_exp),
      'depth_median': depth_norm(depth_med),
  }

  if 'rgb' in batch:
    target = np.asarray(batch['rgb'][..., :3])
    mse = float(((rgb - target) ** 2).mean())
    stats['mse'] = mse
    stats['psnr'] = float(mathutils.compute_psnr(jnp.asarray(mse)))
    ms_ssim = compute_multiscale_ssim(target, rgb)
    if not np.isnan(ms_ssim):
      stats['ms_ssim'] = ms_ssim
    if lpips_fn is not None:
      key = 'lpips' if lpips_fn.calibrated else 'lpips_uncal'
      stats[key] = lpips_fn(target, rgb)
    abs_error = np.abs(target - rgb).mean(axis=-1)
    images['rgb_target'] = target
    images['error_abs'] = viz.colorize(abs_error, cmin=0.0, cmax=1.0)
    images['error_sq'] = viz.colorize(abs_error ** 2, cmin=0.0, cmax=1.0)

  if 'depth' in batch:
    # Depth MAE against ground-truth depth where defined (parity:
    # reference eval.py:137-140).
    gt_depth = np.asarray(batch['depth'])[..., 0]
    valid = gt_depth > 0
    if valid.any():
      stats['depth_mae'] = float(
          np.abs(depth_med - gt_depth)[valid].mean())
      images['depth_gt'] = depth_norm(gt_depth)

  if summary_writer is not None:
    for name, image in images.items():
      summary_writer.add_image(f'{tag}/{item_id}/{name}',
                               image, step, dataformats='HWC')
    for name in ('psnr', 'ms_ssim', 'lpips', 'lpips_uncal'):
      if name in stats:
        summary_writer.add_scalar(f'metrics/{tag}/{item_id}/{name}',
                                  stats[name], step)

  if save_dir is not None:
    item_dir = save_dir / tag / item_id
    item_dir.mkdir(parents=True, exist_ok=True)
    image_utils.save_image(item_dir / 'rgb.png',
                           image_utils.image_to_uint8(rgb))
    image_utils.save_image(item_dir / 'depth_median.png',
                           image_utils.image_to_uint8(
                               images['depth_median']))
    image_utils.save_depth(item_dir / 'depth_median_raw.png', depth_med)
    image_utils.save_image(item_dir / 'acc.png',
                           image_utils.image_to_uint8(images['acc']))

  logging.info('[%s/%s] %s', tag, item_id,
               ', '.join(f'{k}={v:.4f}' for k, v in stats.items()))
  return stats


def process_iterator(*, tag, item_ids, iterator, rng, state, step, render_fn,
                     summary_writer, save_dir, datasource, chunk=8192,
                     lpips_fn=None):
  """Renders a set of examples, aggregating metric means.

  Parity: reference eval.py:155-214.
  """
  meters = collections.defaultdict(utils.ValueMeter)
  for item_id, batch in zip(item_ids, iterator):
    stats = process_batch(
        batch=batch, rng=rng, state=state, tag=tag, item_id=item_id,
        step=step, render_fn=render_fn, summary_writer=summary_writer,
        save_dir=save_dir, datasource=datasource, chunk=chunk,
        lpips_fn=lpips_fn)
    for k, v in stats.items():
      meters[k].update(v)
  if summary_writer is not None:
    for k, meter in meters.items():
      summary_writer.add_scalar(f'metrics/{tag}/mean_{k}',
                                meter.reduce('mean'), step)
  return {k: meter.reduce('mean') for k, meter in meters.items()}


def delete_old_renders(render_dir, max_renders: int):
  """Keeps only the newest `max_renders` render checkpoints.

  Parity: reference eval.py:217-222.
  """
  render_dir = gpath.GPath(render_dir)
  if not render_dir.exists():
    return
  paths = sorted((p for p in render_dir.iterdir() if p.is_dir()),
                 key=lambda p: int(p.name))
  for path in paths[:-max_renders] if max_renders else paths:
    logging.info('Removing old renders: %s', str(path))
    path.rmtree()


def _draw_test_metadata(datasource, model_config, rng):
  """Random metadata ids for a novel-view camera.

  Parity: reference eval.py:168-194 draws random appearance/warp/camera ids
  per test render (we draw per camera instead of reusing one key, and fill
  `time` as float32 — the reference's uint32 fill at eval.py:190-193 is a
  documented bug).
  """
  metadata_ids = {}
  if model_config.use_warp:
    metadata_ids['warp'] = int(rng.choice(datasource.warp_ids))
  if model_config.use_appearance_metadata:
    metadata_ids['appearance'] = int(rng.choice(datasource.appearance_ids))
  if model_config.use_camera_metadata:
    metadata_ids['camera'] = int(rng.choice(datasource.camera_ids))
  if model_config.warp_metadata_encoder_type == 'time':
    metadata_ids['time'] = float(rng.uniform(0.0, 1.0))
  return metadata_ids


def _test_cameras_iterator(datasource, cameras, model_config, seed=20200823):
  """Camera batches for novel-view renders with random metadata ids.

  Rays are generated ON DEVICE (evaluation.render_camera); only the camera
  parameters and the scalar ids leave the host.
  """
  rng = np.random.default_rng(seed)
  for camera in cameras:
    metadata_ids = _draw_test_metadata(datasource, model_config, rng)
    logging.info('Test camera metadata: %s', metadata_ids)
    yield {
        'camera_params': camera.get_parameters(),
        'metadata': metadata_ids,
    }


def _camera_items_iterator(datasource, item_ids):
  """Eval batches as camera params + GT images (no host ray generation).

  Replaces the whole-image ray iterator for the val/train sweeps: the
  ground-truth RGB (and depth, when present) still loads for the metrics,
  but origins/directions never materialize on the host.
  """
  for item_id in item_ids:
    item = datasource.get_item(item_id)
    batch = {
        'camera_params': item['camera_params'],
        'metadata': item['metadata'],
        'rgb': image_utils.image_to_float32(item['rgb'][..., :3]),
    }
    if 'depth' in item:
      batch['depth'] = item['depth']
    yield batch


def main(argv):
  del argv
  gin.add_search_path('configs')
  gin.parse_config_files_and_bindings(
      config_files=FLAGS.gin_configs, bindings=FLAGS.gin_bindings)

  exp_config = configs.ExperimentConfig()
  model_config = configs.ModelConfig(use_stratified_sampling=False)
  train_config = configs.TrainConfig()
  eval_config = configs.EvalConfig()
  if FLAGS.fast_preview:
    eval_config.fast_preview = True
  if eval_config.fast_preview:
    # The fastest serving mode measured by scripts/serve_bench.py
    # (docs/serve_quality.json): 32+64 samples culled to 16+32 through
    # the occupancy grid. Explicit user settings win over the preset.
    if eval_config.num_coarse_samples is None:
      eval_config.num_coarse_samples = 32
    if eval_config.num_fine_samples is None:
      eval_config.num_fine_samples = 64
    eval_config.use_occupancy_culling = True
    if eval_config.occupancy_keep_coarse is None:
      eval_config.occupancy_keep_coarse = 16
    if eval_config.occupancy_keep_fine is None:
      eval_config.occupancy_keep_fine = 32
    logging.info('fast_preview: samples %d+%d, occupancy-culled to %d+%d.',
                 eval_config.num_coarse_samples,
                 eval_config.num_fine_samples,
                 eval_config.occupancy_keep_coarse,
                 eval_config.occupancy_keep_fine)

  exp_dir = gpath.GPath(FLAGS.base_folder)
  if exp_config.subname:
    exp_dir = exp_dir / exp_config.subname
  summary_dir = exp_dir / 'summaries' / 'eval'
  checkpoint_dir = exp_dir / 'checkpoints'
  render_root = exp_dir / 'renders'

  datasource_spec = exp_config.datasource_spec
  if datasource_spec is None:
    datasource_spec = {
        'type': exp_config.datasource_type,
        'data_dir': FLAGS.data_dir,
    }
  datasource = datasets.from_config(
      datasource_spec,
      image_scale=exp_config.image_scale,
      use_appearance_id=model_config.use_appearance_metadata,
      use_camera_id=model_config.use_camera_metadata,
      use_warp_id=model_config.use_warp,
      use_time=model_config.warp_metadata_encoder_type == 'time',
      # Frames with a depth/{scale}x map feed the depth-MAE metric; frames
      # without one simply skip it (load_depth returns None).
      use_depth=True,
      random_seed=exp_config.random_seed,
      **dict(exp_config.datasource_kwargs))

  rng = random.PRNGKey(exp_config.random_seed)
  rng, key = random.split(rng)
  if eval_config.num_coarse_samples is not None:
    model_config.num_coarse_samples = eval_config.num_coarse_samples
  if eval_config.num_fine_samples is not None:
    model_config.num_fine_samples = eval_config.num_fine_samples
  model, params = models.construct_nerf(
      key,
      model_config,
      batch_size=eval_config.chunk,
      appearance_ids=datasource.appearance_ids,
      camera_ids=datasource.camera_ids,
      warp_ids=datasource.warp_ids,
      near=datasource.near,
      far=datasource.far)

  warp_alpha_sched = schedules.from_config(train_config.warp_alpha_schedule)
  time_alpha_sched = schedules.from_config(train_config.time_alpha_schedule)
  state = training.create_train_state(params)

  mesh = mesh_lib.create_mesh()
  render_fn = evaluation.make_render_fn(model, mesh)

  occupancy_ok = False
  if eval_config.use_occupancy_culling:
    from nerfies_tpu import fast_render
    occupancy_ok = (not model.use_stratified_sampling
                    and fast_render.supported(model))
    if not occupancy_ok:
      logging.warning(
          'EvalConfig.use_occupancy_culling is set but the model is not '
          'covered by the fused serving path (fast_render.supported); '
          'rendering unculled.')

  def _bake_occupancy_render_fn(params):
    """Bakes an occupancy grid from this checkpoint's density field and
    returns a culling render fn (serving path; see occupancy.py)."""
    from nerfies_tpu import occupancy
    points = datasource.load_points()
    lo, hi = points.min(axis=0), points.max(axis=0)
    margin = (eval_config.occupancy_bbox_margin * float((hi - lo).max())
              + eval_config.occupancy_bbox_margin)
    level = 'fine' if model.num_fine_samples > 0 else 'coarse'
    interpret = jax.devices()[0].platform != 'tpu'
    sigma_fn = occupancy.sigma_fn_from_params(params, model, level=level,
                                              interpret=interpret)
    grid = occupancy.build_grid(
        sigma_fn, bbox_min=lo - margin, bbox_max=hi + margin,
        resolution=eval_config.occupancy_resolution,
        sigma_threshold=eval_config.occupancy_sigma_threshold)
    logging.info('Occupancy grid baked: %.1f%% occupied at %d^3.',
                 100.0 * float(np.asarray(grid.occupied).mean()),
                 eval_config.occupancy_resolution)
    return evaluation.make_render_fn(
        model, mesh, occupancy=grid,
        keep_samples=(eval_config.occupancy_keep_coarse,
                      eval_config.occupancy_keep_fine))

  lpips_fn = None
  if eval_config.compute_lpips:
    lpips_fn = lpips.LPIPS(weights_path=eval_config.lpips_weights)
    if not lpips_fn.calibrated:
      logging.warning(
          'No LPIPS weights file configured (EvalConfig.lpips_weights); '
          'reporting the seeded random-feature fallback as lpips_uncal.')

  summary_writer = _make_summary_writer(summary_dir) \
      if jax.process_index() == 0 else None

  val_ids = utils.strided_subset(datasource.val_ids,
                                 eval_config.num_val_eval)
  train_ids = utils.strided_subset(datasource.train_ids,
                                   eval_config.num_train_eval)
  test_cameras = datasource.load_test_cameras(
      count=eval_config.num_test_eval)

  last_step = 0
  while True:
    step = checkpoints.latest_checkpoint_step(checkpoint_dir)
    if step is None or step <= last_step:
      if eval_config.eval_once:
        break
      logging.info('No new checkpoint (last=%d); sleeping.', last_step)
      time.sleep(10)
      continue

    state = checkpoints.restore_checkpoint(checkpoint_dir, state)
    state = state.replace(
        warp_alpha=jnp.asarray(warp_alpha_sched(step), jnp.float32),
        time_alpha=jnp.asarray(time_alpha_sched(step), jnp.float32))
    logging.info('Evaluating checkpoint at step %d', step)
    if occupancy_ok:
      # The grid depends on the checkpoint's density field, so it (and
      # the render fn closing over it) re-bakes per checkpoint.
      render_fn = _bake_occupancy_render_fn(state.params)

    save_dir = (render_root / f'{step}') if eval_config.save_output else None

    def run_render(tag, ids):
      iterator = _camera_items_iterator(datasource, ids)
      return process_iterator(
          tag=tag, item_ids=ids, iterator=iterator, rng=rng, state=state,
          step=step, render_fn=render_fn,
          summary_writer=summary_writer, save_dir=save_dir,
          datasource=datasource, chunk=eval_config.chunk,
          lpips_fn=lpips_fn)

    if val_ids:
      run_render('val', val_ids)
    if train_ids:
      run_render('train', train_ids)
    if test_cameras:
      iterator = _test_cameras_iterator(datasource, test_cameras,
                                        model_config,
                                        seed=exp_config.random_seed + step)
      process_iterator(
          tag='test', item_ids=[f'{i:04d}' for i in range(len(test_cameras))],
          iterator=iterator, rng=rng, state=state, step=step,
          render_fn=render_fn, summary_writer=summary_writer,
          save_dir=save_dir, datasource=datasource, chunk=eval_config.chunk,
          lpips_fn=lpips_fn)

    if eval_config.save_output:
      delete_old_renders(render_root, eval_config.max_render_checkpoints)

    last_step = step
    if eval_config.eval_once:
      break


if __name__ == '__main__':
  app.run(main)
