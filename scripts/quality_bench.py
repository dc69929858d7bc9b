"""Converged-quality benchmark: train N steps on the textured synthetic
scene (real TPU or CPU mesh) and record the PSNR / MS-SSIM curve.

Produces docs/quality_curve.json — the reproducible "quality at N steps"
number that future rounds must not regress (see also the CI-sized floor
asserted by tests/test_quality_regression.py and the curve table in
docs/PERFORMANCE.md).

Usage (TPU, ~20k steps):
  python scripts/quality_bench.py --steps 20000 --eval_every 2000

The workload mirrors configs/tpu_quarterhd.gin semantics (SE(3) warp +
elastic 'weight' + background loss, bf16 matmuls, batch 6144,
128+128 samples) on a 384x288 high-frequency-textured, moving synthetic
capture (the earlier low-frequency 256x192 scene saturated at PSNR 25.0
by step 2000, flattening the curve into a useless constant).
"""

import argparse
import json
import pathlib
import sys
import time

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--steps', type=int, default=20000)
  parser.add_argument('--eval_every', type=int, default=2000)
  parser.add_argument('--batch_size', type=int, default=6144)
  parser.add_argument('--scene_dir', default='/tmp/quality_scene_env')
  parser.add_argument('--image_size', type=int, nargs=2,
                      default=(384, 288))
  parser.add_argument('--out', default='docs/quality_curve.json')
  parser.add_argument('--num_train', type=int, default=24)
  parser.add_argument('--texture_frequency', type=float, default=20.0,
                      help='procedural texture frequency; high enough that '
                           'the fit does NOT saturate within --steps (the '
                           'default easy scene converged by step 2000, '
                           'flattening the whole curve)')
  parser.add_argument('--motion_amplitude', type=float, default=0.15)
  parser.add_argument('--cameras_per_state', type=int, default=2,
                      help='training cameras per deformation state. 2 = '
                           'the validation-rig regime the reference '
                           'quantifies on (vrig configs): every state is '
                           'multi-view constrained, so novel-view PSNR '
                           'tracks the fit. 1 = monocular video, where '
                           'the warp can explain each frame without '
                           '3D-consistent geometry and val PSNR '
                           'saturates ~20 dB below train-view PSNR '
                           '(measured round 5, docs/PERFORMANCE.md).')
  parser.add_argument('--save_params', default='',
                      help='optional .npz path for the final params '
                           '(flattened tree) — feeds the occupancy-culled '
                           'serving bench (scripts/serve_bench.py)')
  parser.add_argument('--fused', action=argparse.BooleanOptionalAction,
                      default=True,
                      help='train through the fused Pallas custom-VJP MLP '
                           'kernels (the tpu_*.gin flagship path); the '
                           'recorded curve then doubles as end-to-end '
                           'gradient evidence for the fused path')
  parser.add_argument('--work_dir', default='/tmp/quality_bench_work',
                      help='orbax checkpoint dir: the full TrainState is '
                           'saved every eval so a wedged TPU RPC (observed '
                           'round 4, cost 70 min) loses at most one '
                           'eval-interval of work')
  parser.add_argument('--resume', action=argparse.BooleanOptionalAction,
                      default=True,
                      help='restore the latest --work_dir checkpoint and '
                           'the matching prefix of the existing --out '
                           'curve, then continue; --no-resume starts fresh')
  args = parser.parse_args()

  import bench as B
  from nerfies_tpu import checkpoints
  from nerfies_tpu import configs
  from nerfies_tpu import datasets
  from nerfies_tpu import evaluation
  from nerfies_tpu import image_utils
  from nerfies_tpu import schedules
  from nerfies_tpu import training
  from nerfies_tpu.datasets import core as datasets_core
  from nerfies_tpu.datasets import synthetic
  from nerfies_tpu.models import nerf
  from nerfies_tpu.ops import ssim as metrics_ops
  from nerfies_tpu.parallel import mesh as mesh_lib

  scene = pathlib.Path(args.scene_dir)
  if not (scene / 'dataset.json').exists():
    # env_background: a constant-white background collapses training
    # into exact rgb-sigmoid saturation (round-4 diagnosis) AND is
    # nothing like a real capture; the textured environment sphere
    # keeps every ray on learnable mid-range-color geometry.
    synthetic.write_synthetic_dataset(
        scene, num_train=args.num_train, num_val=2,
        image_size=tuple(args.image_size),
        motion_amplitude=args.motion_amplitude,
        texture_frequency=args.texture_frequency,
        cameras_per_state=args.cameras_per_state,
        env_background=True, num_points=16384)
    print('scene written', flush=True)

  datasource = datasets.from_config(
      {'type': 'nerfies', 'data_dir': str(scene)},
      image_scale=1, use_appearance_id=True, use_camera_id=True,
      use_warp_id=True, random_seed=0)

  model_config = B.model_config(use_bfloat16=True,
                                use_fused_mlp=args.fused,
                                use_fused_warp=args.fused)
  model_config.rgb_padding = 0.001  # as configs/tpu_*.gin
  train_config = configs.TrainConfig(
      batch_size=args.batch_size,
      use_elastic_loss=True,
      elastic_reduce_method='weight',
      elastic_loss_type='log_svals',
      use_background_loss=True)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=args.batch_size,
      appearance_ids=datasource.appearance_ids,
      camera_ids=datasource.camera_ids,
      warp_ids=datasource.warp_ids,
      near=datasource.near, far=datasource.far,
      use_warp_jacobian=True, use_weights=True)

  mesh = mesh_lib.create_mesh()
  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(
      training.create_train_state(params),
      mesh_lib.replicated_sharding(mesh))

  # Schedules as in the gpu_quarterhd family.
  lr_sched = schedules.from_config(
      ('exponential', 1e-3, 1e-4, args.steps))
  warp_alpha_sched = schedules.from_config(
      ('linear', 0.0, model_config.num_warp_freqs, min(args.steps, 80000)))
  elastic_sched = schedules.from_config(('constant', 1e-3))

  train_iter = datasource.create_iterator(
      datasource.train_ids, flatten=True, shuffle=True,
      batch_size=args.batch_size, prefetch_size=3)
  points = datasource.load_points(shuffle=True)
  points_iter = datasets_core.iterator_from_arrays(
      points, batch_size=min(len(points), 16384), shuffle=True, seed=0,
      prefetch_size=3)

  eval_config = B.model_config(use_bfloat16=True,
                               use_stratified_sampling=False)
  eval_config.rgb_padding = model_config.rgb_padding
  eval_model, _ = nerf.construct_nerf(
      jax.random.PRNGKey(0),
      eval_config,
      batch_size=8192,
      appearance_ids=datasource.appearance_ids,
      camera_ids=datasource.camera_ids,
      warp_ids=datasource.warp_ids,
      near=datasource.near, far=datasource.far)
  render_fn = evaluation.make_render_fn(eval_model, mesh)
  val_id = datasource.val_ids[0]
  val_item = next(iter(datasource.create_iterator(
      [val_id], batch_size=0, repeat=False)))
  val_rays = {'origins': val_item['origins'],
              'directions': val_item['directions'],
              'metadata': val_item['metadata']}
  val_rgb = val_item['rgb']
  # A train view as well: val frames reuse TRAIN metadata ids and their
  # GT shows that train frame's deformation state (synthetic.py), so
  # val PSNR is the true novel-view generalization signal while the
  # train-view render is the raw convergence signal.
  train_view_item = next(iter(datasource.create_iterator(
      [datasource.train_ids[0]], batch_size=0, repeat=False)))
  train_view_rays = {'origins': train_view_item['origins'],
                     'directions': train_view_item['directions'],
                     'metadata': train_view_item['metadata']}
  train_view_rgb = train_view_item['rgb']

  def eval_psnr(state):
    out = evaluation.render_image(state, val_rays, render_fn, chunk=8192)
    pred = np.clip(out['rgb'], 0, 1)
    mse = float(np.mean((pred - val_rgb) ** 2))
    psnr = -10.0 * np.log10(mse)
    # Renormalize the MS-SSIM power weights to the feasible scale count
    # (tiny smoke images can't fit all 5 dyadic scales).
    num_scales = metrics_ops.max_feasible_scales(*pred.shape[:2])
    weights = metrics_ops.MSSSIM_WEIGHTS[:num_scales]
    weights = tuple(w / sum(weights) for w in weights)
    # None (→ JSON null), never NaN: json.dumps would emit the non-RFC
    # `NaN` literal and corrupt the artifact (round-4 advisor finding).
    ssim = float(metrics_ops.multiscale_ssim(
        jax.numpy.asarray(pred), jax.numpy.asarray(val_rgb),
        weights=weights)) if num_scales else None
    return psnr, ssim, out

  def _write_result(curve, partial=False):
    result = {
        'workload': 'quarter-HD-class synthetic (textured, moving sphere)',
        'image_size': list(args.image_size),
        'batch_size': args.batch_size,
        'steps': args.steps,
        'device': jax.devices()[0].device_kind,
        'curve': curve,
    }
    if partial:
      result['partial'] = True
    # allow_nan=False: a non-finite value must fail loudly here, not
    # silently produce a file jq/JSON.parse reject.
    pathlib.Path(args.out).write_text(
        json.dumps(result, indent=2, allow_nan=False))

  rng = jax.random.PRNGKey(1)
  curve = []
  start_step = 0
  wall_offset = 0.0
  if args.resume:
    restored = checkpoints.restore_checkpoint(args.work_dir, state)
    ckpt_step = checkpoints.latest_checkpoint_step(args.work_dir)
    if ckpt_step:
      state = jax.device_put(restored, mesh_lib.replicated_sharding(mesh))
      start_step = int(ckpt_step)
      out_path = pathlib.Path(args.out)
      if out_path.exists():
        prior = json.loads(out_path.read_text())
        curve = [row for row in prior.get('curve', [])
                 if row['step'] <= start_step]
      if curve:
        wall_offset = curve[-1].get('wall_s', 0.0)
      print(f'resumed from step {start_step} '
            f'({len(curve)} prior evals)', flush=True)
  stats = None
  prev_pred = None
  t_start = time.time()
  for step in range(start_step + 1, args.steps + 1):
    batch = next(train_iter)
    batch['background_points'] = next(points_iter)
    sp = training.ScalarParams(
        learning_rate=lr_sched(step),
        elastic_loss_weight=elastic_sched(step),
        background_loss_weight=1.0)
    state = state.replace(warp_alpha=jax.numpy.asarray(
        warp_alpha_sched(step), jax.numpy.float32))
    state, stats, _ = step_fn(jax.random.fold_in(rng, step), state,
                              batch, sp)
    if step % args.eval_every == 0 or step == args.steps:
      loss = float(jax.device_get(stats['fine']['loss/rgb']))
      if not np.isfinite(loss):
        print(f'step {step}: NON-FINITE loss {loss}', flush=True)
        sys.exit(1)
      psnr, ssim, out = eval_psnr(state)
      tout = evaluation.render_image(state, train_view_rays, render_fn,
                                     chunk=8192)
      tpred = np.clip(np.asarray(tout['rgb']), 0, 1)
      tv_psnr = -10.0 * np.log10(float(np.mean(
          (tpred - train_view_rgb) ** 2)))
      wall = wall_offset + (time.time() - t_start)
      pred = np.clip(np.asarray(out['rgb']), 0, 1)
      # Render-freshness diagnostic: a converging fit must show the
      # rendered validation view actually changing between evals; a
      # zero delta means the eval path is reading stale state. None
      # (not NaN) when there is no previous render to diff against.
      delta = (round(float(np.abs(pred - prev_pred).mean()), 8)
               if prev_pred is not None else None)
      prev_pred = pred
      curve.append({'step': step, 'val_psnr': round(psnr, 5),
                    'train_view_psnr': round(tv_psnr, 5),
                    'val_ms_ssim': (round(ssim, 6)
                                    if ssim is not None else None),
                    'train_loss': round(loss, 6),
                    'render_delta': delta,
                    'warp_alpha': round(float(warp_alpha_sched(step)), 3),
                    'wall_s': round(wall, 1)})
      print(json.dumps(curve[-1]), flush=True)
      # Write the artifact incrementally: an axon-tunnel RPC can wedge
      # mid-run (observed round 4) and a 90-minute fit must not lose its
      # curve to a hang at step 16k.
      _write_result(curve, partial=True)
      # Checkpoint the full TrainState so --resume restarts from here.
      checkpoints.save_checkpoint(args.work_dir, state, step=step, keep=2)
      if args.save_params:
        _save_params(args.save_params, state)

  _write_result(curve)
  print(f'wrote {args.out}', flush=True)

  if args.save_params:
    _save_params(args.save_params, state)
    print(f'saved params to {args.save_params}', flush=True)


def _save_params(path, state):
  """Flattened params PLUS the annealing alphas.

  The warp PE window (state.warp_alpha) is part of the trained function:
  rendering a converged fit with alpha=0 crushes every non-zero warp code
  (measured: sphere PSNR 19.3 -> garbage on a mid-orbit train view) —
  consumers (scripts/serve_bench.py) must restore it, as eval.py does via
  the schedule."""
  import numpy as np
  from flax import traverse_util
  import jax
  flat = traverse_util.flatten_dict(jax.device_get(state.params), sep='/')
  flat['__warp_alpha__'] = np.asarray(jax.device_get(state.warp_alpha))
  flat['__time_alpha__'] = np.asarray(jax.device_get(state.time_alpha))
  np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


if __name__ == '__main__':
  main()
