"""Serving benchmark on a CONVERGED model: full render vs reduced-sample
preset vs occupancy-culled, with measured quality deltas.

Needs the params saved by `quality_bench.py --save_params` (a converged
fit of the quarter-HD-class workload on the textured synthetic scene).
Renders the held-out validation view through three serving modes and
records rays/s + PSNR/MS-SSIM against ground truth to
docs/serve_quality.json — the evidence behind docs/PERFORMANCE.md's
serving table.

Usage (TPU):
  python scripts/quality_bench.py --steps 20000 \
      --save_params /tmp/quality_params.npz
  python scripts/serve_bench.py --params /tmp/quality_params.npz
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
  parser.add_argument('--params', default='/tmp/quality_params.npz')
  parser.add_argument('--scene_dir', default='/tmp/quality_scene_env')
  parser.add_argument('--chunk', type=int, default=8192)
  parser.add_argument('--hd_chunk', type=int, default=32768,
                      help='ray chunk for the measured 1080p frame '
                           '(large chunks amortize per-chunk overhead; '
                           'see bench.py render_chunk_sweep)')
  parser.add_argument('--measure_1080p', action=argparse.BooleanOptionalAction,
                      default=True,
                      help='render a real 1920x1080 frame per mode '
                           '(on-device rays via render_camera) and record '
                           'the measured seconds/frame, not a projection')
  parser.add_argument('--grid_resolution', type=int, default=128)
  parser.add_argument('--sigma_threshold', type=float, default=0.05)
  parser.add_argument('--out', default='docs/serve_quality.json')
  args = parser.parse_args()

  import bench as B
  from flax import traverse_util
  from nerfies_tpu import datasets
  from nerfies_tpu import evaluation
  from nerfies_tpu import occupancy
  from nerfies_tpu import training
  from nerfies_tpu.models import nerf
  from nerfies_tpu.ops import ssim as metrics_ops
  from nerfies_tpu.parallel import mesh as mesh_lib

  data = np.load(args.params)
  # The annealing alphas ride along in the npz (quality_bench._save_params):
  # the warp PE window is part of the trained function and rendering with
  # alpha=0 crushes every non-zero warp code (measured: the whole serving
  # table lost 10+ dB before this restore existed).
  warp_alpha = float(data['__warp_alpha__']) if '__warp_alpha__' in data \
      else None
  time_alpha = float(data['__time_alpha__']) if '__time_alpha__' in data \
      else 0.0
  params = traverse_util.unflatten_dict(
      {k: data[k] for k in data.files if not k.startswith('__')}, sep='/')

  datasource = datasets.from_config(
      {'type': 'nerfies', 'data_dir': args.scene_dir},
      image_scale=1, use_appearance_id=True, use_camera_id=True,
      use_warp_id=True, random_seed=0)
  mesh = mesh_lib.create_mesh()

  def build_model(coarse, fine):
    config = B.model_config(use_bfloat16=True,
                            use_stratified_sampling=False)
    config.rgb_padding = 0.001  # as the quality_bench training config
    config.num_coarse_samples = coarse
    config.num_fine_samples = fine
    model, _ = nerf.construct_nerf(
        jax.random.PRNGKey(0), config, batch_size=8192,
        appearance_ids=datasource.appearance_ids,
        camera_ids=datasource.camera_ids,
        warp_ids=datasource.warp_ids,
        near=datasource.near, far=datasource.far)
    return model

  if warp_alpha is None:
    # Legacy npz without alphas: fall back to the fully-annealed window
    # (the quality_bench schedule reaches num_warp_freqs by 20k steps).
    warp_alpha = float(B.model_config().num_warp_freqs)
    print(f'params file has no __warp_alpha__; assuming fully-annealed '
          f'{warp_alpha}', flush=True)
  state = training.create_train_state(params, warp_alpha=warp_alpha,
                                      time_alpha=time_alpha)
  val_item = next(iter(datasource.create_iterator(
      [datasource.val_ids[0]], batch_size=0, repeat=False)))
  val_rays = {'origins': val_item['origins'],
              'directions': val_item['directions'],
              'metadata': val_item['metadata']}
  val_rgb = val_item['rgb']
  num_rays = int(np.prod(val_rgb.shape[:2]))

  # Occupancy box: the scene's COLMAP point cloud bounds + 20% margin
  # (covers everything the warp can reach at these amplitudes).
  points = datasource.load_points()
  lo, hi = points.min(axis=0), points.max(axis=0)
  margin = 0.2 * (hi - lo).max() + 0.2
  model_full = build_model(128, 128)
  sigma_fn = occupancy.sigma_fn_from_params(params, model_full,
                                            level='fine')
  t0 = time.perf_counter()
  grid = occupancy.build_grid(
      sigma_fn, bbox_min=lo - margin, bbox_max=hi + margin,
      resolution=args.grid_resolution,
      sigma_threshold=args.sigma_threshold)
  occ_frac = float(np.asarray(grid.occupied).mean())
  print(f'grid baked in {time.perf_counter()-t0:.1f}s, '
        f'{100*occ_frac:.1f}% occupied', flush=True)

  # A real 1080p novel-view camera on the same orbit as the capture;
  # rays are generated on device (render_camera), so the frame time
  # includes no host ray build or 24 B/ray upload.
  from nerfies_tpu.datasets import synthetic
  hd_camera = synthetic.make_orbit_camera(0.3, image_size=(1920, 1080))
  hd_metadata = {'warp': 0, 'camera': 0, 'appearance': 0, 'time': 0.0}

  def evaluate(tag, model, **render_kwargs):
    render_fn = evaluation.make_render_fn(model, mesh, **render_kwargs)
    evaluation.render_image(state, val_rays, render_fn,
                            chunk=args.chunk)  # compile
    out = evaluation.render_image(state, val_rays, render_fn,
                                  chunk=args.chunk)
    pred = np.clip(out['rgb'], 0, 1)
    mse = float(np.mean((pred - val_rgb) ** 2))
    psnr = -10.0 * np.log10(mse)
    num_scales = metrics_ops.max_feasible_scales(*pred.shape[:2])
    weights = metrics_ops.MSSSIM_WEIGHTS[:num_scales]
    weights = tuple(w / sum(weights) for w in weights)
    ssim = float(metrics_ops.multiscale_ssim(
        jax.numpy.asarray(pred), jax.numpy.asarray(val_rgb),
        weights=weights))
    rps = out['rays_per_sec']
    row = {'mode': tag, 'rays_per_sec': round(rps, 1),
           'psnr': round(psnr, 3), 'ms_ssim': round(ssim, 4)}
    if args.measure_1080p:
      evaluation.render_camera(state, hd_camera, hd_metadata, render_fn,
                               chunk=args.hd_chunk)  # compile
      hd = evaluation.render_camera(state, hd_camera, hd_metadata,
                                    render_fn, chunk=args.hd_chunk)
      row['measured_1080p_s'] = round(hd['render_time'], 3)
      row['hd_rays_per_sec'] = round(hd['rays_per_sec'], 1)
    else:
      row['projected_1080p_s'] = round(1920 * 1080 / rps, 3)
    print(json.dumps(row), flush=True)
    return row

  rows = [
      evaluate('full_256samples', model_full),
      evaluate('preset_32+64', build_model(32, 64)),
      evaluate('occupancy_128->32_+64->48', model_full,
               occupancy=grid, keep_samples=(32, 48)),
      evaluate('occupancy_preset_32->16_+64->32', build_model(32, 64),
               occupancy=grid, keep_samples=(16, 32)),
  ]

  result = {
      'scene': 'textured synthetic (quality_bench workload)',
      'image_rays': num_rays,
      'device': jax.devices()[0].device_kind,
      'grid': {'resolution': args.grid_resolution,
               'sigma_threshold': args.sigma_threshold,
               'occupied_fraction': round(occ_frac, 4)},
      'modes': rows,
  }
  pathlib.Path(args.out).write_text(json.dumps(result, indent=2))
  print(f'wrote {args.out}', flush=True)


if __name__ == '__main__':
  main()
