"""CLI: render a novel-view video along a saved camera path.

Script form of the reference's Nerfies_Render_Video notebook
(/root/reference/notebooks/Nerfies_Render_Video.ipynb cells 9-11): loads
the newest checkpoint, walks a camera-paths/<trajectory> directory, renders
each frame with fixed metadata ids, and writes PNG frames (+ mp4 when
imageio-ffmpeg is present).

  python scripts/render_video.py \
      --base_folder /path/to/experiment --data_dir /path/to/dataset \
      --gin_configs configs/gpu_quarterhd.gin --camera_path orbit-mild
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from absl import app
from absl import flags
import jax
from jax import random
import numpy as np

from nerfies_tpu import checkpoints
from nerfies_tpu import configs
from nerfies_tpu import datasets
from nerfies_tpu import evaluation
from nerfies_tpu import image_utils
from nerfies_tpu import minigin as gin
from nerfies_tpu import schedules
from nerfies_tpu import training
from nerfies_tpu.models import nerf as models
from nerfies_tpu.parallel import mesh as mesh_lib

flags.DEFINE_string('base_folder', None, 'experiment directory')
flags.DEFINE_string('data_dir', None, 'dataset directory')
flags.DEFINE_multi_string('gin_configs', (), 'Gin config files.')
flags.DEFINE_multi_string('gin_bindings', None, 'Gin parameter bindings.')
flags.DEFINE_string('camera_path', 'orbit-mild', 'camera-paths subdir name')
flags.DEFINE_integer('warp_id', 0, 'fixed warp metadata id')
flags.DEFINE_integer('appearance_id', 0, 'fixed appearance metadata id')
flags.DEFINE_integer('camera_id', 0, 'fixed camera metadata id')
flags.DEFINE_integer('chunk', 8192, 'rays per render dispatch')
flags.DEFINE_string('output_dir', None,
                    'output dir (default <base_folder>/video)')
flags.mark_flags_as_required(['base_folder', 'data_dir'])
FLAGS = flags.FLAGS


def main(argv):
  del argv
  gin.add_search_path('configs')
  gin.parse_config_files_and_bindings(
      config_files=FLAGS.gin_configs, bindings=FLAGS.gin_bindings)
  exp_config = configs.ExperimentConfig()
  model_config = configs.ModelConfig(use_stratified_sampling=False)
  train_config = configs.TrainConfig()

  datasource = datasets.from_config(
      {'type': exp_config.datasource_type, 'data_dir': FLAGS.data_dir},
      image_scale=exp_config.image_scale,
      use_appearance_id=model_config.use_appearance_metadata,
      use_camera_id=model_config.use_camera_metadata,
      use_warp_id=model_config.use_warp,
      use_time=model_config.warp_metadata_encoder_type == 'time',
      random_seed=exp_config.random_seed,
      test_camera_trajectory=FLAGS.camera_path)

  rng = random.PRNGKey(exp_config.random_seed)
  model, params = models.construct_nerf(
      rng, model_config, batch_size=FLAGS.chunk,
      appearance_ids=datasource.appearance_ids or (0,),
      camera_ids=datasource.camera_ids or (0,),
      warp_ids=datasource.warp_ids or (0,),
      near=datasource.near, far=datasource.far)

  checkpoint_dir = Path(FLAGS.base_folder) / 'checkpoints'
  state = training.create_train_state(params)
  state = checkpoints.restore_checkpoint(checkpoint_dir, state)
  step = int(jax.device_get(state.step))
  warp_alpha = schedules.from_config(train_config.warp_alpha_schedule)(step)
  state = state.replace(warp_alpha=np.float32(warp_alpha))
  print(f'Restored checkpoint at step {step}')

  cameras = datasource.load_test_cameras()
  if not cameras:
    raise ValueError(f'No cameras found for path {FLAGS.camera_path!r}')
  print(f'Rendering {len(cameras)} frames')

  mesh = mesh_lib.create_mesh()
  render_fn = evaluation.make_render_fn(model, mesh)
  out_dir = Path(FLAGS.output_dir or Path(FLAGS.base_folder) / 'video')
  out_dir.mkdir(parents=True, exist_ok=True)

  # Rays are generated ON DEVICE from the camera parameters
  # (evaluation.render_camera): per frame the host uploads ~60 B of
  # camera params + 4 metadata scalars instead of 24 B/ray, and frames
  # share one compiled program as long as the camera resolution is
  # constant (the reference's host path:
  # /root/reference/nerfies/datasets/core.py:50-75 per frame).
  metadata_ids = {
      'warp': FLAGS.warp_id,
      'appearance': FLAGS.appearance_id,
      'camera': FLAGS.camera_id,
      'time': 0.0,
  }
  frames = []
  for i, camera in enumerate(cameras):
    out = evaluation.render_camera(
        state, camera, metadata_ids, render_fn, chunk=FLAGS.chunk)
    frame = image_utils.image_to_uint8(np.asarray(out['rgb']))
    image_utils.save_image(out_dir / f'{i:06d}.png', frame)
    frames.append(frame)
    print(f'frame {i}: {out["rays_per_sec"]:.0f} rays/s')

  try:
    import imageio.v2 as imageio
    imageio.mimwrite(out_dir / 'video.mp4', frames, fps=20)
    print(f'Wrote {out_dir / "video.mp4"}')
  except Exception as e:  # mp4 writer is optional
    print(f'Skipping mp4 ({e}); PNG frames are in {out_dir}')


if __name__ == '__main__':
  app.run(main)
