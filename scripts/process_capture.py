"""CLI: convert a COLMAP reconstruction + frames into a nerfies dataset.

Script form of the reference's Nerfies_Capture_Processing notebook (after
COLMAP has run; see the notebook for the ffmpeg/COLMAP invocation recipe,
which requires the `colmap` binary):

  python scripts/process_capture.py \
      --colmap_dir /path/to/capture/sparse/0 \
      --images_dir /path/to/capture/rgb-raw \
      --output_dir /path/to/dataset
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from absl import app
from absl import flags

from nerfies_tpu import capture
from nerfies_tpu import image_utils

flags.DEFINE_string('colmap_dir', None, 'COLMAP sparse model directory.')
flags.DEFINE_string('images_dir', None, 'Directory of source frames.')
flags.DEFINE_string('output_dir', None, 'Dataset output directory.')
flags.DEFINE_float('val_fraction', 0.2, 'Validation holdout fraction.')
flags.DEFINE_float('blur_keep_percentile', 95.0,
                   'Keep this percentile of sharpest frames.')
flags.DEFINE_integer('orbit_frames', 60, 'Frames per orbit camera path.')
flags.mark_flags_as_required(['colmap_dir', 'images_dir', 'output_dir'])
FLAGS = flags.FLAGS


def main(argv):
  del argv
  images_dir = Path(FLAGS.images_dir)
  images = {}
  for path in sorted(images_dir.iterdir()):
    if path.suffix.lower() in ('.png', '.jpg', '.jpeg'):
      images[path.stem] = image_utils.load_image(path)
  print(f'Loaded {len(images)} frames from {images_dir}')

  out = capture.process_capture(
      FLAGS.colmap_dir,
      images,
      FLAGS.output_dir,
      val_fraction=FLAGS.val_fraction,
      blur_keep_percentile=FLAGS.blur_keep_percentile,
      orbit_frames=FLAGS.orbit_frames)
  print(f'Wrote dataset to {out}')


if __name__ == '__main__':
  app.run(main)
