"""CLI: raw capture video -> nerfies dataset directory, end to end.

Script form of the full Nerfies_Capture_Processing notebook
(/root/reference/notebooks/Nerfies_Capture_Processing.ipynb): ffmpeg frame
extraction with duplicate dropping (cell 9), COLMAP SfM (cells 13-15),
optional face-landmark metric normalization (cells 23-25, requires
`mediapipe`), then scene/near-far/orbit computation and dataset writing.

  python scripts/process_video.py \
      --video /path/to/capture.mp4 \
      --workspace /path/to/work \
      --output_dir /path/to/dataset

Requires the `ffmpeg` and `colmap` binaries on PATH (override with
--ffmpeg_binary / --colmap_binary).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from absl import app
from absl import flags

from nerfies_tpu import capture
from nerfies_tpu import image_utils
from nerfies_tpu import video as video_lib
from nerfies_tpu.colmap import runner

flags.DEFINE_string('video', None, 'Source video file.')
flags.DEFINE_string('workspace', None,
                    'Working directory (frames + COLMAP outputs).')
flags.DEFINE_string('output_dir', None, 'Dataset output directory.')
flags.DEFINE_integer('fps', -1, 'Extraction FPS; -1 auto-computes.')
flags.DEFINE_integer('target_num_frames', 100,
                     'Approximate frame budget for auto-FPS.')
flags.DEFINE_float('max_scale', 1.0, 'Downscale frames during extraction.')
flags.DEFINE_float('val_fraction', 0.2, 'Validation holdout fraction.')
flags.DEFINE_float('blur_keep_percentile', 95.0,
                   'Keep this percentile of sharpest frames.')
flags.DEFINE_enum('match_method', 'exhaustive',
                  ['exhaustive', 'vocab_tree'], 'COLMAP matcher.')
flags.DEFINE_string('vocab_tree_path', None,
                    'Vocabulary tree for vocab_tree matching.')
flags.DEFINE_boolean('use_face', False,
                     'Face-landmark metric normalization (mediapipe).')
flags.DEFINE_string('ffmpeg_binary', 'ffmpeg', 'ffmpeg executable.')
flags.DEFINE_string('colmap_binary', 'colmap', 'colmap executable.')
flags.mark_flags_as_required(['video', 'workspace', 'output_dir'])
FLAGS = flags.FLAGS


def main(argv):
  del argv
  workspace = Path(FLAGS.workspace)
  frames_dir = workspace / 'rgb-raw'

  frames = video_lib.extract_frames(
      FLAGS.video, frames_dir, fps=FLAGS.fps,
      target_num_frames=FLAGS.target_num_frames,
      max_scale=FLAGS.max_scale, ffmpeg_binary=FLAGS.ffmpeg_binary,
      overwrite=False)
  print(f'Extracted {len(frames)} frames to {frames_dir}')

  model_dir = runner.run_sfm(
      frames_dir, workspace / 'colmap',
      colmap_binary=FLAGS.colmap_binary,
      match_method=FLAGS.match_method,
      vocab_tree_path=FLAGS.vocab_tree_path)
  print(f'COLMAP model at {model_dir}')

  images = {p.stem: image_utils.load_image(p) for p in frames}

  face_landmarks = None
  if FLAGS.use_face:
    face_landmarks = {}
    for item_id, image in images.items():
      landmarks = capture.compute_face_landmarks(image)
      if landmarks is not None:
        face_landmarks[item_id] = landmarks
    print(f'Found face landmarks in {len(face_landmarks)} frames')

  out = capture.process_capture(
      model_dir, images, FLAGS.output_dir,
      val_fraction=FLAGS.val_fraction,
      blur_keep_percentile=FLAGS.blur_keep_percentile,
      face_landmarks=face_landmarks)
  print(f'Wrote dataset to {out}')


if __name__ == '__main__':
  app.run(main)
