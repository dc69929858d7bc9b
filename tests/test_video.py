"""Video frame extraction: fps policy, filter chain, ffmpeg invocation."""

import stat
from pathlib import Path

import numpy as np
import pytest

from nerfies_tpu import video


def test_compute_extraction_fps():
  # 300 frames at 30fps, target 100 -> 10 fps.
  assert video.compute_extraction_fps(30.0, 300, 100) == 10
  # Never rounds to zero.
  assert video.compute_extraction_fps(30.0, 1000, 10) == 1
  with pytest.raises(ValueError):
    video.compute_extraction_fps(30.0, 50, 100)


def test_extraction_filters():
  assert video.extraction_filters() == 'mpdecimate,setpts=N/FRAME_RATE/TB'
  assert video.extraction_filters(0.5).endswith('scale=iw*0.5:ih*0.5')


def _fake_ffmpeg(tmp_path, num_frames=3):
  """An executable that logs its argv and writes PNG frames."""
  from nerfies_tpu import image_utils
  png_path = tmp_path / 'pixel.png'
  image_utils.save_image(
      png_path, np.zeros((4, 4, 3), np.uint8))
  script = tmp_path / 'ffmpeg'
  script.write_text(
      '#!/bin/bash\n'
      f'echo "$@" > {tmp_path}/ffmpeg_args.txt\n'
      'out="${@: -1}"\n'
      f'for i in $(seq 1 {num_frames}); do\n'
      f'  cp {png_path} "$(printf "$out" $i)"\n'
      'done\n')
  script.chmod(script.stat().st_mode | stat.S_IEXEC)
  return script


def test_extract_frames_with_fake_ffmpeg(tmp_path):
  ffmpeg = _fake_ffmpeg(tmp_path)
  out_dir = tmp_path / 'frames'
  frames = video.extract_frames(
      'capture.mp4', out_dir, fps=5, ffmpeg_binary=str(ffmpeg))
  assert [f.name for f in frames] == [
      '000001.png', '000002.png', '000003.png']

  args = (tmp_path / 'ffmpeg_args.txt').read_text().split()
  assert args[args.index('-r') + 1] == '5'
  assert 'mpdecimate' in args[args.index('-vf') + 1]

  # Refuses to clobber existing frames unless overwrite is passed.
  with pytest.raises(FileExistsError):
    video.extract_frames('capture.mp4', out_dir, fps=5,
                         ffmpeg_binary=str(ffmpeg))
  frames = video.extract_frames('capture.mp4', out_dir, fps=5,
                                ffmpeg_binary=str(ffmpeg), overwrite=True)
  assert len(frames) == 3
