"""Video-to-frames extraction for capture processing.

Script form of the reference capture notebook's "Flatten into images" step
(/root/reference/notebooks/Nerfies_Capture_Processing.ipynb cell 9): probe
the clip, pick an extraction FPS that lands near a target frame count, and
run ffmpeg with an `mpdecimate` filter so near-duplicate frames (phone
captures pause a lot) are dropped before SfM ever sees them.

ffmpeg runs as a subprocess; nothing here needs a GPU or TPU.
"""

import math
import re
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple


class VideoInfo:
  """Probed clip properties."""

  def __init__(self, fps: float, num_frames: int, width: int, height: int):
    self.fps = fps
    self.num_frames = num_frames
    self.width = width
    self.height = height

  def __repr__(self):
    return (f'VideoInfo(fps={self.fps}, num_frames={self.num_frames}, '
            f'size={self.width}x{self.height})')


def probe_video(video_path) -> VideoInfo:
  """Reads fps/frame-count/size from the container via OpenCV."""
  import cv2
  cap = cv2.VideoCapture(str(video_path))
  try:
    if not cap.isOpened():
      raise IOError(f'Could not open video {video_path}')
    return VideoInfo(
        fps=float(cap.get(cv2.CAP_PROP_FPS)),
        num_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
  finally:
    cap.release()


def compute_extraction_fps(input_fps: float, num_frames: int,
                           target_num_frames: int) -> int:
  """Extraction rate that yields ~`target_num_frames` frames.

  Mirrors the notebook's auto-FPS rule (`fps = target/total * input_fps`);
  raises if the clip is shorter than the target, as the notebook does.
  """
  if num_frames < target_num_frames:
    raise ValueError(
        f'Video has {num_frames} frames, fewer than the target '
        f'{target_num_frames}.')
  return max(1, int(target_num_frames / num_frames * input_fps))


def extraction_filters(max_scale: float = 1.0) -> str:
  """The ffmpeg -vf chain: duplicate-drop, PTS reset, optional scaling."""
  filters = ['mpdecimate', 'setpts=N/FRAME_RATE/TB']
  if max_scale != 1.0:
    filters.append(f'scale=iw*{max_scale}:ih*{max_scale}')
  return ','.join(filters)


def extract_frames(video_path,
                   out_dir,
                   fps: int = -1,
                   target_num_frames: int = 100,
                   max_scale: float = 1.0,
                   ffmpeg_binary: str = 'ffmpeg',
                   overwrite: bool = False) -> Sequence[Path]:
  """Flattens a video into PNG frames named %06d.png under `out_dir`.

  Args:
    video_path: source clip.
    out_dir: output directory for the frames.
    fps: extraction rate; -1 auto-computes from `target_num_frames`.
    target_num_frames: approximate frame budget for auto-FPS.
    max_scale: spatial downscale applied during extraction.
    ffmpeg_binary: the ffmpeg executable to invoke.
    overwrite: allow writing into a non-empty `out_dir`.

  Returns:
    Sorted list of written frame paths.
  """
  out_dir = Path(out_dir)
  existing = sorted(out_dir.glob('*.png')) if out_dir.exists() else []
  if existing and not overwrite:
    raise FileExistsError(
        f'{out_dir} already has {len(existing)} frames; pass '
        f'overwrite=True to re-extract.')
  out_dir.mkdir(parents=True, exist_ok=True)

  if fps == -1:
    info = probe_video(video_path)
    fps = compute_extraction_fps(info.fps, info.num_frames,
                                 target_num_frames)

  cmd = [
      ffmpeg_binary, '-y', '-i', str(video_path),
      '-r', str(fps),
      '-vf', extraction_filters(max_scale),
      str(out_dir / '%06d.png'),
  ]
  subprocess.run(cmd, check=True, capture_output=True)
  frames = sorted(out_dir.glob('*.png'))
  if not frames:
    raise RuntimeError(f'ffmpeg produced no frames in {out_dir}')
  return frames
