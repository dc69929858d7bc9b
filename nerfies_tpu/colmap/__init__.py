"""COLMAP interop: scene parsing, camera models, pose algebra, databases.

Capability parity with the reference's vendored pycolmap
(/root/reference/third_party/pycolmap), written fresh against the public
COLMAP file-format specification. Used by the offline capture-processing
pipeline (scripts/process_capture.py); never imported by train/eval.
"""

from nerfies_tpu.colmap.camera import ColmapCamera
from nerfies_tpu.colmap.database import COLMAPDatabase
from nerfies_tpu.colmap.image import Image
from nerfies_tpu.colmap.rotation import DualQuaternion
from nerfies_tpu.colmap.rotation import Quaternion
from nerfies_tpu.colmap.scene_manager import SceneManager
