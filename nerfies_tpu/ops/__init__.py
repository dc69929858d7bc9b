"""TPU-native math and rendering kernels."""

from nerfies_tpu.ops import mathutils
from nerfies_tpu.ops import quaternion
from nerfies_tpu.ops import rendering
from nerfies_tpu.ops import rigid
from nerfies_tpu.ops import svd3
