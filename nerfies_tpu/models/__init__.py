"""Model layer: NeRF MLPs, warp fields, embeddings."""

from nerfies_tpu.models.glo import GloEncoder
from nerfies_tpu.models.modules import MLP
from nerfies_tpu.models.modules import NerfMLP
from nerfies_tpu.models.modules import SplitDense
from nerfies_tpu.models.modules import TimeEncoder
from nerfies_tpu.models.nerf import construct_nerf
from nerfies_tpu.models.nerf import NerfModel
from nerfies_tpu.models.warping import create_warp_field
from nerfies_tpu.models.warping import SE3Field
from nerfies_tpu.models.warping import TranslationField
