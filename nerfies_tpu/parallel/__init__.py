"""SPMD utilities: device meshes, shardings, sharded step compilation."""

from nerfies_tpu.parallel.mesh import batch_sharding
from nerfies_tpu.parallel.mesh import create_mesh
from nerfies_tpu.parallel.mesh import pad_to_multiple
from nerfies_tpu.parallel.mesh import replicated_sharding
from nerfies_tpu.parallel.mesh import shard_batch
