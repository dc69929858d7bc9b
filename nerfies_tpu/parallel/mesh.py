"""Device mesh + sharding helpers.

The reference distributes with `jax.pmap(axis_name='batch')` and manual
replicate/shard/unshard plumbing (/root/reference/train.py:254-262,
/root/reference/nerfies/utils.py:334-351). The TPU-native path instead uses
one `jax.sharding.Mesh` with `jit`-level shardings: parameters are
replicated, the ray batch is sharded on its leading axis, and XLA inserts
the gradient all-reduce over ICI automatically. The same code path scales
from 1 chip to a pod slice (and to multi-host: each process feeds its local
shard of the global batch).
"""

import math
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

BATCH_AXIS = 'batch'


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = BATCH_AXIS) -> Mesh:
  """Creates a 1-D data-parallel mesh over all (or given) devices.

  Devices are ordered process-contiguously (process 0's devices first),
  so that a batch sharded on the mesh axis assigns each process the
  contiguous slice of global rows that `iterator_from_pool` feeds it and
  that `jax.make_array_from_process_local_data` expects. The only
  collective on a 1-D DP mesh is the gradient all-reduce, whose cost is
  order-independent, so nothing is lost vs a physical ring ordering.
  """
  import numpy as np
  if devices is None:
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
  return Mesh(np.asarray(devices).reshape(-1), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
  """Sharding for ray batches: leading axis split across the mesh."""
  return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  """Sharding for parameters/optimizer state: fully replicated."""
  return NamedSharding(mesh, P())


def shard_batch(batch, sharding: NamedSharding):
  """Places a host batch onto devices with the given sharding.

  Single-process: a plain device_put of the (host == global) batch.
  Multi-process: each leaf is this host's contiguous slice of the global
  batch (see `iterator_from_pool`'s per-host slicing); the slices are
  assembled into one global jax.Array via
  `jax.make_array_from_process_local_data`, which places each host's rows
  on its local devices (parity with the reference's per-host feeding,
  /root/reference/train.py:153, evaluation.py:81-84).
  """
  if jax.process_count() == 1:
    return jax.device_put(batch, sharding)
  import numpy as np
  return jax.tree.map(
      lambda x: jax.make_array_from_process_local_data(
          sharding, np.asarray(x)),
      batch)


def pad_to_multiple(n: int, multiple: int) -> int:
  """Rays needed to pad `n` up to a device-divisible count."""
  return (multiple - n % multiple) % multiple


def local_batch_slice(global_batch_size: int) -> slice:
  """This host's slice of a globally-indexed batch (multi-host input)."""
  per_host = global_batch_size // jax.process_count()
  start = jax.process_index() * per_host
  return slice(start, start + per_host)
