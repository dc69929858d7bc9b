"""Imports the upstream reference implementation for golden parity tests.

The reference (/root/reference) predates current flax/gin: `flax.optim`
no longer exists and `gin-config` is not installed. Both are only needed
at import time (type annotations / decorator registration), so minimal
stubs are installed before importing -- the reference MATH then runs
unmodified, giving true goldens to compare the rebuild against.

Tests using this must skip gracefully when the reference tree is absent
(the repo's suite stands alone).
"""

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path('/root/reference')

_cache = None


def reference_available() -> bool:
  return (REFERENCE_ROOT / 'nerfies' / 'model_utils.py').exists()


def _install_stubs():
  import flax
  import jax.numpy as jnp
  # The reference calls jnp.broadcast_to with a Python list first argument
  # (model_utils.py:107); jax >= 0.5 rejects non-arrays. Coerce lists --
  # semantically identical, lets the unmodified reference run.
  if not getattr(jnp.broadcast_to, '_accepts_lists', False):
    original = jnp.broadcast_to

    def broadcast_to(arr, shape):
      if isinstance(arr, (list, tuple)):
        import numpy as np
        arr = np.asarray(arr)
      return original(arr, shape)

    broadcast_to._accepts_lists = True
    jnp.broadcast_to = broadcast_to
  if 'flax.optim' not in sys.modules:
    fake_optim = types.ModuleType('flax.optim')
    fake_optim.Optimizer = type('Optimizer', (), {})
    flax.optim = fake_optim
    sys.modules['flax.optim'] = fake_optim
  if 'gin' not in sys.modules:
    fake_gin = types.ModuleType('gin')

    def configurable(*args, **kwargs):
      if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]
      return lambda fn: fn

    fake_gin.configurable = configurable
    fake_config = types.ModuleType('gin.config')
    fake_config.external_configurable = lambda fn, *a, **k: fn
    fake_gin.config = fake_config
    fake_gin.constant = lambda *a, **k: None
    fake_gin.REQUIRED = object()
    sys.modules['gin'] = fake_gin
    sys.modules['gin.config'] = fake_config


def load_reference():
  """Returns the imported upstream `nerfies` package (cached)."""
  global _cache
  if _cache is not None:
    return _cache
  if not reference_available():
    raise ImportError('reference tree not available')
  if str(REFERENCE_ROOT) not in sys.path:
    sys.path.insert(0, str(REFERENCE_ROOT))
  _install_stubs()
  import nerfies  # noqa: F401
  from nerfies import model_utils  # noqa: F401
  from nerfies import modules  # noqa: F401
  from nerfies import quaternion  # noqa: F401
  from nerfies import rigid_body  # noqa: F401
  from nerfies import training  # noqa: F401
  from nerfies import utils  # noqa: F401
  from nerfies import warping  # noqa: F401
  _cache = nerfies
  return _cache
