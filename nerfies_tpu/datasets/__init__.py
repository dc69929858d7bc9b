"""Dataset registry and utilities."""

from nerfies_tpu.datasets.core import camera_to_rays
from nerfies_tpu.datasets.core import DataSource
from nerfies_tpu.datasets.core import iterator_from_arrays
from nerfies_tpu.datasets.core import load_camera
from nerfies_tpu.datasets.core import RayPool
from nerfies_tpu.datasets.nerfies import NerfiesDataSource


def from_config(spec, **kwargs):
  """Creates a datasource from a {'type': ..., ...} spec dict."""
  spec = dict(spec)
  ds_type = spec.pop('type')
  if ds_type == 'nerfies':
    return NerfiesDataSource(**spec, **kwargs)
  raise ValueError(f'Unknown datasource type {ds_type!r}')
