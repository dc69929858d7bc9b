"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md test strategy: multi-device semantics are validated on
CPU via XLA's host-platform device-count override so the TPU mesh code paths
(shardings, collectives) compile and execute without TPU hardware.

NOTE: this environment's sitecustomize registers the TPU PJRT plugin and
force-selects it with `jax.config.update('jax_platforms', ...)`, which beats
the JAX_PLATFORMS env var -- tests must override at the config level too or
they silently run over the TPU tunnel.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') +
    ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_threefry_partitionable', True)

# Persistent compilation cache: dramatically speeds up repeated test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)
