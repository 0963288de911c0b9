"""
Test configuration: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the TPU-native analogue of
the reference's mock Horovod backend, reference: utils/horovod.py:1-133).

Note: the environment boots with a TPU plugin pre-registered via
sitecustomize, and jax reads JAX_PLATFORMS at import; `jax.config.update`
after import is the reliable override.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compilation cache: the suite is dominated by XLA compiles,
# warm re-runs drop from ~18 min to a few minutes.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
