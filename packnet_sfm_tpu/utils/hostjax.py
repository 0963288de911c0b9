"""
Force JAX onto the host CPU for offline tooling.

This environment pre-registers the TPU platform via sitecustomize and
re-sets JAX_PLATFORMS, so a plain environment variable is NOT a reliable
override; updating jax.config after import is (the same pattern
tests/conftest.py uses for the virtual-device suite). Offline host tools —
precomputed-output evaluators, data converters, visualization — must never
contend for (or block on) the TPU: backend initialization waits on the
device tunnel, and a busy chip turns a seconds-long metrics pass into a
multi-minute hang (reference analogue: the offline scripts under
scripts/evaluation/ run torch-CPU, never claiming the training GPU).

Call force_cpu() BEFORE importing any module that touches jax devices.
"""

import os


def force_cpu():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass  # backend already initialized; env var was honored or it's live
