"""
Name-based class registry — the functional equivalent of the reference's
dynamic module loader (reference: packnet_sfm/utils/load.py:79-111), done with
an explicit registry instead of filesystem scanning (jit-friendly and
import-cycle free).
"""

_REGISTRIES = {}


def register(kind, name=None):
    """Decorator: @register('depth_net') class ResNetSAN01: ..."""
    def wrap(cls):
        _REGISTRIES.setdefault(kind, {})[name or cls.__name__] = cls
        return cls
    return wrap


def lookup(kind, name):
    reg = _REGISTRIES.get(kind, {})
    if name not in reg:
        raise KeyError('Unknown {} "{}". Available: {}'.format(
            kind, name, sorted(reg)))
    return reg[name]


def available(kind):
    return sorted(_REGISTRIES.get(kind, {}))


def load_class(name, paths=None):
    """Reference-compatible alias: resolve a class by name over all kinds."""
    for reg in _REGISTRIES.values():
        if name in reg:
            return reg[name]
    raise KeyError('Unknown class {}'.format(name))
