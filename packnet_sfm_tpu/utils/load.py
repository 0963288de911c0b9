"""
Partial / prefix-tolerant parameter loading
(reference: packnet_sfm/utils/load.py:114-198 load_network +
backwards_state_dict): merge a saved param tree into a freshly-initialized
one, keeping shapes that match, reporting what was skipped.
"""

import numpy as np
import jax.numpy as jnp


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def load_network(init_params, saved_params, prefixes=('', 'model.', 'module.'),
                 verbose=True):
    """
    Merge `saved_params` into `init_params`: keys that exist in both with
    matching shapes are taken from the checkpoint; everything else keeps its
    initialization. Returns (merged_tree, n_loaded, n_total).
    """
    init_flat = _flatten(init_params)
    saved_flat = _flatten(saved_params)
    # allow a common leading component to differ (prefix tolerance)
    saved_by_suffix = {}
    for path, v in saved_flat.items():
        saved_by_suffix[path] = v
        for cut in range(1, min(2, len(path))):
            saved_by_suffix.setdefault(path[cut:], v)

    merged, loaded = {}, 0
    for path, v in init_flat.items():
        cand = saved_by_suffix.get(path)
        if cand is not None and np.shape(cand) == np.shape(v):
            merged[path] = jnp.asarray(cand)
            loaded += 1
        else:
            merged[path] = v
    if verbose:
        print('[load_network] loaded {}/{} tensors'.format(loaded,
                                                           len(init_flat)))
    return _unflatten(merged), loaded, len(init_flat)
