"""
Config parsing and preparation.

Reproduces the reference's config surface (reference: packnet_sfm/utils/config.py):
- default tree + YAML merge                    (utils/config.py:106-119)
- per-dataset list broadcasting (`prep_dataset`, utils/config.py:13-44)
- train-from-checkpoint config resume          (utils/config.py:181-193)
- test config = defaults <- ckpt config <- optional YAML override
                                               (utils/config.py:283-332)
- checkpoint filename templating               (utils/config.py:94-96)
"""

import os

from packnet_sfm_tpu.config.cfg_node import CfgNode
from packnet_sfm_tpu.config.defaults import get_cfg_defaults

########################################################################################################################

_DATASET_LIST_KEYS = ['dataset', 'path', 'split', 'depth_type',
                      'input_depth_type', 'cameras', 'repeat',
                      'mask_file', 'use_mask']


def prep_dataset(node):
    """
    Broadcast per-dataset list entries to the number of datasets.

    The dataset count is the LONGEST list over all keys (reference
    utils/config.py:13-44) — e.g. a validation split with one path but
    depth_type ['groundtruth','groundtruth'] and input_depth_type
    ['velodyne',''] materializes TWO datasets (RGB+LiDAR and RGB-only eval).
    """
    if len(node.get('path', [])) == 0 and len(node.get('dataset', [])) == 0:
        return node
    lengths = []
    vals = {}
    for key in _DATASET_LIST_KEYS:
        if key not in node:
            continue
        val = node[key]
        if not isinstance(val, (list, tuple)):
            val = [val]
        vals[key] = list(val)
        lengths.append(len(vals[key]))
    n = max(lengths) if lengths else 0
    for key, val in vals.items():
        if len(val) == 0:
            val = ([[]] if key == 'cameras' else
                   [False] if key == 'use_mask' else
                   [1] if key == 'repeat' else [''])
        if len(val) == 1 and n > 1:
            val = val * n
        assert len(val) == n, \
            'Wrong number of entries for {} ({} vs {} datasets)'.format(
                key, len(val), n)
        node[key] = val
    return node


def prepare_config(cfg):
    """Finalize a merged config (dataset broadcasting, monitor key, flags)."""
    if cfg.prepared:
        return cfg
    for split in ['train', 'validation', 'test']:
        prep_dataset(cfg.datasets[split])
    # Checkpoint monitor key / filename templating (reference: utils/config.py:89-96)
    if cfg.checkpoint.filepath:
        name = cfg.name if cfg.name else 'model'
        cfg.checkpoint.filepath = os.path.join(
            cfg.checkpoint.filepath, name, '{epoch:02d}_{%s:.3f}' % cfg.checkpoint.monitor)
    cfg.prepared = True
    return cfg


def parse_train_config(yaml_path=None, overrides=None, defaults=None):
    """Build a training config from defaults + YAML + CLI overrides."""
    cfg = (defaults or get_cfg_defaults()).clone()
    if yaml_path:
        cfg.merge_from_file(yaml_path)
        cfg.config = yaml_path
    if overrides:
        cfg.merge_from_list(overrides)
    return prepare_config(cfg)


def parse_train_file(path, overrides=None):
    """
    Parse a train entry-point file: either a .yaml config or a .ckpt
    checkpoint (resume). Returns (config, resume_state_or_None).
    Mirrors reference utils/config.py:163-199.
    """
    if path is None or path == '':
        return parse_train_config(None, overrides), None
    if path.endswith('.yaml') or path.endswith('.yml'):
        return parse_train_config(path, overrides), None
    if path.endswith('.ckpt') or os.path.isdir(path):
        from packnet_sfm_tpu.utils.checkpoint import load_checkpoint
        state = load_checkpoint(path)
        cfg = get_cfg_defaults().clone()
        cfg.merge_from_dict(state['config'])
        if overrides:
            cfg.merge_from_list(overrides)
        cfg.prepared = True
        return cfg, state
    raise ValueError('Unknown train file {} (.yaml or .ckpt expected)'.format(path))


def parse_test_file(ckpt_path, yaml_path=None, overrides=None):
    """
    Parse a test entry point: checkpoint (config+state) + optional YAML
    override. Mirrors reference utils/config.py:258-332.
    Returns (config, state).
    """
    from packnet_sfm_tpu.utils.checkpoint import load_checkpoint
    state = load_checkpoint(ckpt_path)
    cfg = get_cfg_defaults().clone()
    cfg.merge_from_dict(state['config'])
    if yaml_path:
        cfg.merge_from_file(yaml_path)
    if overrides:
        cfg.merge_from_list(overrides)
    cfg.prepared = False
    return prepare_config(cfg), state


def to_namespace_kwargs(node):
    """Flatten a CfgNode into plain-dict kwargs (for factory construction)."""
    return {k: (v.to_dict() if isinstance(v, CfgNode) else v) for k, v in node.items()}
