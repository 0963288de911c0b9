"""Config system tests: YAML merge, broadcasting, reference compatibility."""

import os

import pytest

from packnet_sfm_tpu.config import (
    get_cfg_defaults, parse_train_config, parse_train_file)
from packnet_sfm_tpu.config.cfg_node import CfgNode

pytestmark = pytest.mark.quick


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference/configs'


def test_defaults_tree_keys():
    cfg = get_cfg_defaults()
    assert cfg.model.loss.ssim_loss_weight == 0.85
    assert cfg.datasets.train.batch_size == 2
    assert cfg.checkpoint.monitor == 'loss'
    assert cfg.tpu.mesh_axes == ('data',)


def test_yaml_merge_and_tuple_strings(tmp_path):
    p = tmp_path / 'c.yaml'
    p.write_text(
        'model:\n  name: SelfSupModel\n'
        'datasets:\n  augmentation:\n    image_shape: (192, 640)\n'
        '    crop_train_borders: (-352, 0, 0.5, 1216)\n')
    cfg = parse_train_config(str(p))
    assert cfg.model.name == 'SelfSupModel'
    assert tuple(cfg.datasets.augmentation.image_shape) == (192, 640)
    assert tuple(cfg.datasets.augmentation.crop_train_borders) == \
        (-352, 0, 0.5, 1216)


def test_list_broadcasting_rgb_vs_lidar(tmp_path):
    """One path + two depth_type entries -> two datasets (reference
    utils/config.py:13-44 semantics)."""
    p = tmp_path / 'c.yaml'
    p.write_text(
        "datasets:\n  validation:\n    dataset: ['KITTI']\n"
        "    path: ['/data']\n    split: ['s.txt']\n"
        "    depth_type: ['groundtruth', 'groundtruth']\n"
        "    input_depth_type: ['velodyne', '']\n")
    cfg = parse_train_config(str(p))
    v = cfg.datasets.validation
    assert v.path == ['/data', '/data']
    assert v.dataset == ['KITTI', 'KITTI']
    assert v.input_depth_type == ['velodyne', '']


def test_reference_configs_parse():
    """EVERY reference YAML must parse against our defaults."""
    if not os.path.isdir(REFERENCE):
        pytest.skip('reference configs unavailable')
    names = [n for n in os.listdir(REFERENCE) if n.endswith('.yaml')]
    assert len(names) >= 15
    for name in names:
        cfg = parse_train_config(os.path.join(REFERENCE, name))
        assert cfg.model.name, name
        assert cfg.model.depth_net.name, name


def test_every_reference_config_has_same_name_counterpart():
    """Round-3 VERDICT item 5: each reference YAML ships with a same-name
    runnable counterpart in our configs/."""
    if not os.path.isdir(REFERENCE):
        pytest.skip('reference configs unavailable')
    ours = set(os.listdir(os.path.join(REPO, 'configs')))
    missing = [n for n in os.listdir(REFERENCE)
               if n.endswith('.yaml') and n not in ours]
    assert missing == []


def test_own_configs_parse_and_build_models():
    from packnet_sfm_tpu.models import setup_model
    for name in os.listdir(os.path.join(REPO, 'configs')):
        if name.endswith('.yaml'):
            cfg = parse_train_config(os.path.join(REPO, 'configs', name))
            assert cfg.model.name, name
            model = setup_model(cfg)
            assert model is not None, name


def test_cli_override():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(['model.name', 'SelfSupModel',
                         'arch.max_epochs', '7'])
    assert cfg.model.name == 'SelfSupModel'
    assert cfg.arch.max_epochs == 7


def test_checkpoint_filename_templating(tmp_path):
    from packnet_sfm_tpu.config.config import prepare_config
    cfg = get_cfg_defaults()
    cfg.name = 'run1'
    cfg.checkpoint.filepath = str(tmp_path)
    cfg.checkpoint.monitor = 'abs_rel'
    cfg = prepare_config(cfg)
    assert '{epoch:02d}_{abs_rel:.3f}' in cfg.checkpoint.filepath
