"""Reference-checkpoint converter CLI (scripts/import_reference_checkpoint.py):
a simulated reference torch .ckpt (the exact payload of reference
models/model_checkpoint.py:69-74 — config + model.-prefixed state_dict)
converts into a framework checkpoint that parse_test_file + Trainer consume,
with the imported weights bit-identical to the source trees."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))

from import_reference_checkpoint import convert  # noqa: E402

from packnet_sfm_tpu.config import (  # noqa: E402
    get_cfg_defaults, parse_test_file)
from packnet_sfm_tpu.export.torch_import import (  # noqa: E402
    flax_to_reference_depth_net, flax_to_reference_packnet,
    flax_to_reference_pose_net)

pytestmark = pytest.mark.quick


def _tree_equal(a, b, path=''):
    assert set(a.keys()) == set(b.keys()), f'{path}: {set(a) ^ set(b)}'
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + '/' + str(k))
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]),
                err_msg=path + '/' + str(k))


def _ref_config():
    with open('configs/overfit_synthetic.yaml') as f:
        return yaml.safe_load(f)


def test_convert_resnetsan_full_checkpoint(tmp_path):
    from packnet_sfm_tpu.models import setup_model
    cfg = get_cfg_defaults().clone()
    cfg.merge_from_dict(_ref_config())
    from packnet_sfm_tpu.config.config import prepare_config
    cfg.prepared = False
    cfg = prepare_config(cfg)
    model = setup_model(cfg)
    from import_reference_checkpoint import _dummy_batch
    variables = model.init({'params': jax.random.PRNGKey(11),
                            'flip': jax.random.PRNGKey(1)},
                           _dummy_batch(cfg), train=True)

    # simulated reference .ckpt: depth_net + pose_net, model.-prefixed
    depth_sd = flax_to_reference_depth_net(
        {'params': variables['params']['depth_net'],
         'batch_stats': variables['batch_stats']['depth_net']})
    pose_sd = flax_to_reference_pose_net(
        {'params': variables['params']['pose_net']})
    sd = {}
    for k, v in depth_sd.items():
        sd['model.depth_net.' + k] = torch.from_numpy(np.asarray(v).copy())
    for k, v in pose_sd.items():
        sd['model.pose_net.' + k] = torch.from_numpy(np.asarray(v).copy())
    ref_ckpt = tmp_path / 'reference.ckpt'
    torch.save({'config': _ref_config(), 'epoch': 3, 'state_dict': sd},
               str(ref_ckpt))

    out = tmp_path / 'converted.ckpt'
    convert(str(ref_ckpt), str(out))

    config, state = parse_test_file(str(out))
    assert state['epoch'] == 3
    assert state.get('opt_state') is None
    _tree_equal(
        jax.tree_util.tree_map(np.asarray, variables['params']['depth_net']),
        jax.tree_util.tree_map(np.asarray, state['params']['depth_net']))
    _tree_equal(
        jax.tree_util.tree_map(np.asarray, variables['params']['pose_net']),
        jax.tree_util.tree_map(np.asarray, state['params']['pose_net']))
    _tree_equal(
        jax.tree_util.tree_map(np.asarray,
                               variables['batch_stats']['depth_net']),
        jax.tree_util.tree_map(np.asarray,
                               state['batch_stats']['depth_net']))

    # the converted checkpoint drives the real eval path (fresh optimizer
    # state in place of the absent torch one)
    from packnet_sfm_tpu.trainers.trainer import Trainer, _to_device_batch
    config.datasets.test = config.datasets.validation.clone()
    trainer = Trainer(config, resume_state=state)
    loader = trainer._make_loader('test')
    first = next(iter(loader))
    trainer._steps_per_epoch = 1
    trainer.setup(_to_device_batch(first, trainer.mesh))
    metrics = trainer.test(loader)
    assert metrics, 'eval produced no metrics'


def test_convert_packnet_depth_only(tmp_path):
    """PackNetSlim01 checkpoint without pose weights: depth imports, pose
    keeps random init (with a notice)."""
    from packnet_sfm_tpu.networks.depth.packnet import PackNetSlim01
    net = PackNetSlim01(version='1A')
    rgb = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = net.init({'params': jax.random.PRNGKey(4)}, rgb, train=True)
    sd = {('model.depth_net.' + k): torch.from_numpy(np.asarray(v).copy())
          for k, v in flax_to_reference_packnet(variables).items()}

    ref_cfg = _ref_config()
    ref_cfg['model']['depth_net'] = {'name': 'PackNetSlim01',
                                     'version': '1A'}
    ref_ckpt = tmp_path / 'reference_pn.ckpt'
    torch.save({'config': ref_cfg, 'epoch': 0, 'state_dict': sd},
               str(ref_ckpt))
    out = tmp_path / 'converted_pn.ckpt'
    convert(str(ref_ckpt), str(out))

    _, state = parse_test_file(str(out))
    _tree_equal(
        jax.tree_util.tree_map(np.asarray, dict(variables['params'])),
        jax.tree_util.tree_map(np.asarray,
                               dict(state['params']['depth_net'])))


def test_yacs_stub_unpickles_cfgnode(tmp_path):
    """A genuine reference checkpoint pickles a yacs CfgNode; the stub must
    unpickle it as a plain dict without the yacs package installed."""
    import pickle

    from import_reference_checkpoint import _install_yacs_stub
    _install_yacs_stub()
    import yacs.config
    node = yacs.config.CfgNode({'model': {'name': 'SelfSupModel'}})
    blob = pickle.dumps(node)
    back = pickle.loads(blob)
    assert dict(back)['model']['name'] == 'SelfSupModel'


def test_load_checkpoint_autoconverts_torch(tmp_path):
    """A reference torch .ckpt handed to load_checkpoint (i.e. to any CLI's
    --checkpoint) converts transparently and caches the result."""
    from packnet_sfm_tpu.networks.depth.packnet import PackNetSlim01
    from packnet_sfm_tpu.utils.checkpoint import load_checkpoint

    net = PackNetSlim01(version='1A')
    rgb = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = net.init({'params': jax.random.PRNGKey(6)}, rgb, train=True)
    sd = {('model.depth_net.' + k): torch.from_numpy(np.asarray(v).copy())
          for k, v in flax_to_reference_packnet(variables).items()}
    ref_cfg = _ref_config()
    ref_cfg['model']['depth_net'] = {'name': 'PackNetSlim01',
                                     'version': '1A'}
    ref_ckpt = tmp_path / 'ref_auto.ckpt'
    torch.save({'config': ref_cfg, 'epoch': 1, 'state_dict': sd},
               str(ref_ckpt))

    state = load_checkpoint(str(ref_ckpt))
    assert state['epoch'] == 1
    _tree_equal(
        jax.tree_util.tree_map(np.asarray, dict(variables['params'])),
        jax.tree_util.tree_map(np.asarray,
                               dict(state['params']['depth_net'])))
    assert os.path.exists(str(ref_ckpt) + '.tpu.ckpt')
    # cached: a second load must not reconvert (mtimes unchanged)
    mtime = os.path.getmtime(str(ref_ckpt) + '.tpu.ckpt')
    load_checkpoint(str(ref_ckpt))
    assert os.path.getmtime(str(ref_ckpt) + '.tpu.ckpt') == mtime


def test_infer_cli_on_reference_torch_checkpoint(tmp_path):
    """The commonest migration path: scripts/infer.py pointed straight at a
    reference torch .ckpt (auto-converted under the hood) produces depth
    outputs."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts'))
    from infer import infer_and_save_depth

    from packnet_sfm_tpu.networks.depth.packnet import PackNetSlim01
    net = PackNetSlim01(version='1A')
    rgb = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = net.init({'params': jax.random.PRNGKey(8)}, rgb, train=True)
    sd = {('model.depth_net.' + k): torch.from_numpy(np.asarray(v).copy())
          for k, v in flax_to_reference_packnet(variables).items()}
    ref_cfg = _ref_config()
    ref_cfg['model']['depth_net'] = {'name': 'PackNetSlim01',
                                     'version': '1A'}
    ref_ckpt = tmp_path / 'ref_infer.ckpt'
    torch.save({'config': ref_cfg, 'epoch': 0, 'state_dict': sd},
               str(ref_ckpt))

    from PIL import Image
    img = (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8)
    img_path = tmp_path / 'frame.png'
    Image.fromarray(img).save(str(img_path))

    out_dir = tmp_path / 'out'
    infer_and_save_depth(str(ref_ckpt), str(img_path), str(out_dir),
                         image_shape=(64, 96), save=('npz', 'viz'))
    outs = os.listdir(str(out_dir))
    assert any(f.endswith('.npz') for f in outs), outs
    assert any(f.endswith('.png') for f in outs), outs
    with np.load(str(out_dir / [f for f in outs
                                if f.endswith('.npz')][0])) as z:
        assert z['depth'].shape == (64, 96)
        assert np.isfinite(z['depth']).all()


def test_is_torch_checkpoint_detects_both_formats(tmp_path):
    """Zip-container (>=1.6) AND legacy pre-1.6 torch pickles are detected;
    our own pickle checkpoints are not."""
    from packnet_sfm_tpu.export.reference_convert import is_torch_checkpoint

    zip_ckpt = tmp_path / 'zip.ckpt'
    torch.save({'x': torch.zeros(1)}, str(zip_ckpt))
    assert is_torch_checkpoint(str(zip_ckpt))

    legacy = tmp_path / 'legacy.ckpt'
    torch.save({'x': torch.zeros(1)}, str(legacy),
               _use_new_zipfile_serialization=False)
    assert is_torch_checkpoint(str(legacy))

    import pickle
    ours = tmp_path / 'ours.ckpt'
    with open(str(ours), 'wb') as f:
        pickle.dump({'params': {}}, f)
    assert not is_torch_checkpoint(str(ours))
