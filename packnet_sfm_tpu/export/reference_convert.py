"""
Reference (torch) packnet-sfm checkpoint -> framework-native checkpoint.

Core of scripts/import_reference_checkpoint.py, importable so
utils/checkpoint.load_checkpoint can transparently convert a reference
torch .ckpt handed to any CLI (eval/infer/train). See the script docstring
for the format contract (reference models/model_checkpoint.py:69-74 payload,
utils/load.py prefix naming).

Supported depth nets: ResNetSAN01 (+FiLM/dual-head), PackNet01,
PackNetSlim01, PackNetSAN01, PackNetSlimSAN01. Pose nets: PoseNet,
PoseResNet. The output carries no optimizer state (fresh optimizer on
resume/fine-tune).
"""

import sys


# legacy (pre-1.6) torch files are a pickle whose first object is the torch
# MAGIC_NUMBER long 0x1950a86a20f9469cfc6c (torch/serialization.py)
_TORCH_LEGACY_MAGIC = b'\x80\x02\x8a\nl\xfc\x9cF\xf9 j\xa8P\x19'


def is_torch_checkpoint(path):
    """True for torch-format checkpoint files: the >=1.6 zip container
    (PK magic) or a legacy torch pickle (which pickle.load cannot read
    because of torch persistent ids) — e.g. the published 2019-2020 TRI
    PackNet01 checkpoints."""
    with open(path, 'rb') as f:
        magic = f.read(len(_TORCH_LEGACY_MAGIC))
    return magic[:2] == b'PK' or magic == _TORCH_LEGACY_MAGIC


def _install_yacs_stub():
    """Reference checkpoints pickle a yacs CfgNode; a dict-subclass stub
    unpickles it without the yacs package."""
    try:
        import yacs.config  # noqa: F401
        return
    except ImportError:
        pass
    import types

    class CfgNode(dict):
        def __setstate__(self, state):
            self.update(state)

    # make the stub class resolvable at its real import path so pickle
    # round-trips (reference ckpts reference yacs.config.CfgNode by name)
    CfgNode.__module__ = 'yacs.config'
    CfgNode.__qualname__ = 'CfgNode'

    yacs = types.ModuleType('yacs')
    yacs_config = types.ModuleType('yacs.config')
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules['yacs'] = yacs
    sys.modules['yacs.config'] = yacs_config


def _plain_dict(d):
    """Recursively strip a (possibly yacs) config to a plain dict; yacs
    CfgNode stores bookkeeping IN the dict (__immutable__,
    __deprecated_keys__, ...) — drop those dunder keys."""
    if isinstance(d, dict):
        return {k: _plain_dict(v) for k, v in d.items()
                if not (isinstance(k, str) and k.startswith('__'))}
    return d


def _dummy_batch(cfg):
    """Minimal batch exercising every model path at init (RGB + contexts +
    intrinsics + GT/input depth); tiny static shapes — only tree structure
    and channel counts matter for parameter creation."""
    import numpy as np
    import jax.numpy as jnp
    H, W = 64, 96
    rng = np.random.RandomState(0)

    def img():
        return jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))

    K = np.array([[W, 0.0, W / 2], [0.0, H, H / 2], [0.0, 0.0, 1.0]],
                 np.float32)
    d = (rng.rand(1, H, W, 1) < 0.05).astype(np.float32) * 10.0
    return {
        'rgb': img(), 'rgb_original': img(),
        'rgb_context': [img(), img()],
        'rgb_context_original': [img(), img()],
        'intrinsics': jnp.asarray(K[None]),
        'depth': jnp.asarray(d), 'input_depth': jnp.asarray(d),
    }


def convert(ckpt_path, output, cfg_yaml=None,
            me_kernel_order='first_axis_fastest'):
    import numpy as np
    import torch

    import jax
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.config.config import prepare_config
    from packnet_sfm_tpu.export import torch_import as ti
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.utils.checkpoint import save_checkpoint

    _install_yacs_stub()
    ckpt = torch.load(ckpt_path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    cfg = get_cfg_defaults().clone()
    ref_cfg = _plain_dict(ckpt.get('config') or {})
    if ref_cfg:
        cfg.merge_from_dict(ref_cfg)
    if cfg_yaml:
        cfg.merge_from_file(cfg_yaml)
    assert ref_cfg or cfg_yaml, (
        'checkpoint carries no config (bare state_dict): convert it '
        'explicitly with scripts/import_reference_checkpoint.py '
        '--checkpoint {} --output <out.ckpt> --config <model.yaml> '
        '(a YAML naming at least model.name/model.depth_net)'.format(
            ckpt_path))
    cfg.prepared = False
    cfg = prepare_config(cfg)

    depth_name = cfg.model.depth_net.name
    pose_name = cfg.model.pose_net.name
    model = setup_model(cfg)
    variables = model.init(
        {'params': jax.random.PRNGKey(cfg.arch.seed),
         'flip': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)},
        _dummy_batch(cfg), train=True)
    params = dict(variables['params'])
    stats = dict(variables.get('batch_stats', {}))

    # ---- depth net
    rel = ti.strip_reference_prefix(sd, 'depth_net') if any(
        'depth_net.' in k for k in sd) else sd
    if depth_name.startswith('PackNet'):
        dp, ds = ti.reference_packnet_to_flax(
            rel, {'params': params['depth_net']}, me_kernel_order)
    elif depth_name in ('ResNetSAN01', 'DepthResNet'):
        num_layers = int(str(cfg.model.depth_net.version or '18A')[:2])
        dp, ds = ti.reference_depth_net_to_flax(
            rel, num_layers, me_kernel_order)
    else:
        raise SystemExit(
            'unsupported depth_net for conversion: {}'.format(depth_name))
    params['depth_net'] = dp
    if ds:
        stats['depth_net'] = ds
    print('[import] depth_net <- {} ({} tensors)'.format(
        depth_name, len(rel)))

    # ---- pose net (optional in the checkpoint)
    pose_sd = ti.strip_reference_prefix(sd, 'pose_net')
    if pose_sd and 'pose_net' in params:
        pp, ps = ti.reference_pose_net_to_flax(pose_sd)
        params['pose_net'] = pp
        if ps:
            stats['pose_net'] = ps
        print('[import] pose_net <- {} ({} tensors)'.format(
            pose_name, len(pose_sd)))
    elif 'pose_net' in params:
        print('[import] checkpoint has no pose_net weights; '
              'keeping random init')

    import jax.numpy as jnp
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731

    class _State:
        pass

    state = _State()
    state.params = to_jnp(params)
    state.batch_stats = to_jnp(stats)
    state.opt_state = None
    state.epoch = int(ckpt.get('epoch', 0) or 0)
    state.step = int(ckpt.get('global_step', 0) or 0)
    state.ema_params = None
    save_checkpoint(output, cfg, state, epoch=state.epoch)
    print('[import] wrote {}'.format(output))
    return output
