"""
Model / network factories — name-addressed construction from config
(reference: model_wrapper.py:929-1011 setup_model/setup_depth_net/setup_pose_net).
"""

from packnet_sfm_tpu.utils.registry import lookup, register
from packnet_sfm_tpu.losses.photometric import MultiViewPhotometricLoss
from packnet_sfm_tpu.losses.supervised import SupervisedLoss
from packnet_sfm_tpu.losses.dual_head import DualHeadDepthLoss
from packnet_sfm_tpu.models.sfm import (
    SfmModel, SelfSupModel, SemiSupModel, SemiSupCompletionModel, VelSupModel)
from packnet_sfm_tpu.models.generic import GenericSfmModel, GenericSelfSupModel
from packnet_sfm_tpu.losses.generic_photometric import (
    GenericMultiViewPhotometricLoss)

import packnet_sfm_tpu.networks  # noqa: F401  (populates the registry)

for _m in [SfmModel, SelfSupModel, SemiSupModel, SemiSupCompletionModel,
           VelSupModel, GenericSfmModel, GenericSelfSupModel]:
    register('model')(_m)


def _dtype_from_config(cfg):
    import jax.numpy as jnp
    name = (cfg.get('tpu', {}) or {}).get('compute_dtype', 'float32') \
        if hasattr(cfg, 'get') else 'float32'
    return {'bfloat16': jnp.bfloat16, 'float32': jnp.float32}.get(
        name, jnp.float32)


def _net_kwargs(cls, config, params_cfg=None, dtype=None, extra=None):
    """Config -> constructor kwargs by dataclass-field introspection: a key
    is forwarded iff the network declares a field for it. Empty strings and
    None fall through to the class defaults (which mirror the reference
    defaults — see each network's field list)."""
    import dataclasses
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for key in fields:
        if key in ('dtype', 'parent', 'name'):
            continue
        depth_bound = key in ('min_depth', 'max_depth')
        src = params_cfg if (params_cfg is not None and depth_bound) \
            else config
        v = src.get(key, None) if hasattr(src, 'get') else None
        if v is None or v == '' or (depth_bound and not v):
            continue  # unset (incl. min/max_depth 0.0) -> class default
        kwargs[key] = tuple(v) if isinstance(v, list) else v
    if dtype is not None and 'dtype' in fields:
        kwargs['dtype'] = dtype
    kwargs.update(extra or {})
    return kwargs


def setup_depth_net(config, params_cfg, dtype=None, **extra):
    """Build a depth network from cfg.model.depth_net (+ cfg.model.params)."""
    cls = lookup('depth_net', config.name)
    return cls(**_net_kwargs(cls, config, params_cfg, dtype, extra))


def setup_pose_net(config, dtype=None, **extra):
    cls = lookup('pose_net', config.name)
    return cls(**_net_kwargs(cls, config, None, dtype, extra))


def setup_model(config, prepared=True):
    """
    Build the full model (depth net + pose net + losses) from cfg.model.
    Returns a flax module ready for init/apply.
    """
    model_cfg = config.model
    loss_cfg = model_cfg.loss
    params_cfg = model_cfg.params
    dtype = _dtype_from_config(config)

    depth_net = setup_depth_net(model_cfg.depth_net, params_cfg, dtype=dtype)
    pose_net = None
    if model_cfg.pose_net.name:
        pose_net = setup_pose_net(model_cfg.pose_net, dtype=dtype)

    photometric = MultiViewPhotometricLoss(
        num_scales=loss_cfg.num_scales,
        ssim_loss_weight=loss_cfg.ssim_loss_weight,
        occ_reg_weight=loss_cfg.occ_reg_weight,
        smooth_loss_weight=loss_cfg.smooth_loss_weight,
        C1=loss_cfg.C1, C2=loss_cfg.C2,
        photometric_reduce_op=loss_cfg.photometric_reduce_op,
        disp_norm=loss_cfg.disp_norm,
        clip_loss=loss_cfg.clip_loss,
        progressive_scaling=loss_cfg.get('progressive_scaling', 0.0),
        padding_mode=loss_cfg.padding_mode,
        automask_loss=loss_cfg.automask_loss,
        min_depth=params_cfg.min_depth or 0.05,
        max_depth=params_cfg.max_depth or 80.0,
        use_pallas=bool(config.get('tpu', {}).get('use_pallas', False)),
        photometric_dtype=str(config.get('tpu', {}).get(
            'photometric_dtype', 'float32')),
    )
    supervised = SupervisedLoss(
        supervised_method=loss_cfg.supervised_method,
        supervised_num_scales=loss_cfg.supervised_num_scales,
        progressive_scaling=loss_cfg.get('progressive_scaling', 0.0),
        loss_kwargs=(
            ('min_depth', params_cfg.min_depth),
            ('max_depth', params_cfg.max_depth),
            ('ssi_weight', loss_cfg.ssi_weight),
            ('silog_weight', loss_cfg.silog_weight),
            ('alpha', loss_cfg.alpha),
            ('silog_ratio2', loss_cfg.silog_ratio2),
            ('gradient_weight', loss_cfg.gradient_weight),
            ('gradient_scales', loss_cfg.gradient_scales),
        ),
    )

    name = model_cfg.name
    common = dict(depth_net=depth_net, pose_net=pose_net,
                  rotation_mode=loss_cfg.rotation_mode,
                  flip_lr_prob=loss_cfg.get('flip_lr_prob', 0.0),
                  upsample_depth_maps=loss_cfg.upsample_depth_maps)
    if name == 'SfmModel':
        return SfmModel(**common)
    if name == 'SelfSupModel':
        return SelfSupModel(photometric_loss=photometric, **common)
    if name == 'SemiSupModel':
        return SemiSupModel(photometric_loss=photometric,
                            supervised_loss=supervised,
                            supervised_loss_weight=loss_cfg.supervised_loss_weight,
                            **common)
    if name == 'SemiSupCompletionModel':
        min_d = params_cfg.min_depth or 0.5
        max_d = params_cfg.max_depth or 80.0
        if max_d <= min_d:
            max_d = min_d + 1.0
        return SemiSupCompletionModel(
            photometric_loss=photometric,
            supervised_loss=supervised,
            supervised_loss_weight=loss_cfg.supervised_loss_weight,
            weight_rgbd=loss_cfg.get('weight_rgbd', 1.0),
            consistency_loss_weight=loss_cfg.consistency_loss_weight,
            min_depth=min_d, max_depth=max_d,
            use_log_space=params_cfg.use_log_space,
            qat_outputs='outputs' in str(params_cfg.get('qat', '')),
            dual_head_loss=DualHeadDepthLoss(
                max_depth=max_d, min_depth=min_d,
                integer_weight=loss_cfg.get('integer_weight', 1.0),
                fractional_weight=loss_cfg.get('fractional_weight', 10.0),
                consistency_weight=loss_cfg.get('dual_consistency_weight', 0.5)),
            **common)
    if name == 'VelSupModel':
        return VelSupModel(photometric_loss=photometric,
                           velocity_loss_weight=loss_cfg.velocity_loss_weight,
                           **common)
    if name == 'GenericSelfSupModel':
        generic = GenericMultiViewPhotometricLoss(
            num_scales=1,
            ssim_loss_weight=loss_cfg.ssim_loss_weight,
            smooth_loss_weight=loss_cfg.smooth_loss_weight,
            C1=loss_cfg.C1, C2=loss_cfg.C2,
            photometric_reduce_op=loss_cfg.photometric_reduce_op,
            clip_loss=loss_cfg.clip_loss,
            padding_mode=loss_cfg.padding_mode,
            automask_loss=loss_cfg.automask_loss,
            full_res_projection=loss_cfg.get('generic_full_res', False))
        return GenericSelfSupModel(generic_photometric_loss=generic, **common)
    if name == 'GenericSfmModel':
        return GenericSfmModel(**common)
    return lookup('model', name)(**common)
