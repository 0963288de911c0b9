"""
SfM model family (flax.linen): depth+pose composition and loss stacking.

TPU re-design of the reference model hierarchy
(reference: packnet_sfm/models/):
- SfmModel: composes depth/pose nets, random lr-flip TTA at train, optional
  multi-scale upsampling (SfmModel.py:30-127). The flip is applied as a
  single traced select (flip input -> net -> flip output) instead of python
  branching, so the depth net is traced once.
- SelfSupModel: + multi-view photometric loss on the un-jittered originals
  (SelfSupModel.py:18-121)
- SemiSupModel: + supervised loss weighted against self-sup
  (SemiSupModel.py:23-112)
- SemiSupCompletionModel: the fork's flagship — GT clamping, sigmoid ->
  bounded inverse-depth conversion before the supervised loss (linear/log),
  dual-head auto-detection, RGB+D branch weighting and feature-consistency
  loss (SemiSupCompletionModel.py:20-568)
- VelSupModel: + velocity supervision (VelSupModel.py:18-52)

Batches are dicts of NHWC arrays:
  rgb, rgb_original, rgb_context (list), rgb_context_original (list),
  intrinsics [B,3,3], distortion_coeffs (optional dict -> fisheye),
  depth, input_depth, mask, pose_context (list of [B,4,4]).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from packnet_sfm_tpu.geometry.pose import Pose
from packnet_sfm_tpu.ops.image import flip_lr, interpolate
from packnet_sfm_tpu.ops.depth import sigmoid_to_inv_depth, depth2inv
from packnet_sfm_tpu.losses.photometric import MultiViewPhotometricLoss
from packnet_sfm_tpu.losses.supervised import SupervisedLoss
from packnet_sfm_tpu.losses.dual_head import DualHeadDepthLoss
from packnet_sfm_tpu.losses.velocity import velocity_loss


def _flip_output(output):
    """Flip depth-like outputs back after a flipped forward pass."""
    flipped = {}
    for k, v in output.items():
        if k in ('inv_depths', 'inv_depths_rgbd'):
            flipped[k] = [flip_lr(d) for d in v]
        elif isinstance(k, tuple):  # dual-head ('integer', i) maps
            flipped[k] = flip_lr(v)
        else:
            flipped[k] = v
    return flipped


def _select_output(flag, flipped, straight):
    """Per-batch select between flipped-back and straight outputs."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(flag, a, b) if isinstance(a, jnp.ndarray) and a.ndim > 0 else a,
        flipped, straight)


class SfmModel(nn.Module):
    """Depth + pose composition with flip TTA."""
    depth_net: nn.Module
    pose_net: Optional[nn.Module] = None
    rotation_mode: str = 'euler'
    flip_lr_prob: float = 0.0
    upsample_depth_maps: bool = False

    # which batch keys feed the depth net (reference: base_model.py:23,
    # SemiSupCompletionModel.py:69)
    input_depth_key: str = 'input_depth'

    def compute_depth_net(self, batch, train=True):
        rgb = batch['rgb']
        input_depth = batch.get(self.input_depth_key)
        use_flip = train and self.flip_lr_prob > 0.0 and self.has_rng('flip')
        if use_flip:
            flip = (jax.random.uniform(self.make_rng('flip')) <
                    self.flip_lr_prob)
            rgb_in = jnp.where(flip, flip_lr(rgb), rgb)
            d_in = None
            if input_depth is not None:
                d_in = jnp.where(flip, flip_lr(input_depth), input_depth)
            output = self.depth_net(rgb_in, input_depth=d_in, train=train)
            output = _select_output(flip, _flip_output(output), output)
        else:
            output = self.depth_net(rgb, input_depth=input_depth, train=train)
        if train and self.upsample_depth_maps:
            output = self._upsample_output(output)
        return output

    @staticmethod
    def _upsample_output(output):
        out = dict(output)
        for key in ('inv_depths', 'inv_depths_rgbd'):
            if key in out:
                shape = out[key][0].shape[1:3]
                out[key] = [interpolate(d, shape, mode='nearest')
                            for d in out[key]]
        return out

    def compute_pose_net(self, image, contexts, train=True):
        pose_vec = self.pose_net(image, contexts, train=train)
        return [Pose.from_vec(pose_vec[:, i], self.rotation_mode)
                for i in range(pose_vec.shape[1])]

    def forward_base(self, batch, train=True):
        output = self.compute_depth_net(batch, train=train)
        poses = None
        if 'rgb_context' in batch and batch['rgb_context'] and \
                self.pose_net is not None:
            poses = self.compute_pose_net(batch['rgb'], batch['rgb_context'],
                                          train=train)
        return {**output, 'poses': poses}

    def __call__(self, batch, train=True, progress=0.0, epoch=0):
        return self.forward_base(batch, train=train)


class SelfSupModel(SfmModel):
    """+ self-supervised multi-view photometric loss."""
    photometric_loss: MultiViewPhotometricLoss = MultiViewPhotometricLoss()

    def self_supervised_loss(self, batch, output, progress=0.0):
        distortion = batch.get('distortion_coeffs')
        K = batch.get('intrinsics') if distortion is None else None
        return self.photometric_loss(
            batch.get('rgb_original', batch['rgb']),
            batch.get('rgb_context_original', batch.get('rgb_context')),
            output['inv_depths'], output['poses'],
            K=K, distortion=distortion,
            mask=batch.get('mask'), progress=progress)

    def __call__(self, batch, train=True, progress=0.0, epoch=0):
        output = self.forward_base(batch, train=train)
        if not train:
            return output
        if output.get('poses') is None:
            # no context frames (e.g. eval-shaped batch during init):
            # the self-supervised term is undefined -> zero loss
            return {'loss': jnp.zeros(()), 'metrics': {}, **output}
        self_sup = self.self_supervised_loss(batch, output, progress)
        return {'loss': self_sup['loss'],
                'metrics': self_sup['metrics'],
                **output}


class SemiSupModel(SelfSupModel):
    """+ supervised loss weighted against self-supervision."""
    supervised_loss_weight: float = 0.9
    supervised_loss: SupervisedLoss = SupervisedLoss()

    def __call__(self, batch, train=True, progress=0.0, epoch=0):
        if not train:
            return self.forward_base(batch, train=False)
        if self.supervised_loss_weight == 1.0:
            output = self.forward_base(batch, train=True)
            loss = jnp.zeros(())
            metrics = {}
        else:
            output = SelfSupModel.__call__(self, batch, train=True,
                                           progress=progress)
            loss = (1.0 - self.supervised_loss_weight) * output['loss']
            metrics = dict(output['metrics'])
        sup = self.supervised_loss(output['inv_depths'],
                                   depth2inv(batch['depth']),
                                   progress=progress, epoch=epoch)
        loss = loss + self.supervised_loss_weight * sup['loss']
        metrics.update(sup['metrics'])
        return {**output, 'loss': loss, 'metrics': metrics}


class SemiSupCompletionModel(SelfSupModel):
    """Depth-completion semi-supervised model (the fork's flagship)."""
    supervised_loss_weight: float = 0.9
    weight_rgbd: float = 1.0
    consistency_loss_weight: float = 0.0
    min_depth: float = 0.5
    max_depth: float = 80.0
    use_log_space: bool = False
    # QAT: straight-through uint8 fake-quant of the head sigmoids before
    # depth conversion — trains the network against the INT8 output grid
    # the NPU deploys (ops/quantization.py; model.params.qat 'outputs').
    # Mirrors exactly where the eval protocol applies fake_quant_u8
    # (parallel/train_step.py make_eval_metrics_step int8_outputs).
    qat_outputs: bool = False
    supervised_loss: SupervisedLoss = SupervisedLoss()
    dual_head_loss: Optional[DualHeadDepthLoss] = None

    def _clamp_gt(self, depth):
        """Clamp valid GT into [min_depth, max_depth]
        (reference: SemiSupCompletionModel.py:475-487)."""
        valid = (depth > 0) & jnp.isfinite(depth)
        return jnp.where(valid,
                         jnp.clip(depth, self.min_depth, self.max_depth),
                         depth)

    def _bounded(self, sigmoids):
        if self.qat_outputs:
            from packnet_sfm_tpu.ops.quantization import ste_quant_u8
            sigmoids = [ste_quant_u8(s) for s in sigmoids]
        return [sigmoid_to_inv_depth(s, self.min_depth, self.max_depth,
                                     self.use_log_space) for s in sigmoids]

    def __call__(self, batch, train=True, progress=0.0, epoch=0):
        if not train:
            return self.forward_base(batch, train=False)

        if self.supervised_loss_weight == 1.0:
            output = self.forward_base(batch, train=True)
            loss = jnp.zeros(())
            metrics = {}
        else:
            output = SelfSupModel.__call__(self, batch, train=True,
                                           progress=progress)
            loss = (1.0 - self.supervised_loss_weight) * output['loss']
            metrics = dict(output['metrics'])

        gt = self._clamp_gt(batch['depth'])
        gt_inv = depth2inv(gt)

        if 'inv_depths' in output:
            bounded = self._bounded(output['inv_depths'])
            sup = self.supervised_loss(bounded, gt_inv, progress=progress,
                                       epoch=epoch)
        else:
            # dual-head outputs: ('integer', i)/('fractional', i)
            dh = self.dual_head_loss or DualHeadDepthLoss(
                max_depth=self.max_depth, min_depth=self.min_depth)
            heads = {k: v for k, v in output.items()
                     if isinstance(k, tuple)}
            if self.qat_outputs:
                from packnet_sfm_tpu.ops.quantization import ste_quant_u8
                heads = {k: ste_quant_u8(v) for k, v in heads.items()}
            sup = dh(heads, gt, progress=progress)
        loss = loss + self.supervised_loss_weight * sup['loss']
        metrics.update(sup['metrics'])

        if 'inv_depths_rgbd' in output:
            bounded_rgbd = self._bounded(output['inv_depths_rgbd'])
            sup2 = self.supervised_loss(bounded_rgbd, gt_inv,
                                        progress=progress, epoch=epoch)
            loss = loss + (self.weight_rgbd * self.supervised_loss_weight
                           * sup2['loss'])
            metrics['supervised_loss_rgbd'] = sup2['loss']
            if 'depth_loss' in output:
                loss = loss + output['depth_loss']
                metrics['feature_consistency_loss'] = output['depth_loss']
            if self.consistency_loss_weight > 0:
                # RGB <-> RGB+D prediction consistency
                # (reference: SemiSupCompletionModel.py:542-557)
                cons = 0.0
                for pr, prd in zip(output['inv_depths'],
                                   output['inv_depths_rgbd']):
                    cons = cons + jnp.abs(
                        pr - jax.lax.stop_gradient(prd)).mean()
                cons = cons / len(output['inv_depths'])
                loss = loss + self.consistency_loss_weight * cons
                metrics['consistency_loss'] = cons

        return {**output, 'loss': loss, 'metrics': metrics}


class VelSupModel(SelfSupModel):
    """+ velocity supervision from GT context poses."""
    velocity_loss_weight: float = 0.1

    def __call__(self, batch, train=True, progress=0.0, epoch=0):
        output = SelfSupModel.__call__(self, batch, train=train,
                                       progress=progress)
        if train:
            vel = velocity_loss(output['poses'], batch['pose_context'])
            output['loss'] = output['loss'] + \
                self.velocity_loss_weight * vel['loss']
            output['metrics'] = {**output['metrics'], **vel['metrics']}
        return output
