"""
Dual-head (integer + fractional) depth loss — the ST2 INT8-quantization
training objective (reference: packnet_sfm/losses/dual_head_depth_loss.py:23-201):

  L = w_int * L1(integer) + w_frac * L1(fractional) + w_cons * L1(recomposed)

with a (min_depth, max_depth) validity mask and GT decomposition into
floor/fractional parts.
"""

import dataclasses

import jax.numpy as jnp

from packnet_sfm_tpu.ops.depth import decompose_depth, dual_head_to_depth
from packnet_sfm_tpu.ops.image import interpolate


def _masked_l1(a, b, m):
    return jnp.sum(jnp.abs(a - b) * m) / jnp.maximum(jnp.sum(m), 1.0)


@dataclasses.dataclass(frozen=True)
class DualHeadDepthLoss:
    max_depth: float = 15.0
    min_depth: float = 0.5
    integer_weight: float = 1.0
    fractional_weight: float = 10.0
    consistency_weight: float = 0.5

    def __post_init__(self):
        assert self.max_depth > self.min_depth > -1e-9
        assert self.integer_weight >= 0 and self.consistency_weight >= 0
        assert self.fractional_weight > 0

    def __call__(self, outputs, depth_gt, progress=0.0):
        """outputs: dict with ('integer', 0) / ('fractional', 0) [B,H,W,1]."""
        integer_pred = outputs[('integer', 0)]
        fractional_pred = outputs[('fractional', 0)]
        if depth_gt.shape[1:3] != integer_pred.shape[1:3]:
            depth_gt = interpolate(depth_gt, integer_pred.shape[1:3],
                                   mode='nearest')
        mask = ((depth_gt > self.min_depth) &
                (depth_gt < self.max_depth)).astype(integer_pred.dtype)

        integer_gt, fractional_gt = decompose_depth(depth_gt, self.max_depth)
        integer_loss = _masked_l1(integer_pred, integer_gt, mask)
        fractional_loss = _masked_l1(fractional_pred, fractional_gt, mask)
        depth_pred = dual_head_to_depth(integer_pred, fractional_pred,
                                        self.max_depth)
        consistency_loss = _masked_l1(depth_pred, depth_gt, mask)

        total = (self.integer_weight * integer_loss +
                 self.fractional_weight * fractional_loss +
                 self.consistency_weight * consistency_loss)
        total = jnp.where(jnp.sum(mask) > 0, total, 0.0)

        # logging metrics the ST2 INT8 validation report keys on
        # (reference: dual_head_depth_loss.py:178-195); all masked, in-graph
        cnt = jnp.maximum(jnp.sum(mask), 1.0)
        depth_err = jnp.abs(depth_pred - depth_gt)
        mean_depth_error = jnp.sum(depth_err * mask) / cnt
        # masked lower-median (torch .median() semantics): invalid -> +inf,
        # global sort, take element (n_valid - 1) // 2
        flat = jnp.sort(jnp.where(mask > 0, depth_err, jnp.inf).ravel())
        med_idx = (jnp.sum(mask).astype(jnp.int32) - 1) // 2
        median_depth_error = flat[jnp.maximum(med_idx, 0)]
        integer_err_m = jnp.abs(integer_pred - integer_gt) * self.max_depth
        integer_accuracy = jnp.sum(
            (integer_err_m < 1.0).astype(mask.dtype) * mask) / cnt
        fractional_rmse = jnp.sqrt(
            jnp.sum(((fractional_pred - fractional_gt) ** 2) * mask) / cnt)
        return {
            'loss': total,
            'metrics': {
                'integer_loss': integer_loss,
                'fractional_loss': fractional_loss,
                'consistency_loss': consistency_loss,
                'total_loss': total,
                'mean_depth_error': mean_depth_error,
                'median_depth_error': median_depth_error,
                'integer_accuracy': integer_accuracy,
                'fractional_rmse': fractional_rmse,
            },
        }
