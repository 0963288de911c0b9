"""
Velocity supervision loss: L1 between predicted and GT translation magnitudes
(reference: packnet_sfm/losses/velocity_loss.py:17-42).
"""

import jax.numpy as jnp


def velocity_loss(pred_poses, gt_pose_context):
    """pred_poses: list of Pose; gt_pose_context: list of [B,4,4] arrays."""
    total = 0.0
    for pred, gt in zip(pred_poses, gt_pose_context):
        pred_t = jnp.linalg.norm(pred.mat[:, :3, 3], axis=-1)
        gt_t = jnp.linalg.norm(gt[:, :3, 3], axis=-1)
        total = total + jnp.abs(pred_t - gt_t).mean()
    loss = total / len(gt_pose_context)
    return {'loss': loss, 'metrics': {'velocity_loss': loss}}
