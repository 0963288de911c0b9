"""
View synthesis: reconstruct with one camera, project with another, sample.

Matches reference packnet_sfm/geometry/camera_utils.py:27-59 (grid_sample
bilinear, align_corners=True, zeros padding).
"""

import jax.numpy as jnp

from packnet_sfm_tpu.ops.image import grid_sample


def view_synthesis(ref_image, depth, ref_cam, cam, padding_mode='zeros'):
    """
    Warp `ref_image` [B,H,W,3] into the frame of `cam` using `depth` [B,H,W,1].

    cam: camera of the original (target) image; ref_cam: camera of the
    reference image, carrying the target->reference pose as its Tcw.
    """
    world_points = cam.reconstruct(depth, frame='w')
    ref_coords = ref_cam.project(world_points, frame='w')
    return grid_sample(ref_image, ref_coords, padding_mode=padding_mode)


def view_synthesis_multi(ref_image, depths, ref_cam, cam,
                         padding_mode='zeros'):
    """Warp `ref_image` with SEVERAL same-resolution depth maps in ONE
    grid_sample call.

    The upsample_depth_maps training path (reference:
    packnet_sfm/losses/multiview_photometric_loss.py:185-200 with
    model_wrapper's interpolate_scales) samples the SAME full-res reference
    image with num_scales different grids. Row-concatenating the grids into
    one [B, n*H, W, 2] call keeps the math identical (sampling is
    row-independent) while issuing ONE gather kernel / ONE Pallas warp
    launch per context instead of n — n-fold fewer warp launches, source
    packings, and fallback-cond boundaries on the selfsup hot path.
    """
    n = len(depths)
    if n == 1:
        return [view_synthesis(ref_image, depths[0], ref_cam, cam,
                               padding_mode=padding_mode)]
    coords = [ref_cam.project(cam.reconstruct(d, frame='w'), frame='w')
              for d in depths]
    big = grid_sample(ref_image, jnp.concatenate(coords, axis=1),
                      padding_mode=padding_mode)
    return list(jnp.split(big, n, axis=1))
