"""
View synthesis: reconstruct with one camera, project with another, sample.

Matches reference packnet_sfm/geometry/camera_utils.py:27-59 (grid_sample
bilinear, align_corners=True, zeros padding).
"""

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
