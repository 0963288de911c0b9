from packnet_sfm_tpu.geometry.pose import Pose, euler2mat, pose_vec2mat, invert_pose
from packnet_sfm_tpu.geometry.camera import Camera, FisheyeCamera, image_grid, scale_intrinsics, construct_K
from packnet_sfm_tpu.geometry.camera_utils import view_synthesis
