"""Network registry: name-addressable depth and pose networks
(the reference resolves these by file name, model_wrapper.py:946-950)."""

from packnet_sfm_tpu.utils.registry import register

from packnet_sfm_tpu.networks.depth.resnet_san import ResNetSAN01
from packnet_sfm_tpu.networks.depth.depth_resnet import DepthResNet
from packnet_sfm_tpu.networks.depth.packnet import (
    PackNet01, PackNetSlim01, PackNetSAN01, PackNetSlimSAN01)
from packnet_sfm_tpu.networks.depth.ray_surface_resnet import RaySurfaceResNet
from packnet_sfm_tpu.networks.depth.yolov8_san import YOLOv8SAN01
from packnet_sfm_tpu.networks.pose.pose_net import PoseNet, PoseResNet

for _net in [ResNetSAN01, DepthResNet, PackNet01, PackNetSlim01,
             PackNetSAN01, PackNetSlimSAN01, RaySurfaceResNet, YOLOv8SAN01]:
    register('depth_net')(_net)

for _net in [PoseNet, PoseResNet]:
    register('pose_net')(_net)
