"""
packnet_sfm_tpu — a TPU-native (JAX/XLA/Pallas) framework for self-supervised and
semi-supervised monocular depth estimation and depth completion.

Re-designed from scratch for TPU hardware with the capability surface of
`packnet-sfm-resnet-san` (reference: /root/reference, see SURVEY.md):

- SfM model family: SelfSup / SemiSup / SemiSupCompletion / VelSup / Generic
  (reference: packnet_sfm/models/*.py)
- Depth networks: ResNetSAN01, DepthResNet, PackNet01, PackNetSAN01, PackNetSlim01
  (reference: packnet_sfm/networks/depth/*.py)
- Pose networks: PoseNet, PoseResNet (reference: packnet_sfm/networks/pose/*.py)
- Differentiable geometry: pinhole + VADAS fisheye cameras, SE(3) poses, view
  synthesis (reference: packnet_sfm/geometry/*.py)
- Losses: multi-view photometric (SSIM+L1, automask), supervised family
  (L1/MSE/BerHu/Silog/SSI/SSI-Silog/SSI-trim), dual-head, velocity
  (reference: packnet_sfm/losses/*.py)
- Data: KITTI, NCDB fisheye, generic image folders (reference: packnet_sfm/datasets)
- Distributed: data parallelism over a `jax.sharding.Mesh` (ICI collectives via
  psum), replacing the reference's Horovod/NCCL backend
  (reference: packnet_sfm/utils/horovod.py, utils/reduce.py)

Design principles (TPU-first, NOT a port):
- NHWC layout everywhere (TPU conv layout), bf16-friendly compute paths.
- Pure-functional models (flax.linen); a single jitted train step fusing
  forward+loss+backward+update.
- Static shapes and lax control flow under jit; host-side data pipeline.
- Pallas kernels for hot ops where XLA fusion loses.
"""

__version__ = "0.1.0"
