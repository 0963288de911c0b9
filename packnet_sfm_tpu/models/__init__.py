from packnet_sfm_tpu.models.sfm import (
    SfmModel, SelfSupModel, SemiSupModel, SemiSupCompletionModel, VelSupModel)
from packnet_sfm_tpu.models.factory import (
    setup_model, setup_depth_net, setup_pose_net)
