from packnet_sfm_tpu.config.cfg_node import CfgNode
from packnet_sfm_tpu.config.defaults import get_cfg_defaults
from packnet_sfm_tpu.config.config import (
    parse_train_config, parse_train_file, parse_test_file, prepare_config)
