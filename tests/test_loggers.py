"""Logger smoke tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick



def test_tensorboard_logger(tmp_path):
    pytest.importorskip('torch.utils.tensorboard')
    from packnet_sfm_tpu.loggers import TensorboardLogger
    logger = TensorboardLogger(log_dir=str(tmp_path))
    logger.log_metrics({'loss': 1.0, 'abs_rel': 0.1}, step=0)
    logger.log_images('val/rgb', np.random.rand(2, 8, 8, 3), step=0)
    logger.finish()
    import os
    assert any('events' in f for f in os.listdir(str(tmp_path)))


def test_setup_loggers_dry_run():
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.loggers import setup_loggers
    cfg = get_cfg_defaults()
    assert setup_loggers(cfg) is None  # both dry_run by default


def test_avg_meter_rolling_window():
    """AvgMeter(50) rolling-loss smoothing (reference utils/logging.py:139-167)."""
    from packnet_sfm_tpu.utils.logging_utils import AvgMeter
    m = AvgMeter(3)
    assert m(1.0) == 1.0
    assert m(2.0) == 1.5
    assert m(3.0) == 2.0
    assert m(4.0) == 3.0          # window slid: mean(2,3,4)
    assert m.get_and_reset() == 3.0
    assert m.values == [] and m.get() == 0.0
