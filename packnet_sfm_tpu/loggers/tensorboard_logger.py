"""TensorBoard logger (reference: loggers/tensorboard_logger.py:7-40)."""

import numpy as np


class TensorboardLogger:
    def __init__(self, log_dir='runs', log_frequency=100):
        from torch.utils.tensorboard import SummaryWriter
        self.writer = SummaryWriter(log_dir=log_dir)
        self.log_frequency = log_frequency
        self._step = 0

    def log_metrics(self, metrics, step=None):
        step = self._step if step is None else step
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass
        self._step = step + 1

    def log_images(self, tag, images, step=None):
        """images: [N,H,W,3] float in [0,1] (NHWC -> CHW for TB)."""
        step = self._step if step is None else step
        for i, img in enumerate(images[:4]):
            self.writer.add_image('{}/{}'.format(tag, i),
                                  np.transpose(np.asarray(img), (2, 0, 1)),
                                  step)

    def log_config(self, config):
        self.writer.add_text('config', str(config))

    def finish(self):
        self.writer.flush()
        self.writer.close()
