"""W&B logger (reference: loggers/wandb_logger.py:18-120); degrades to a
no-op when wandb is unavailable or offline."""


class WandbLogger:
    def __init__(self, name='', project='', entity='', tags=(), dir='',
                 config=None):
        try:
            import wandb
            self.run = wandb.init(
                name=name or None, project=project or None,
                entity=entity or None, tags=list(tags) or None,
                dir=dir or None, config=config, mode='offline')
            self._wandb = wandb
        except Exception as e:  # pragma: no cover - env without wandb
            print('[WandbLogger] disabled ({})'.format(e))
            self.run = None
            self._wandb = None

    def log_metrics(self, metrics, step=None):
        if self.run is not None:
            self.run.log({k: float(v) for k, v in metrics.items()
                          if _is_num(v)}, step=step)

    def log_images(self, tag, images, step=None):
        if self.run is not None and self._wandb is not None:
            self.run.log({tag: [self._wandb.Image(img) for img in images[:4]]},
                         step=step)

    def log_config(self, config):
        pass  # passed at init

    def finish(self):
        if self.run is not None:
            self.run.finish()


def _is_num(v):
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
