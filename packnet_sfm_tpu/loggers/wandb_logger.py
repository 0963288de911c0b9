"""W&B logger (reference: loggers/wandb_logger.py:18-120); degrades to a
no-op only when wandb itself is unavailable."""


class WandbLogger:
    def __init__(self, name='', project='', entity='', tags=(), dir='',
                 config=None, mode=''):
        """mode: '' lets wandb decide (online with credentials, else its own
        fallback), 'offline'/'disabled'/'online' force it (cfg.wandb.dry_run
        maps to 'offline' — reference gates runs the same way via dry_run)."""
        try:
            import wandb
            kwargs = dict(
                name=name or None, project=project or None,
                entity=entity or None, tags=list(tags) or None,
                dir=dir or None, config=config)
            if mode:
                kwargs['mode'] = mode
            self.run = wandb.init(**kwargs)
            self._wandb = wandb
        except Exception as e:  # pragma: no cover - env without wandb
            print('[WandbLogger] disabled ({})'.format(e))
            self.run = None
            self._wandb = None

    @property
    def run_name(self):
        return self.run.name if self.run is not None else None

    @property
    def run_url(self):
        """Run URL, recorded into cfg.wandb.url so checkpointed configs
        carry run identity (reference: horovod_trainer.py:54-56,
        wandb_logger.py:107-111)."""
        if self.run is None:
            return None
        return 'https://app.wandb.ai/{}/{}/runs/{}'.format(
            self.run.entity, self.run.project, self.run.id)

    def log_metrics(self, metrics, step=None):
        if self.run is not None:
            self.run.log({k: float(v) for k, v in metrics.items()
                          if _is_num(v)}, step=step)

    def log_images(self, tag, images, step=None):
        if self.run is not None and self._wandb is not None:
            self.run.log({tag: [self._wandb.Image(img) for img in images[:4]]},
                         step=step)

    def log_config(self, config):
        """Merge a (possibly updated) config tree into the run config
        (reference: wandb_logger.py log_config)."""
        if self.run is not None:
            try:
                cfg = config if isinstance(config, dict) else dict(config)
            except (TypeError, ValueError):
                cfg = {'config': repr(config)}
            self.run.config.update(_flatten(cfg), allow_val_change=True)

    def finish(self):
        if self.run is not None:
            self.run.finish()


def _flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        key = '{}.{}'.format(prefix, k) if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _is_num(v):
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
