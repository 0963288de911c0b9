"""
Checkpointing: self-describing checkpoints carrying config + model +
optimizer + scheduler state, mirroring the reference payload
(reference: models/model_checkpoint.py:66-75 {config, epoch, state_dict,
optimizer, scheduler}) — here: {config, epoch, step, params, batch_stats,
opt_state}.

Format: a single .ckpt file = pickled dict with numpy leaves (host-side,
device-independent). Top-k monitoring logic mirrors ModelCheckpoint
(model_checkpoint.py:44-126).
"""

import os
import pickle

import numpy as np
import jax


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path, config, state, epoch=None, extra=None):
    """Write a self-describing checkpoint. `state` is a TrainState.
    `extra`: additional payload entries (e.g. mid-epoch loader position)."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    payload = {
        'config': config.to_dict() if hasattr(config, 'to_dict') else dict(config),
        'epoch': int(epoch if epoch is not None else state.epoch),
        'step': int(state.step),
        'params': _to_host(state.params),
        'batch_stats': _to_host(state.batch_stats),
        'opt_state': _to_host(state.opt_state),
    }
    if getattr(state, 'ema_params', None) is not None:
        payload['ema_params'] = _to_host(state.ema_params)
    if extra:
        payload.update(extra)
    # pid-unique tmp: concurrent writers (multi-host auto-conversion of the
    # same reference ckpt on a shared fs) each publish atomically; last
    # os.replace wins with a valid file either way
    tmp = '{}.tmp.{}'.format(path, os.getpid())
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(path):
    if os.path.isdir(path):
        ckpts = sorted(p for p in os.listdir(path) if p.endswith('.ckpt'))
        assert ckpts, 'No .ckpt files in {}'.format(path)
        path = os.path.join(path, ckpts[-1])
    from packnet_sfm_tpu.export.reference_convert import (
        convert, is_torch_checkpoint)
    if is_torch_checkpoint(path):
        # a reference (torch) checkpoint was handed to a CLI: convert it
        # transparently, caching the result next to the source
        converted = path + '.tpu.ckpt'
        if not (os.path.exists(converted) and
                os.path.getmtime(converted) >= os.path.getmtime(path)):
            print('[checkpoint] {} is a reference torch checkpoint; '
                  'converting -> {}'.format(path, converted))
            convert(path, converted)
        path = converted
    with open(path, 'rb') as f:
        return pickle.load(f)


def save_code(dirpath, root=None):
    """Snapshot the framework source next to the checkpoints as
    code.tar.gz — the reference tars its whole cwd on the first S3 sync
    (model_checkpoint.py:19-21); this version scopes to the framework
    files and skips caches/artifacts so the snapshot is reproducible."""
    import tarfile
    root = root or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out = os.path.join(dirpath, 'code.tar.gz')
    junk = {'.git', '__pycache__', 'runs', '.jax_cache', '.jax_tpu_cache',
            '.pytest_cache'}

    def _filter(ti):
        parts = ti.name.split('/')
        if any(p in junk for p in parts) or ti.name.endswith(
                ('.pyc', '.ckpt')):
            return None
        return ti

    with tarfile.open(out, 'w:gz') as tar:
        for sub in ('packnet_sfm_tpu', 'scripts', 'configs', 'tests',
                    'bench.py', 'pyproject.toml'):
            p = os.path.join(root, sub)
            if os.path.exists(p):
                tar.add(p, arcname=sub, filter=_filter)
    return out


def s3_sync(local_dir, s3_path):
    """Sync checkpoints to S3 via the aws CLI when available
    (reference: model_checkpoint.py:12-21,78-92). No-op without awscli."""
    import shutil
    import subprocess
    if not s3_path or shutil.which('aws') is None:
        return False
    try:
        subprocess.run(['aws', 's3', 'sync', local_dir, s3_path, '--quiet'],
                       check=True, timeout=600)
        return True
    except Exception as e:  # pragma: no cover - external service
        print('[checkpoint] s3 sync failed: {}'.format(e))
        return False


class ModelCheckpoint:
    """Top-k checkpoint monitor (reference: model_checkpoint.py:27-126)."""

    def __init__(self, filepath, monitor='loss', save_top_k=5, mode='auto',
                 period=1, s3_path='', s3_frequency=1):
        self.dirpath = os.path.dirname(filepath) or '.'
        self.filename_tpl = os.path.basename(filepath) or 'model_{epoch:02d}'
        self.monitor = monitor
        self.save_top_k = save_top_k
        self.period = period
        self.epochs_since_last = 0
        self.best_k_models = {}
        self.s3_path = s3_path
        self.s3_frequency = s3_frequency
        self._saves_since_sync = 0
        self._code_saved = False
        if mode == 'auto':
            # metric-name heuristic (reference: model_checkpoint.py:44-54)
            mode = 'max' if any(k in monitor for k in ['a1', 'a2', 'a3']) \
                else 'min'
        self.mode = mode

    def _better(self, a, b):
        return a > b if self.mode == 'max' else a < b

    def _format_name(self, epoch, metrics):
        name = self.filename_tpl
        values = {'epoch': epoch, **{k: float(v) for k, v in metrics.items()}}
        # '{epoch:02d}_{abs_rel:.3f}'-style templating
        try:
            name = name.format(**values)
        except (KeyError, IndexError):
            name = 'epoch_{:02d}'.format(epoch)
        return name + '.ckpt'

    def check_and_save(self, config, state, metrics, epoch):
        """Save if due and keep only the top-k by the monitored metric."""
        self.epochs_since_last += 1
        if self.epochs_since_last < self.period:
            return None
        self.epochs_since_last = 0
        current = float(metrics.get(self.monitor, metrics.get('loss', 0.0)))
        path = os.path.join(self.dirpath, self._format_name(epoch, metrics))
        save_checkpoint(path, config, state, epoch)
        self.best_k_models[path] = current
        if self.save_top_k > 0 and len(self.best_k_models) > self.save_top_k:
            worst = max(self.best_k_models,
                        key=lambda p: self.best_k_models[p]) \
                if self.mode == 'min' else \
                min(self.best_k_models, key=lambda p: self.best_k_models[p])
            self.best_k_models.pop(worst)
            if os.path.exists(worst):
                os.remove(worst)
        self._saves_since_sync += 1
        if self.s3_path and self._saves_since_sync >= self.s3_frequency:
            self._saves_since_sync = 0
            if not self._code_saved:
                # one-time code snapshot rides the first sync (reference
                # save_code, model_checkpoint.py:88-91)
                self._code_saved = True
                try:
                    save_code(self.dirpath)
                except Exception as e:  # noqa: BLE001 — never block saves
                    print('[checkpoint] code snapshot failed: {}'.format(e))
            s3_sync(self.dirpath, self.s3_path)
        return path
