"""
Optimizer construction and the single jitted train step.

TPU-first design: forward + loss + backward + optimizer update fuse into ONE
XLA program; with params replicated and the batch sharded over the mesh's
'data' axis, the SPMD partitioner inserts the gradient all-reduce (psum over
ICI) automatically — this one function subsumes the reference's
DistributedOptimizer + allreduce plumbing (utils/horovod.py:83-85).

Optimizer parity (reference: model_wrapper.py:172-233): separate depth/pose
param groups with per-group lr/weight-decay, optimizer class by name (Adam /
SGD / AdamW / RMSProp), StepLR / CosineAnnealing schedulers stepped per
epoch. Gradient clipping honours cfg.arch.clip_grad (declared but dead in the
reference trainer — live here).
"""

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    epoch: jnp.ndarray
    # exponential moving average of params (None = EMA off) — used for
    # eval/checkpoint-best when model.optimizer.ema_decay > 0
    ema_params: Any = None


def make_lr_schedule(scheduler_cfg, base_lr, steps_per_epoch):
    """Per-update-step schedule implementing epoch-wise StepLR / cosine,
    with an optional linear warmup over the first warmup_epochs
    (fractional ok — TPU-native addition; the reference has no warmup)."""
    name = scheduler_cfg.get('name', 'StepLR')
    warmup_steps = int(float(scheduler_cfg.get('warmup_epochs', 0.0))
                       * max(steps_per_epoch, 1))

    def with_warmup(sched):
        if warmup_steps <= 0:
            return sched

        def warmed(count):
            ramp = jnp.minimum((count + 1) / warmup_steps, 1.0)
            return ramp * sched(count)
        return warmed

    if name == 'StepLR':
        step_size = int(scheduler_cfg.get('step_size', 10))
        gamma = float(scheduler_cfg.get('gamma', 0.5))

        def sched(count):
            epoch = count // max(steps_per_epoch, 1)
            return base_lr * gamma ** (epoch // step_size)
        return with_warmup(sched)
    if name in ('CosineAnnealingLR', 'CosineAnnealing'):
        T_max = int(scheduler_cfg.get('T_max', 20))

        def sched(count):
            epoch = count // max(steps_per_epoch, 1)
            return base_lr * 0.5 * (1 + jnp.cos(
                jnp.pi * jnp.minimum(epoch, T_max) / T_max))
        return with_warmup(sched)
    return with_warmup(lambda count: base_lr)


def _base_optimizer(name, lr_schedule, weight_decay):
    name = name.lower()
    if name == 'adam':
        tx = optax.adam(lr_schedule)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx
    if name == 'adamw':
        return optax.adamw(lr_schedule, weight_decay=weight_decay)
    if name == 'sgd':
        return optax.sgd(lr_schedule, momentum=0.9)
    if name == 'rmsprop':
        return optax.rmsprop(lr_schedule)
    raise ValueError('Unknown optimizer {}'.format(name))


def make_optimizer(optimizer_cfg, scheduler_cfg, steps_per_epoch,
                   clip_grad=0.0):
    """Depth/pose param groups with per-group lr (reference parity)."""
    name = optimizer_cfg.get('name', 'Adam')
    depth_cfg = optimizer_cfg.get('depth', {})
    pose_cfg = optimizer_cfg.get('pose', {})
    accum = int(optimizer_cfg.get('grad_accumulation_steps', 1) or 1)
    if accum > 1:
        # inner schedules tick once per APPLIED step under MultiSteps
        steps_per_epoch = max(1, steps_per_epoch // accum)

    depth_tx = _base_optimizer(
        name, make_lr_schedule(scheduler_cfg, float(depth_cfg.get('lr', 2e-4)),
                               steps_per_epoch),
        float(depth_cfg.get('weight_decay', 0.0)))
    pose_tx = _base_optimizer(
        name, make_lr_schedule(scheduler_cfg, float(pose_cfg.get('lr', 2e-4)),
                               steps_per_epoch),
        float(pose_cfg.get('weight_decay', 0.0)))

    def label_fn(params):
        return {k: ('pose' if k == 'pose_net' else 'depth') for k in params}

    tx = optax.multi_transform({'depth': depth_tx, 'pose': pose_tx}, label_fn)
    if clip_grad and clip_grad > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    if accum > 1:
        # Large effective batches beyond HBM: average gradients over k
        # micro-steps, apply once (TPU-native addition — the whole
        # accumulate/apply cycle stays inside the jitted step sequence;
        # the inner schedule ticks per APPLIED step, so epoch-based
        # schedules keep their meaning when steps_per_epoch counts
        # micro-steps divided by k at the call site).
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def init_state(model, optimizer, batch, rng, ema=False):
    """Initialize params/batch_stats/opt_state from an example batch."""
    rngs = {'params': rng, 'flip': jax.random.fold_in(rng, 1),
            'dropout': jax.random.fold_in(rng, 2)}
    variables = model.init(rngs, batch, train=True)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = optimizer.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                      epoch=jnp.zeros((), jnp.int32),
                      ema_params=jax.tree_util.tree_map(jnp.copy, params)
                      if ema else None)


def make_train_step(model, optimizer, mesh=None, donate=True,
                    augment_fn=None, static_progress=False, ema_decay=0.0,
                    remat=False, qat_weights=False):
    """
    Build the jitted train step:
        (state, batch, rng, progress) -> (state, metrics)

    With `mesh`, the state is replicated and the batch sharded over 'data';
    XLA inserts the ICI gradient all-reduce. Non-finite losses skip the
    update (the TPU analogue of the reference's anomaly guard,
    horovod_trainer.py:268-277, without host sync). `augment_fn(batch, key)`
    runs on-device inside the step (ops/augment.py).

    `remat=True` wraps the forward in jax.checkpoint: the backward pass
    recomputes activations instead of storing them — ~1.3x FLOPs for a
    large cut in peak HBM (the lever for activation-bound OOMs like the
    literal-conv3d PackNet at bs8; tpu.remat in the config).

    `qat_weights=True` (model.params.qat contains 'weights') applies
    per-channel int8 fake-quantization with a straight-through gradient to
    every depth-net conv kernel before the forward: the optimizer updates
    LATENT float weights while forward/backward see the INT8 grid the NPU
    deploys (ops/quantization.py). Checkpoints stay float.
    """

    def _forward(params, batch_stats, batch, rng, progress, epoch):
        if qat_weights:
            from packnet_sfm_tpu.ops.quantization import (
                quantize_depth_net_params)
            params = quantize_depth_net_params(params)
        return model.apply(
            {'params': params, 'batch_stats': batch_stats},
            batch, train=True, progress=progress, epoch=epoch,
            # independent streams for the flip TTA draw and dropout masks
            rngs={'flip': rng, 'dropout': jax.random.fold_in(rng, 7)},
            mutable=['batch_stats'])

    forward = jax.checkpoint(_forward) if remat else _forward

    def loss_fn(params, batch_stats, batch, rng, progress, epoch):
        out, mutated = forward(params, batch_stats, batch, rng, progress,
                               epoch)
        return out['loss'], (mutated.get('batch_stats', batch_stats),
                             out['metrics'])

    def train_step(state, batch, rng, progress):
        if augment_fn is not None:
            rng, aug_key = jax.random.split(rng)
            batch = augment_fn(batch, aug_key)
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng, progress, state.epoch)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        # Non-finite guard: keep old state if the loss blew up.
        ok = jnp.isfinite(loss)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params)
        new_opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, state.opt_state)
        new_ema = state.ema_params
        if ema_decay > 0 and state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: jnp.where(ok, ema_decay * e
                                       + (1.0 - ema_decay) * p, e),
                state.ema_params, new_params)
        new_state = state.replace(params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  ema_params=new_ema,
                                  step=state.step + 1)
        metrics = {'loss': loss, **metrics}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    # progressive_scaling changes the traced structure (number of scales) ->
    # progress becomes a static arg; the trainer quantizes it to the scale
    # boundaries so at most num_scales variants compile.
    static_argnums = (3,) if static_progress else ()
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        return jax.jit(
            train_step,
            donate_argnums=donate_argnums,
            static_argnums=static_argnums,
            out_shardings=(rep, rep))
    return jax.jit(train_step, donate_argnums=donate_argnums,
                   static_argnums=static_argnums)


def make_eval_step(model, mesh=None, int8_weights=False):
    """Jitted eval forward: (state, batch) -> model outputs (no grads).

    With a mesh, outputs are pinned replicated so downstream host fetches
    see one logical array regardless of the batch's input sharding.
    Dual-head outputs mix tuple keys like ('integer', 0) with str keys,
    which a jitted pytree cannot sort — keys are string-encoded inside the
    program and decoded on the way out.

    `int8_weights` runs the forward over per-channel int8 fake-quantized
    depth-net conv kernels (weight PTQ measurement / QAT validation)."""
    SEP = '\x1f'

    def eval_step(state, batch):
        params = state.params
        if int8_weights:
            from packnet_sfm_tpu.ops.quantization import (
                quantize_depth_net_params)
            params = quantize_depth_net_params(params)
        out = model.apply(
            {'params': params, 'batch_stats': state.batch_stats},
            batch, train=False)
        return {SEP.join(str(p) for p in k) if isinstance(k, tuple) else k: v
                for k, v in out.items()}

    if mesh is not None and len(mesh.devices.flat) > 1:
        jitted = jax.jit(eval_step, out_shardings=NamedSharding(mesh, P()))
    else:
        jitted = jax.jit(eval_step)

    def call(state, batch):
        out = jitted(state, batch)
        def dec(k):
            if SEP not in k:
                return k
            head, idx = k.split(SEP)
            return (head, int(idx))
        return {dec(k): v for k, v in out.items()}
    return call


def make_eval_metrics_step(model, params_cfg, flip_tta=False,
                           int8_outputs=False, int8_weights=False):
    """
    ONE jitted program for the whole per-batch eval protocol: forward
    (+ the flip-TTA second forward folded in), sigmoid->depth conversions,
    and the 7-metric computation across all conversion modes with and
    without GT median scaling (reference: model_wrapper.py:621-790 does
    this host-side per mode; here it is a single XLA program so a val epoch
    costs one dispatch per batch instead of ~14).

    `int8_outputs` fake-quantizes the network's sigmoid outputs to uint8
    before depth conversion — the measured counterpart of the analytic
    NPU-deployment error analysis (ops/quantization.py; reference
    docs/quantization/ST2 dual-head study): eval once with and once
    without it and the metric delta IS the INT8 output-quantization cost.
    `int8_weights` additionally fake-quantizes the depth-net conv kernels
    per-channel (the full INT8-deployment measurement; after QAT training
    this scores exactly what the train step optimized).

    Returns step(state, batch) -> {mode: [7] metric vector}. `batch` must
    contain 'depth' (GT).
    """
    from packnet_sfm_tpu.ops.depth import (
        sigmoid_to_inv_depth, inv2depth, compute_depth_metrics,
        dual_head_to_depth, post_process_inv_depth)
    from packnet_sfm_tpu.ops.image import flip_lr

    min_d = float(params_cfg.min_depth)
    max_d = float(params_cfg.max_depth)
    crop = params_cfg.get('crop', '')
    scale_output = params_cfg.get('scale_output', 'resize')
    use_log = bool(params_cfg.get('use_log_space', False))

    def forward(state, batch):
        params = state.params
        if int8_weights:
            from packnet_sfm_tpu.ops.quantization import (
                quantize_depth_net_params)
            params = quantize_depth_net_params(params)
        return model.apply(
            {'params': params, 'batch_stats': state.batch_stats},
            batch, train=False)

    def step(state, batch):
        gt = batch['depth']
        out = forward(state, batch)
        if 'inv_depths' in out:
            sig = out['inv_depths'][0]
            if flip_tta:
                flipped = dict(batch)
                flipped['rgb'] = flip_lr(batch['rgb'])
                if 'input_depth' in batch:
                    flipped['input_depth'] = flip_lr(batch['input_depth'])
                out_f = forward(state, flipped)
                sig = post_process_inv_depth(sig, out_f['inv_depths'][0])
            if int8_outputs:
                from packnet_sfm_tpu.ops.quantization import fake_quant_u8
                sig = fake_quant_u8(sig)
            inv_lin = sigmoid_to_inv_depth(sig, min_d, max_d, False)
            inv_log = sigmoid_to_inv_depth(sig, min_d, max_d, True)
            depth_lin = inv2depth(inv_lin)
            depth_log = inv2depth(inv_log)
            cand = {'depth': depth_log if use_log else depth_lin,
                    'depth_lin': depth_lin, 'depth_log': depth_log}
        else:
            int_sig, frac_sig = out[('integer', 0)], out[('fractional', 0)]
            if int8_outputs:
                from packnet_sfm_tpu.ops.quantization import fake_quant_u8
                int_sig = fake_quant_u8(int_sig)
                frac_sig = fake_quant_u8(frac_sig)
            cand = {'depth': dual_head_to_depth(int_sig, frac_sig, max_d)}
        modes = {}
        for name, pred in cand.items():
            modes[name] = compute_depth_metrics(
                gt, pred, min_d, max_d, crop=crop,
                scale_output=scale_output, use_gt_scale=False)
            modes[name + '_gt'] = compute_depth_metrics(
                gt, pred, min_d, max_d, crop=crop,
                scale_output=scale_output, use_gt_scale=True)
        return modes

    return jax.jit(step)
