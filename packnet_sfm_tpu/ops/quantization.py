"""
INT8 quantization: PTQ simulation for depth heads + QAT fake-quant ops.

Reproduces the reference's quantization-error analysis
(docs/QUANTIZATION.md; reference docs/quantization/ST2/,
utils/post_process_depth.py:88-95,143-146): fake-quantize the network's
sigmoid outputs to uint8 and reconstruct depth through each head design to
measure the induced depth error.

- single-head linear:   depth = 1 / (min_inv + range * Q(sig))
- single-head log:      depth = 1 / exp(lerp(log min_inv, log max_inv, Q(sig)))
- dual-head:            depth = Q(int_sig) * max_depth + Q(frac_sig)

Quantization-aware training (TPU-native addition — the reference only
VALIDATES INT8 post-hoc, docs/quantization/ST2/): straight-through
estimators for the two quantizers an INT8 NPU applies —
- `ste_quant_u8`: the uint8 output-tensor quantizer (what fake_quant_u8
  simulates at eval), differentiable via identity;
- `fake_quant_weight_per_channel`: symmetric per-output-channel int8
  weight quantization (the standard NPU conv-weight scheme), STE through
  the round;
- `quantize_depth_net_params`: applies the weight quantizer to every conv
  kernel of the depth net's param tree (the deployed subgraph), so a
  train/eval step over the transformed tree trains/scores the model the
  NPU will actually run. Checkpoints keep latent float weights.

Enable via `model.params.qat: 'outputs' | 'weights' | 'weights+outputs'`
(config/defaults.py); measure via `scripts/eval.py --int8 --int8-weights`.
"""

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.ops.depth import (
    sigmoid_to_depth_linear, sigmoid_to_depth_log, dual_head_to_depth)


def fake_quant_u8(x):
    """Uniform 8-bit fake quantization of a [0,1] tensor (round-to-nearest)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


def _ste(x, q):
    """Straight-through estimator: forward q, backward identity to x."""
    return x + jax.lax.stop_gradient(q - x)


def ste_quant_u8(x):
    """fake_quant_u8 with a straight-through gradient (QAT on outputs)."""
    return _ste(x, fake_quant_u8(x))


def fake_quant_weight_per_channel(w, bits=8):
    """Symmetric per-output-channel weight fake-quantization with STE.

    HWIO conv kernels (flax layout): the output channel is the LAST axis;
    each output channel gets its own scale max|w| / (2^(bits-1) - 1), the
    per-channel scheme NPU conv engines use. Zero channels quantize to
    zero (scale floored at 1e-12)."""
    qmax = float(2 ** (bits - 1) - 1)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax) * scale
    return _ste(w, q)


def quantize_depth_net_params(params, bits=8):
    """Fake-quantize every conv kernel under the 'depth_net' scope of a
    model param tree (STE — safe under grad). Non-kernel leaves (bias, BN
    scale/bias, FiLM affines folded as 1x1 convs keep their 4-d kernels and
    ARE quantized) and every other submodule (pose net) pass through."""
    if 'depth_net' not in params:
        return params

    def maybe_q(path, leaf):
        last = path[-1]
        name = getattr(last, 'key', getattr(last, 'name', None))
        if name == 'kernel' and hasattr(leaf, 'ndim') and leaf.ndim >= 2:
            return fake_quant_weight_per_channel(leaf, bits=bits)
        return leaf

    out = dict(params)
    out['depth_net'] = jax.tree_util.tree_map_with_path(
        maybe_q, params['depth_net'])
    return out


def quantized_depth_single(sig, min_depth, max_depth, use_log_space=False):
    q = fake_quant_u8(sig)
    if use_log_space:
        return sigmoid_to_depth_log(q, min_depth, max_depth)
    return sigmoid_to_depth_linear(q, min_depth, max_depth)


def quantized_depth_dual(integer_sig, fractional_sig, max_depth):
    return dual_head_to_depth(fake_quant_u8(integer_sig),
                              fake_quant_u8(fractional_sig), max_depth)


def quantization_error_report(min_depth=0.5, max_depth=15.0, n=4096):
    """
    Sweep the representable depth range and report the worst/mean absolute
    depth error induced by 8-bit quantization for each head design
    (the reference's +-28.4mm single vs +-1.96mm dual analysis).
    """
    depths = jnp.linspace(min_depth, max_depth, n)

    # encode each design's ideal (float) code for these depths, then decode
    # through the quantizer
    min_inv, max_inv = 1.0 / max_depth, 1.0 / min_depth
    sig_lin = (1.0 / depths - min_inv) / (max_inv - min_inv)
    dec_lin = quantized_depth_single(sig_lin, min_depth, max_depth, False)

    log_min, log_max = jnp.log(min_inv), jnp.log(max_inv)
    sig_log = (jnp.log(1.0 / depths) - log_min) / (log_max - log_min)
    dec_log = quantized_depth_single(sig_log, min_depth, max_depth, True)

    int_sig = jnp.floor(depths) / max_depth
    frac_sig = depths - jnp.floor(depths)
    dec_dual = quantized_depth_dual(int_sig, frac_sig, max_depth)

    def stats(dec):
        err = jnp.abs(dec - depths)
        return {'max_mm': float(err.max() * 1000),
                'mean_mm': float(err.mean() * 1000)}

    return {
        'single_linear': stats(dec_lin),
        'single_log': stats(dec_log),
        'dual_head': stats(dec_dual),
    }
