"""
JAX-native export: serialize the jitted eval forward to a portable
StableHLO artifact via jax.export (the TPU-native deployment path, alongside
the torch/ONNX mirror in torch_mirror.py).
"""

import jax
import jax.numpy as jnp


def export_eval_forward(model, variables, height, width, batch=1,
                        with_lidar=False):
    """Serialize model.apply(train=False) to StableHLO bytes."""
    from jax import export as jax_export

    def forward(rgb, input_depth=None):
        batch_dict = {'rgb': rgb}
        if input_depth is not None:
            batch_dict['input_depth'] = input_depth
        out = model.apply(variables, batch_dict, train=False)
        if 'inv_depths' in out:
            return out['inv_depths'][0]
        return out[('integer', 0)], out[('fractional', 0)]

    rgb_spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    if with_lidar:
        d_spec = jax.ShapeDtypeStruct((batch, height, width, 1), jnp.float32)
        exported = jax_export.export(jax.jit(forward))(rgb_spec, d_spec)
    else:
        exported = jax_export.export(jax.jit(forward))(rgb_spec)
    return exported.serialize()


def save_stablehlo(path, model, variables, height, width, **kw):
    blob = export_eval_forward(model, variables, height, width, **kw)
    with open(path, 'wb') as f:
        f.write(blob)
    return path


def load_and_run(path, *args):
    """Deserialize and call an exported artifact (round-trip validation)."""
    from jax import export as jax_export
    with open(path, 'rb') as f:
        exported = jax_export.deserialize(f.read())
    return exported.call(*args)
