"""
Device mesh + sharding helpers — the TPU-native distributed backend.

Replaces the reference's entire Horovod/NCCL surface
(reference: utils/horovod.py:11-133, utils/reduce.py:9-80,
model_wrapper.py:1138-1144):
- gradient allreduce        -> inserted by the SPMD partitioner (replicated
                               params + batch sharded over the 'data' axis)
- param/optimizer broadcast -> implicit: replicated init from one PRNG key
- metric allreduce          -> jnp mean of sharded per-example metrics
- DistributedSampler        -> per-host shard of the index space
                               (datasets/loader.py)

Collectives ride ICI via XLA; nothing here talks NCCL/MPI.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape=(), axis_names=('data',), devices=None,
              batch_size=None):
    """Create a Mesh; default = all devices on one 'data' axis.

    When `batch_size` is given, the data axis is clamped to the largest
    device count that divides it (XLA requires the sharded dim divisible by
    the axis size)."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        n = len(devices)
        if batch_size is not None:
            while n > 1 and batch_size % n != 0:
                n -= 1
        mesh_shape = (n,)
    devs = np.asarray(devices[:int(np.prod(mesh_shape))]).reshape(mesh_shape)
    return Mesh(devs, axis_names)


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh, axis='data'):
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh, axis='data', spatial_axis=None):
    """
    Place a host batch dict onto the mesh, batch-dim sharded; with
    `spatial_axis` (a second mesh axis), image H is sharded as well — the
    SPMD partitioner then spatially partitions the convolutions and inserts
    the halo exchanges over ICI automatically (the context-parallel
    analogue for hi-res inputs, SURVEY.md §2.10/§5). Arrays whose dims
    aren't divisible fall back to batch-only or full replication.
    """
    n = mesh.shape[axis]
    ns = mesh.shape[spatial_axis] if spatial_axis else 1

    def put(x):
        import jax.numpy as jnp
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] % n != 0:
            return jax.device_put(x, replicated(mesh))
        if (spatial_axis and x.ndim >= 3 and x.shape[1] % ns == 0
                and x.shape[1] > ns):
            spec = P(axis, spatial_axis, *([None] * (x.ndim - 2)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(
            mesh, P(axis, *([None] * (x.ndim - 1)))))
    return jax.tree_util.tree_map(put, batch)


def replicate_state(state, mesh):
    """Place a train-state pytree fully replicated on the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def prefetch_to_device(iterator, mesh, size=2, spatial_axis=None,
                       transform=None):
    """
    Keep `size` batches resident on device ahead of consumption, overlapping
    H2D transfer with the device step (the tf.data/grain device-prefetch
    idiom; device_put is async so this pipeline is free).
    """
    import collections
    buf = collections.deque()

    def put(b):
        if transform is not None:
            b = transform(b)
        return shard_batch(b, mesh, spatial_axis=spatial_axis)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


# -- reference-compatible rank/size shims (world is one jit program on TPU) --

def rank():
    return jax.process_index()


def world_size():
    return jax.process_count()


def is_rank_0():
    return jax.process_index() == 0
