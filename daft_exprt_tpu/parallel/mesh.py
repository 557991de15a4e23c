"""Device mesh construction + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL process topology
(reference: src/daft_exprt/train.py:222-272, hparams.py:63): a single
`jax.sharding.Mesh` with a ``data`` axis (data parallelism — the reference's
one strategy, SURVEY.md §2.3) and an optional ``model`` axis for sharding
wide vocoder channels. Gradient reduction happens through XLA collectives
inserted by jit from the sharding annotations — no explicit NCCL calls.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``jax.devices()`` then spans the pod slice and the same code scales over
ICI/DCN.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None,
              data_axis='data', model_axis='model'):
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    if n_data * n_model > n_total:
        raise ValueError(f'mesh {n_data}x{n_model} exceeds {n_total} devices')
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (data_axis, model_axis))


def batch_sharding(mesh, data_axis='data'):
    """Shard leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, data_axis='data'):
    """Shard a host batch dict along the batch axis of the mesh.

    Single-process: a plain sharded device_put. Multi-process
    (``jax.distributed.initialize``): each host passes its *local* shard
    (the per-host slice the data iterator yields, reference
    DistributedSampler semantics) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the local leading dim
    times process_count gives the global batch.
    """
    sharding = batch_sharding(mesh, data_axis)
    # derive multi-process-ness from the mesh itself: jax.process_count()
    # reports the *default* backend, which can differ from the mesh's
    # (e.g. the axon TPU plugin registers itself even when the mesh spans
    # a distributed CPU client)
    n_proc = len({d.process_index for d in mesh.devices.flat})
    if n_proc == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        # assemble the global array from this host's local shard via the
        # low-level API: make_array_from_process_local_data consults
        # jax.process_count() (the default backend — wrong when another
        # platform plugin is registered), this path consults only the mesh
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        idx_map = sharding.addressable_devices_indices_map(global_shape)
        starts = [(sl[0].start or 0) for sl in idx_map.values()]
        base = min(starts)          # this host's global row offset
        arrays = []
        for d, sl in idx_map.items():
            s0 = sl[0]
            lo = (s0.start or 0) - base
            hi = (global_shape[0] if s0.stop is None else s0.stop) - base
            arrays.append(jax.device_put(x[lo:hi], d))
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrays)

    return jax.tree_util.tree_map(put, batch)
