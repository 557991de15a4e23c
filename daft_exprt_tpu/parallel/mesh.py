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
    """Device-put a host batch dict with the batch axis sharded."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
