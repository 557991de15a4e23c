"""Tensor-parallel sharding of the HiFi-GAN generator.

BASELINE.json: "the decoder/vocoder sharded across chips where needed".
The generator's channel dimensions (512→256→128→64→32) shard naturally:
conv kernels are partitioned on the output-channel axis, biases likewise,
and activations on the channel axis. Under jit with these shardings, XLA
inserts the all-to-alls/psums over ICI where consecutive convs contract the
sharded channel dimension — no hand-written collectives.

The narrow tail (channels < devices) and the scalar-channel conv_post stay
replicated; the wide early layers, which hold most of the parameters and
FLOPs, split across the ``model`` axis.
"""
from typing import Any, Dict

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from daft_exprt_tpu.models.hifigan import DEFAULT_CONFIG, generator_forward


def generator_param_specs(params: Dict[str, Any], mesh, model_axis='model'):
    """PartitionSpec pytree for generator params: output channels sharded
    where divisible by the model-axis size; everything else replicated."""
    n_shard = mesh.shape[model_axis]

    def spec_for(path, leaf):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        w = leaf
        if name == 'b':
            return P(model_axis) if w.shape[0] % n_shard == 0 and \
                w.shape[0] >= n_shard else P()
        # kernels, torch layouts: conv (out, in, k); transposed (in, out, k)
        if w.ndim == 3:
            out_axis = 1 if str(path[0].key).startswith('ups') else 0
            if w.shape[out_axis] % n_shard == 0 and \
                    w.shape[out_axis] >= n_shard and w.shape[out_axis] > 1:
                spec = [None, None, None]
                spec[out_axis] = model_axis
                return P(*spec)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_generator_params(params, mesh, model_axis='model'):
    specs = generator_param_specs(params, mesh, model_axis)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def make_sharded_vocoder(mesh, config=None, model_axis='model',
                         data_axis='data'):
    """Returns a jitted vocoder fn whose weights/activations are TP-sharded
    on ``model_axis`` and whose batch is DP-sharded on ``data_axis``."""
    cfg = config or DEFAULT_CONFIG

    def fn(params, mel):
        return generator_forward(params, mel, cfg)

    data = NamedSharding(mesh, P(data_axis))
    out = NamedSharding(mesh, P(data_axis))
    return jax.jit(fn, in_shardings=(None, data), out_shardings=out)
