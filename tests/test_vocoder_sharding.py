"""Vocoder tensor-parallel sharding on the virtual CPU mesh: sharded
execution matches the unsharded reference."""
import numpy as np

from daft_exprt_tpu.models.hifigan import generator_forward, init_generator_params
from daft_exprt_tpu.parallel.mesh import make_mesh
from daft_exprt_tpu.parallel.vocoder_sharding import (
    generator_param_specs, make_sharded_vocoder, shard_generator_params,
)

SMALL_CONFIG = {
    'sampling_rate': 22050, 'upsample_rates': [8, 2],
    'upsample_kernel_sizes': [16, 4], 'upsample_initial_channel': 64,
    'resblock': '2', 'resblock_kernel_sizes': [3],
    'resblock_dilation_sizes': [[1, 3]], 'model_in_dim': 80,
}


def test_sharded_vocoder_matches_unsharded():
    import jax
    devices = jax.devices('cpu')
    mesh = make_mesh(n_data=2, n_model=2, devices=devices[:4])
    params = init_generator_params(jax.random.PRNGKey(0), SMALL_CONFIG)
    rng = np.random.RandomState(0)
    mel = rng.randn(4, 80, 16).astype(np.float32)

    ref = np.asarray(generator_forward(params, mel, SMALL_CONFIG))

    specs = generator_param_specs(params, mesh)
    # the wide conv_pre output channels must actually shard
    assert specs['conv_pre']['kernel' if 'kernel' in specs['conv_pre']
                             else 'w'] is not None
    sharded = shard_generator_params(params, mesh)
    voc = make_sharded_vocoder(mesh, SMALL_CONFIG)
    out = np.asarray(voc(sharded, mel))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)
