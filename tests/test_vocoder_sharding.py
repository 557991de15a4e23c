"""Vocoder tensor-parallel sharding on the virtual CPU mesh: sharded
execution matches the unsharded reference."""
import numpy as np
import pytest

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


@pytest.mark.slow
def test_gan_steps_dp_mesh_match_single_device():
    """GAN D/G steps sharded over an 8-device data mesh produce the same
    losses and parameter updates as the single-device steps."""
    import jax
    import numpy as np
    from daft_exprt_tpu.models.discriminators import (
        init_mpd_params, init_msd_params)
    from daft_exprt_tpu.models.hifigan import init_generator_params
    from daft_exprt_tpu.parallel.mesh import make_mesh
    from daft_exprt_tpu.vocoder_finetune import (
        generator_to_weight_norm, make_gan_steps)

    small_cfg = {
        'sampling_rate': 22050, 'upsample_rates': [8, 2],
        'upsample_kernel_sizes': [16, 4],
        'upsample_initial_channel': 16, 'resblock': '1',
        'resblock_kernel_sizes': [3], 'resblock_dilation_sizes': [[1, 3]],
        'model_in_dim': 80,
    }
    rng = np.random.RandomState(0)
    B, T = 8, 2048
    mel = rng.randn(B, 80, T // 16).astype(np.float32)
    y = (0.1 * rng.randn(B, 1, T)).astype(np.float32)

    g_wn = generator_to_weight_norm(
        init_generator_params(jax.random.PRNGKey(0), small_cfg))
    d0 = {'mpd': init_mpd_params(jax.random.PRNGKey(1))}
    msd_params, sn0 = init_msd_params(jax.random.PRNGKey(1))
    d0['msd'] = msd_params

    cpu = jax.devices('cpu')
    mesh = make_mesh(n_data=8, n_model=1, devices=cpu[:8])
    results = {}
    for name, m in (('single', None), ('mesh', mesh)):
        d_step, g_step, (og, od), loss_mel_fn = make_gan_steps(
            small_cfg, lr=1e-4, mesh=m)
        y_mel = loss_mel_fn(y[:, 0, :])
        d_opt, g_opt = od.init(d0), og.init(g_wn)
        d1, d_opt1, sn1, d_loss = d_step(d0, d_opt, sn0, g_wn, mel, y)
        g1, g_opt1, g_loss, mel_l1 = g_step(g_wn, g_opt, d1, sn1, mel, y,
                                            y_mel)
        results[name] = (float(d_loss), float(g_loss), float(mel_l1),
                         jax.tree_util.tree_leaves(g1)[0],
                         jax.tree_util.tree_leaves(d1)[0])
    # non-divisible global batch fails fast with a clear message
    import pytest
    with pytest.raises(ValueError, match='does not divide'):
        d_step(d0, od.init(d0), sn0, g_wn, mel[:6], y[:6])
    s, p = results['single'], results['mesh']
    assert abs(s[0] - p[0]) < 1e-4 * max(1.0, abs(s[0]))
    assert abs(s[1] - p[1]) < 1e-3 * max(1.0, abs(s[1]))
    assert abs(s[2] - p[2]) < 1e-4 * max(1.0, abs(s[2]))
    np.testing.assert_allclose(np.asarray(s[3]), np.asarray(p[3]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s[4]), np.asarray(p[4]),
                               atol=1e-5)
