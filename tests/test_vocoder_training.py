"""Vocoder GAN training stack: discriminator parity vs the reference torch
implementation, loss parity, dataset cropping, and a 2-step GAN smoke run."""
import numpy as np
import pytest
import torch

from daft_exprt_tpu.models.discriminators import (
    discriminator_loss, feature_loss, generator_loss, init_mpd_params,
    init_msd_params, mpd_forward, msd_forward,
)

from tests.ref_loader import load_reference_module


@pytest.fixture(scope='module')
def ref_disc():
    return load_reference_module('vocoder.discriminators')


def convert_torch_mpd(tmpd):
    """torch MPD state_dict → our params pytree (weight-norm g/v kept)."""
    sd = {k: v.detach().numpy() for k, v in tmpd.state_dict().items()}
    from daft_exprt_tpu.models.discriminators import MPD_PERIODS
    import jax.numpy as jnp
    params = {}
    for i, period in enumerate(MPD_PERIODS):
        sub = {}
        for j in range(5):
            sub[f'conv_{j}'] = {
                'g': jnp.asarray(sd[f'discriminators.{i}.convs.{j}.weight_g']),
                'v': jnp.asarray(sd[f'discriminators.{i}.convs.{j}.weight_v']),
                'b': jnp.asarray(sd[f'discriminators.{i}.convs.{j}.bias']),
            }
        sub['conv_post'] = {
            'g': jnp.asarray(sd[f'discriminators.{i}.conv_post.weight_g']),
            'v': jnp.asarray(sd[f'discriminators.{i}.conv_post.weight_v']),
            'b': jnp.asarray(sd[f'discriminators.{i}.conv_post.bias']),
        }
        params[f'period_{period}'] = sub
    return params


def test_mpd_parity(ref_disc):
    torch.manual_seed(0)
    tmpd = ref_disc.MultiPeriodDiscriminator()
    tmpd.eval()
    params = convert_torch_mpd(tmpd)
    rng = np.random.RandomState(0)
    y = rng.randn(2, 1, 4096).astype(np.float32) * 0.3
    y_hat = rng.randn(2, 1, 4096).astype(np.float32) * 0.3
    with torch.no_grad():
        t_r, t_g, t_fr, t_fg = tmpd(torch.FloatTensor(y),
                                    torch.FloatTensor(y_hat))
    j_r, j_g, j_fr, j_fg = mpd_forward(params, y, y_hat)
    for a, b in zip(j_r, t_r):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)
    for a, b in zip(j_g, t_g):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)
    # feature maps too (they feed the FM loss)
    for fa, fb in zip(j_fr, t_fr):
        for a, b in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)


def test_losses_parity(ref_disc):
    rng = np.random.RandomState(1)
    reals = [rng.randn(2, 50).astype(np.float32) for _ in range(3)]
    gens = [rng.randn(2, 50).astype(np.float32) for _ in range(3)]
    t_loss, _, _ = ref_disc.discriminator_loss(
        [torch.FloatTensor(r) for r in reals],
        [torch.FloatTensor(g) for g in gens])
    j_loss, _, _ = discriminator_loss(reals, gens)
    assert abs(float(j_loss) - float(t_loss)) < 1e-4

    t_gloss, _ = ref_disc.generator_loss([torch.FloatTensor(g) for g in gens])
    j_gloss, _ = generator_loss(gens)
    assert abs(float(j_gloss) - float(t_gloss)) < 1e-4

    fr = [[rng.randn(2, 8, 10).astype(np.float32) for _ in range(3)]
          for _ in range(2)]
    fg = [[rng.randn(2, 8, 10).astype(np.float32) for _ in range(3)]
          for _ in range(2)]
    t_fm = ref_disc.feature_loss(
        [[torch.FloatTensor(x) for x in f] for f in fr],
        [[torch.FloatTensor(x) for x in f] for f in fg])
    j_fm = feature_loss(fr, fg)
    assert abs(float(j_fm) - float(t_fm)) < 1e-4


def test_msd_shapes_and_sn_state():
    import jax
    params, sn_state = init_msd_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    y = rng.randn(1, 1, 4096).astype(np.float32)
    y_hat = rng.randn(1, 1, 4096).astype(np.float32)
    rs, gs, frs, fgs, new_state = msd_forward(params, sn_state, y, y_hat)
    assert len(rs) == len(gs) == 3
    for r in rs:
        assert np.isfinite(np.asarray(r)).all()
    # spectral-norm power iteration state updated
    u_old = np.asarray(sn_state['scale_0']['conv_0'])
    u_new = np.asarray(new_state['scale_0']['conv_0'])
    assert not np.allclose(u_old, u_new)


@pytest.mark.slow
def test_finetune_dataset_and_gan_smoke(tmp_path):
    """2 GAN steps on a tiny config + real dataset cropping."""
    import jax
    from daft_exprt_tpu.frontend.audio import save_wav
    from daft_exprt_tpu.models.hifigan import init_generator_params
    from daft_exprt_tpu.vocoder_finetune import (
        HiFiGANFinetuneDataset, generator_from_weight_norm,
        generator_to_weight_norm, make_gan_steps,
    )

    small_cfg = {
        'sampling_rate': 22050, 'upsample_rates': [8, 8, 2, 2],
        'upsample_kernel_sizes': [16, 16, 4, 4],
        'upsample_initial_channel': 16, 'resblock': '2',
        'resblock_kernel_sizes': [3], 'resblock_dilation_sizes': [[1, 3]],
        'model_in_dim': 80,
    }
    rng = np.random.RandomState(0)
    for i in range(3):
        T = rng.randint(40, 90)
        np.save(tmp_path / f'utt{i}.npy',
                rng.randn(80, T).astype(np.float32))
        save_wav(str(tmp_path / f'utt{i}.wav'),
                 rng.randn(T * 256).astype(np.float32) * 0.1, 22050)

    ds = HiFiGANFinetuneDataset(str(tmp_path), segment_size=2048)
    mel, wav, name = ds[0]
    assert mel.shape == (80, 8) and wav.shape == (2048,)

    d_step, g_step, (og, od), loss_mel_fn = make_gan_steps(small_cfg, lr=1e-4)
    g_plain = init_generator_params(jax.random.PRNGKey(0), small_cfg)
    g_wn = generator_to_weight_norm(g_plain)
    # wn roundtrip is identity
    rt = generator_from_weight_norm(g_wn)
    for k in ('conv_pre', 'conv_post'):
        np.testing.assert_allclose(np.asarray(rt[k]['w']),
                                   np.asarray(g_plain[k]['w']), rtol=1e-6)

    from daft_exprt_tpu.models.discriminators import (
        init_mpd_params, init_msd_params)
    d_params = {'mpd': init_mpd_params(jax.random.PRNGKey(1))}
    msd_params, sn_state = init_msd_params(jax.random.PRNGKey(1))
    d_params['msd'] = msd_params
    g_opt = og.init(g_wn)
    d_opt = od.init(d_params)

    mels, wavs, _ = next(ds.batches(2))
    y = wavs[:, None, :]
    y_mel = loss_mel_fn(wavs)
    losses = []
    for _ in range(2):
        d_params, d_opt, sn_state, d_loss = d_step(
            d_params, d_opt, sn_state, g_wn, mels, y)
        g_wn, g_opt, g_loss, mel_l1 = g_step(
            g_wn, g_opt, d_params, sn_state, mels, y, y_mel)
        losses.append((float(d_loss), float(g_loss), float(mel_l1)))
    for d_loss, g_loss, mel_l1 in losses:
        assert np.isfinite(d_loss) and np.isfinite(g_loss)
        assert mel_l1 > 0


@pytest.mark.slow
def test_gan_steps_bf16_mixed_precision():
    """bf16-compute GAN steps: finite losses close to the f32 steps at
    init, params/optimizer stay f32, and the SN state still updates."""
    import jax
    from daft_exprt_tpu.models.discriminators import (
        init_mpd_params, init_msd_params)
    from daft_exprt_tpu.models.hifigan import init_generator_params
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
    B, T = 2, 2048
    mel = rng.randn(B, 80, T // 16).astype(np.float32)
    y = (0.1 * rng.randn(B, 1, T)).astype(np.float32)

    g_wn = generator_to_weight_norm(
        init_generator_params(jax.random.PRNGKey(0), small_cfg))
    d_params = {'mpd': init_mpd_params(jax.random.PRNGKey(1))}
    msd_params, sn_state = init_msd_params(jax.random.PRNGKey(1))
    d_params['msd'] = msd_params

    results = {}
    for dtype in ('float32', 'bfloat16'):
        d_step, g_step, (og, od), loss_mel_fn = make_gan_steps(
            small_cfg, lr=1e-4, compute_dtype=dtype)
        y_mel = loss_mel_fn(y[:, 0, :])
        dp, sn = jax.tree_util.tree_map(lambda x: x, d_params), sn_state
        d_opt, g_opt = od.init(dp), og.init(g_wn)
        dp2, d_opt2, sn2, d_loss = d_step(dp, d_opt, sn, g_wn, mel, y)
        g2, g_opt2, g_loss, mel_l1 = g_step(g_wn, g_opt, dp2, sn2, mel, y,
                                            y_mel)
        leaves = jax.tree_util.tree_leaves((dp2, g2))
        assert all(l.dtype == np.float32 for l in leaves)
        assert not np.allclose(np.asarray(sn['scale_0']['conv_0']),
                               np.asarray(sn2['scale_0']['conv_0']))
        results[dtype] = (float(d_loss), float(g_loss), float(mel_l1))
    f32, b16 = results['float32'], results['bfloat16']
    assert np.isfinite(b16).all()
    for a, b in zip(f32, b16):
        assert abs(a - b) < 0.1 * max(abs(a), 1.0), (f32, b16)
