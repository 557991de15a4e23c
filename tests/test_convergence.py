"""Convergence smokes (slow lane): the training loops must actually LEARN,
not just produce finite losses. The reference's implicit test was 370k real
iterations (reference: src/daft_exprt/train.py:380-539 and
vocoder/finetune_hifigan.py:215-243); the equivalent here is a couple of
hundred steps on the synthetic corpus with an asserted loss drop."""
import logging
import os
import re

import jax
import numpy as np
import pytest

from daft_exprt_tpu.parallel.mesh import make_mesh
from daft_exprt_tpu.train import train

from tests.synth_data import build_synthetic_dataset
from tests.test_training import make_hp


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('synth_conv'))
    train_list, val_list, _ = build_synthetic_dataset(root)
    return root, train_list, val_list


@pytest.mark.slow
def test_acoustic_training_converges(synth, caplog):
    """200 optimizer steps on the synthetic corpus: train loss must drop
    >= 30% (first-10 mean vs last-10 mean) and a validate/best-checkpoint
    cycle must complete."""
    root, train_list, val_list = synth
    hp = make_hp(root, train_list, val_list, batch_size=2,
                 iters_check_for_model_improvement=50,
                 iters_per_checkpoint=10000,
                 output_directory=os.path.join(root, 'out_conv'))
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices('cpu')[:1])
    with caplog.at_level(logging.INFO, logger='daft_exprt_tpu.train'):
        params, metrics = train(hp, num_iterations=200, mesh=mesh)

    losses = [float(m.group(1)) for m in
              (re.search(r'Train loss \[\d+\]: ([0-9.eE+-]+)', rec.message)
               for rec in caplog.records) if m]
    assert len(losses) >= 190, f'only {len(losses)} loss lines captured'
    early = float(np.mean(losses[:10]))
    late = float(np.mean(losses[-10:]))
    assert late < 0.7 * early, \
        f'train loss did not drop >=30%: {early:.4f} -> {late:.4f}'
    assert np.isfinite(metrics['loss'])

    # the validate/best-ckpt cycle ran (iters 50/100/150/200) and saved
    ckpt_dir = os.path.join(hp.output_directory, 'checkpoints')
    names = os.listdir(ckpt_dir)
    assert any(n.startswith('best_model') for n in names), names


@pytest.mark.slow
def test_gan_finetune_mel_l1_decreases():
    """40 GAN steps overfitting one fixed batch on a tiny generator:
    the generator's mel-L1 reconstruction term must decrease. (Validated
    once at 100 steps / 12.5 min CPU; trimmed to keep the slow lane
    bounded.)"""
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
    # a quasi-periodic target (sum of sines) — learnable structure, unlike
    # white noise
    t = np.arange(T) / 22050.0
    y = np.stack([np.sin(2 * np.pi * f0 * t) * 0.3
                  for f0 in (110.0, 220.0)]).astype(np.float32)
    y = y[:, None, :]

    d_step, g_step, (og, od), loss_mel_fn = make_gan_steps(small_cfg,
                                                           lr=2e-4)
    g_wn = generator_to_weight_norm(
        init_generator_params(jax.random.PRNGKey(0), small_cfg))
    d_params = {'mpd': init_mpd_params(jax.random.PRNGKey(1))}
    msd_params, sn_state = init_msd_params(jax.random.PRNGKey(1))
    d_params['msd'] = msd_params
    g_opt = og.init(g_wn)
    d_opt = od.init(d_params)

    y_mel = loss_mel_fn(y[:, 0, :])
    # fixed conditioning at the generator's frame rate (prod(rates)=16
    # samples/frame for this tiny config) — the generator overfits the
    # mapping from this conditioning to y
    mels = rng.randn(B, 80, T // 16).astype(np.float32)
    history = []
    for _ in range(40):
        d_params, d_opt, sn_state, d_loss = d_step(
            d_params, d_opt, sn_state, g_wn, mels, y)
        g_wn, g_opt, g_loss, mel_l1 = g_step(
            g_wn, g_opt, d_params, sn_state, mels, y, y_mel)
        history.append(float(mel_l1))
        assert np.isfinite(history[-1])
    early = float(np.mean(history[:5]))
    late = float(np.mean(history[-5:]))
    assert late < early, \
        f'GAN mel-L1 did not decrease: {early:.4f} -> {late:.4f}'
