"""Loss parity vs the reference composite loss
(reference: src/daft_exprt/loss.py:11-159)."""
import os
import tempfile
import types

import numpy as np
import pytest
import torch

from daft_exprt_tpu.checkpoint import convert_torch_pitch_predictor
from daft_exprt_tpu.loss import adversarial_weight, compute_loss
from daft_exprt_tpu.models.pitch_predictor import PitchPredictor

from tests.ref_loader import load_reference_module

B, N_MEL, T = 3, 80, 50
N_SPEAKERS = 4


def loss_hparams(pp_path=''):
    return types.SimpleNamespace(
        n_mel_channels=N_MEL, warmup_steps=10000, adv_max_weight=1e-2,
        post_mult_weight=1e-3, mel_spec_weight=1.0,
        energy_consistency_weight=0.05, pitch_consistency_weight=0.15,
        pitch_predictor_path=pp_path)


@pytest.fixture(scope='module')
def torch_pitch_predictor_ckpt():
    ref_pp = load_reference_module('layers.pitch_predictor')
    torch.manual_seed(0)
    tpp = ref_pp.PitchPredictor(n_mel_channels=N_MEL)
    tpp.eval()
    path = os.path.join(tempfile.mkdtemp(), 'pp.pt')
    torch.save(tpp.state_dict(), path)
    return path, tpp


def make_data(rng):
    mel_preds = rng.randn(B, N_MEL, T).astype(np.float32)
    mel_tgt = rng.randn(B, N_MEL, T).astype(np.float32) * 0.5
    out_lens = np.array([T, T - 7, T - 3])
    for i, n in enumerate(out_lens):
        mel_preds[i, :, n:] = 0
        mel_tgt[i, :, n:] = 0
    speaker_preds = rng.randn(B, N_SPEAKERS).astype(np.float32)
    speaker_ids = rng.randint(0, N_SPEAKERS, size=(B,))
    post = rng.randn(2, 8).astype(np.float32)
    f_energy = np.abs(rng.randn(B, T)).astype(np.float32) * 4
    f_pitch = np.where(rng.rand(B, T) < 0.75,
                       rng.randn(B, T) * 0.3 + 5.0, 0.0).astype(np.float32)
    for i, n in enumerate(out_lens):
        f_energy[i, n:] = 0
        f_pitch[i, n:] = 0
    return (mel_preds, mel_tgt, out_lens, speaker_preds, speaker_ids, post,
            f_energy, f_pitch)


def test_adversarial_weight_matches_reference():
    for it in [0, 100, 5000, 10000, 50000]:
        w_ref = min(1e-2, it * 10000 ** -1.5 * 1e-2 / 10000 ** -0.5)
        assert float(adversarial_weight(it, 10000, 1e-2)) == \
            pytest.approx(w_ref, rel=1e-6)


@pytest.mark.parametrize('iteration', [100, 20000])
def test_loss_parity(torch_pitch_predictor_ckpt, iteration):
    pp_path, tpp = torch_pitch_predictor_ckpt
    ref_loss_mod = load_reference_module('loss')
    criterion = ref_loss_mod.DaftExprtLoss('cpu', loss_hparams(pp_path))

    rng = np.random.RandomState(1)
    (mel_preds, mel_tgt, out_lens, speaker_preds, speaker_ids, post,
     f_energy, f_pitch) = make_data(rng)

    with torch.no_grad():
        t_outputs = (
            torch.FloatTensor(speaker_preds),
            [torch.FloatTensor(post), None, None, None],
            None,
            [torch.FloatTensor(mel_preds), torch.LongTensor(out_lens)],
            None)
        t_targets = (None, None, None, torch.FloatTensor(mel_tgt),
                     torch.LongTensor(out_lens), torch.LongTensor(speaker_ids),
                     torch.FloatTensor(f_energy), torch.FloatTensor(f_pitch))
        t_loss, t_indiv = criterion(t_outputs, t_targets, iteration)

    params, batch_stats = convert_torch_pitch_predictor(
        {k: v.numpy() for k, v in tpp.state_dict().items()})
    jpp = PitchPredictor(n_mel_channels=N_MEL)

    def pp_apply(variables, mel):
        return jpp.apply(variables, mel, deterministic=True,
                         use_running_average=True)

    outputs = {'mel_preds': mel_preds, 'speaker_preds': speaker_preds,
               'post_multipliers': post}
    targets = {'mel_specs': mel_tgt, 'output_lengths': out_lens,
               'speaker_ids': speaker_ids, 'frames_energy_raw': f_energy,
               'frames_pitch_raw': f_pitch}
    cfg = {'warmup_steps': 10000.0, 'adv_max_weight': 1e-2,
           'post_mult_weight': 1e-3, 'mel_spec_weight': 1.0,
           'energy_consistency_weight': 0.05,
           'pitch_consistency_weight': 0.15, 'n_mel_channels': float(N_MEL)}
    j_loss, j_indiv = compute_loss(
        outputs, targets, float(iteration), cfg,
        pitch_predictor=(pp_apply, {'params': params,
                                    'batch_stats': batch_stats}))

    assert abs(float(j_loss) - float(t_loss)) < 2e-3, \
        (float(j_loss), float(t_loss))
    for key in ('speaker_loss', 'post_mult_loss', 'mel_spec_l1_loss',
                'mel_spec_l2_loss', 'energy_consistency_loss',
                'pitch_consistency_loss'):
        assert abs(float(j_indiv[key]) - float(t_indiv[key])) < 2e-3, \
            (key, float(j_indiv[key]), float(t_indiv[key]))


def test_pitch_predictor_parity(torch_pitch_predictor_ckpt):
    _, tpp = torch_pitch_predictor_ckpt
    rng = np.random.RandomState(3)
    mel = rng.randn(2, N_MEL, 37).astype(np.float32)
    with torch.no_grad():
        t_out = tpp(torch.FloatTensor(mel)).numpy()
    params, batch_stats = convert_torch_pitch_predictor(
        {k: v.numpy() for k, v in tpp.state_dict().items()})
    jpp = PitchPredictor(n_mel_channels=N_MEL)
    j_out = np.asarray(jpp.apply({'params': params,
                                  'batch_stats': batch_stats}, mel,
                                 deterministic=True,
                                 use_running_average=True))
    assert np.max(np.abs(j_out - t_out)) < 1e-4
