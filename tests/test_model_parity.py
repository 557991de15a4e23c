"""Forward-pass parity: flax DaftExprt vs the reference PyTorch model on a
converted random-init checkpoint (reference: src/daft_exprt/model.py:832-948).
This is the SURVEY.md §7.2 step-3 'minimum slice' gate."""
import types

import numpy as np
import pytest
import torch

from daft_exprt_tpu.checkpoint import convert_torch_state_dict
from daft_exprt_tpu.models.daft_exprt import DaftExprt

from tests.ref_loader import load_reference_module

D = 16          # hidden dim (small for test speed)
CC = 32         # conv channels
N_SYMBOLS = 76
N_SPEAKERS = 5
N_MELS = 80
EMB_DIM = 24


def small_cfg():
    return {'nb_blocks': 2, 'hidden_embed_dim': D, 'attn_nb_heads': 2,
            'attn_dropout': 0.1, 'conv_kernel': 3, 'conv_channels': CC,
            'conv_dropout': 0.1}


def torch_hparams():
    return types.SimpleNamespace(
        n_speakers=N_SPEAKERS, n_mel_channels=N_MELS, n_symbols=N_SYMBOLS,
        phoneme_encoder=small_cfg(), accent_encoder=small_cfg(),
        frame_decoder={k: v for k, v in small_cfg().items()
                       if k != 'hidden_embed_dim'},
        gaussian_upsampling_module={'conv_kernel': 3},
        post_mult_weight=1e-3, lambda_reversal=1.0, external_emb_dim=EMB_DIM,
        filter_length=1024, hop_length=256, sampling_rate=22050,
        centered=False,
    )


def jax_model(strict_masking=False):
    # strict_masking=False reproduces the reference's ragged-batch padding
    # bit-behavior (see modules.PositionWiseConvFF); the framework default
    # is True (padding-invariant)
    return DaftExprt(
        n_symbols=N_SYMBOLS, n_speakers=N_SPEAKERS, n_mel_channels=N_MELS,
        phoneme_encoder_cfg=small_cfg(), accent_encoder_cfg=small_cfg(),
        frame_decoder_cfg=small_cfg(), gum_conv_kernel=3,
        gum_use_concatenation=False, external_emb_dim=EMB_DIM,
        lambda_reversal=1.0, post_mult_weight=1e-3,
        strict_masking=strict_masking)


def make_batch(rng, B=2, L=11, T=40):
    symbols = rng.randint(1, N_SYMBOLS, size=(B, L))
    input_lengths = np.concatenate(
        [[L], rng.randint(max(2, L - 5), L + 1, size=B - 1)])
    for i, n in enumerate(input_lengths):
        symbols[i, n:] = 0
    dur_int = rng.randint(1, 6, size=(B, L))
    for i, n in enumerate(input_lengths):
        dur_int[i, n:] = 0
    out_len = dur_int.sum(axis=1)
    T = int(out_len.max())
    dur_float = dur_int * 256 / 22050 + rng.rand(B, L) * 0.01
    s_energy = rng.randn(B, L).astype(np.float32)
    s_pitch = rng.randn(B, L).astype(np.float32)
    for i, n in enumerate(input_lengths):
        dur_float[i, n:] = 0
        s_energy[i, n:] = 0
        s_pitch[i, n:] = 0
    f_energy = rng.randn(B, T).astype(np.float32)
    f_pitch = rng.randn(B, T).astype(np.float32)
    mel = rng.randn(B, N_MELS, T).astype(np.float32)
    for i, n in enumerate(out_len):
        f_energy[i, n:] = 0
        f_pitch[i, n:] = 0
        mel[i, :, n:] = 0
    spk_ids = rng.randint(0, N_SPEAKERS, size=(B,))
    spk_embs = rng.randn(B, EMB_DIM).astype(np.float32)
    return dict(symbols=symbols, durations_float=dur_float.astype(np.float32),
                durations_int=dur_int, symbols_energy=s_energy,
                symbols_pitch=s_pitch, input_lengths=input_lengths,
                frames_energy=f_energy, frames_pitch=f_pitch, mel_specs=mel,
                output_lengths=out_len, speaker_ids=spk_ids,
                spk_embs=spk_embs)


@pytest.fixture(scope='module')
def models():
    torch.manual_seed(0)
    ref_model_mod = load_reference_module('model')
    tmodel = ref_model_mod.DaftExprt(torch_hparams())
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_state_dict(sd, nb_pe_blocks=2, nb_ae_blocks=2,
                                      nb_fd_blocks=2)
    jmodel = jax_model()
    return tmodel, jmodel, {'params': params}


def test_forward_parity(models):
    tmodel, jmodel, variables = models
    rng = np.random.RandomState(3)
    b = make_batch(rng)

    with torch.no_grad():
        t_inputs = (
            torch.LongTensor(b['symbols']),
            torch.FloatTensor(b['durations_float']),
            torch.LongTensor(b['durations_int']),
            torch.FloatTensor(b['symbols_energy']),
            torch.FloatTensor(b['symbols_pitch']),
            torch.LongTensor(b['input_lengths']),
            torch.FloatTensor(b['frames_energy']),
            torch.FloatTensor(b['frames_pitch']),
            torch.FloatTensor(b['mel_specs']),
            torch.LongTensor(b['output_lengths']),
            torch.LongTensor(b['speaker_ids']),
            torch.FloatTensor(b['spk_embs']),
        )
        speaker_preds, film_params, enc_preds, dec_preds, aligns = \
            tmodel(t_inputs)
        t_mel = dec_preds[0].numpy()
        t_spk = speaker_preds.numpy()
        t_aligns = aligns.numpy()

    out = jmodel.apply(variables, deterministic=True, **{
        k: b[k] for k in (
            'symbols', 'durations_float', 'durations_int', 'symbols_energy',
            'symbols_pitch', 'input_lengths', 'frames_energy', 'frames_pitch',
            'mel_specs', 'output_lengths', 'speaker_ids', 'spk_embs')})

    np.testing.assert_allclose(np.asarray(out['speaker_preds']), t_spk,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['alignments']), t_aligns,
                               atol=2e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out['mel_preds']), t_mel,
                               atol=1e-4, rtol=1e-3)


def test_mel_parity_tolerance_budget(models):
    """BASELINE.json gate: mel allclose atol 1e-3 on a second batch."""
    tmodel, jmodel, variables = models
    rng = np.random.RandomState(11)
    b = make_batch(rng, B=3, L=17)
    with torch.no_grad():
        t_inputs = tuple(
            (torch.LongTensor(b[k]) if b[k].dtype.kind in 'iu'
             else torch.FloatTensor(b[k]))
            for k in ('symbols', 'durations_float', 'durations_int',
                      'symbols_energy', 'symbols_pitch', 'input_lengths',
                      'frames_energy', 'frames_pitch', 'mel_specs',
                      'output_lengths', 'speaker_ids', 'spk_embs'))
        _, _, _, dec_preds, _ = tmodel(t_inputs)
        t_mel = dec_preds[0].numpy()
    out = jmodel.apply(variables, deterministic=True, **{
        k: b[k] for k in (
            'symbols', 'durations_float', 'durations_int', 'symbols_energy',
            'symbols_pitch', 'input_lengths', 'frames_energy', 'frames_pitch',
            'mel_specs', 'output_lengths', 'speaker_ids', 'spk_embs')})
    assert np.max(np.abs(np.asarray(out['mel_preds']) - t_mel)) < 1e-3
