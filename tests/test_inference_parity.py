"""End-to-end inference parity: host-side prosody transforms + jitted
inference vs the reference model.inference
(reference: src/daft_exprt/model.py:1026-1114, generate.py:165-278)."""
import types

import numpy as np
import pytest
import torch

from daft_exprt_tpu.checkpoint import convert_torch_state_dict
from daft_exprt_tpu.generate import (
    get_int_durations, normalize_external_feature, pitch_multiply, pitch_shift,
)
from daft_exprt_tpu.models.daft_exprt import DaftExprt

from tests.ref_loader import load_reference_module
from tests.test_model_parity import (
    D, EMB_DIM, N_MELS, N_SPEAKERS, N_SYMBOLS, jax_model, small_cfg,
    torch_hparams,
)


@pytest.fixture(scope='module')
def models():
    torch.manual_seed(7)
    ref_model_mod = load_reference_module('model')
    tmodel = ref_model_mod.DaftExprt(torch_hparams())
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_state_dict(sd, nb_pe_blocks=2, nb_ae_blocks=2,
                                      nb_fd_blocks=2)
    # two masking modes (see modules.PositionWiseConvFF): reference
    # bit-behavior for ragged-batch parity, strict for padding-invariance
    return (tmodel, jax_model(strict_masking=False),
            jax_model(strict_masking=True), {'params': params})


def _hp_with_stats():
    hp = torch_hparams()
    hp.stats = {f'spk {i}': {
        'pitch': {'mean': 5.0 + 0.05 * i, 'std': 0.3},
        'energy': {'mean': 12.0, 'std': 4.0}} for i in range(N_SPEAKERS)}
    return hp


def make_inference_inputs(rng, B=2, L=9):
    symbols = rng.randint(1, N_SYMBOLS, size=(B, L))
    input_lengths = np.array([L] * B)
    dur = rng.uniform(0.04, 0.3, size=(B, L)).astype(np.float32)
    energy = rng.randn(B, L).astype(np.float32)
    pitch = rng.randn(B, L).astype(np.float32)
    pitch[rng.rand(B, L) < 0.2] = 0.0       # unvoiced symbols
    spk_ids = rng.randint(0, N_SPEAKERS, size=(B,))
    spk_embs = rng.randn(B, EMB_DIM).astype(np.float32)
    accent = rng.randn(B, D).astype(np.float32)
    return symbols, input_lengths, dur, energy, pitch, spk_ids, spk_embs, accent


@pytest.mark.parametrize('pitch_transform', ['add', 'multiply'])
def test_inference_parity(models, pitch_transform):
    tmodel, jmodel, _, variables = models
    hp = _hp_with_stats()
    rng = np.random.RandomState(5)
    symbols, input_lengths, dur, energy, pitch, spk_ids, spk_embs, accent = \
        make_inference_inputs(rng)
    B, L = symbols.shape
    dur_factors = np.ones((B, L), dtype=np.float32) * 1.1
    energy_factors = np.ones((B, L), dtype=np.float32) * 0.9
    if pitch_transform == 'add':
        pitch_factors = np.full((B, L), 10.0, dtype=np.float32)  # +10 Hz
    else:
        pitch_factors = np.full((B, L), 0.5, dtype=np.float32)

    # ---- reference path ----
    with torch.no_grad():
        ext = {
            'duration_preds': torch.FloatTensor(dur.copy()),
            'durations_int': torch.zeros(B, L).long(),
            'energy_preds': torch.FloatTensor(energy.copy()),
            'pitch_preds': torch.FloatTensor(pitch.copy()),
        }
        inputs = (torch.LongTensor(symbols), torch.FloatTensor(dur_factors),
                  torch.FloatTensor(energy_factors),
                  torch.FloatTensor(pitch_factors),
                  torch.LongTensor(input_lengths), torch.LongTensor(spk_ids))
        enc_preds, dec_preds, aligns = tmodel.inference(
            inputs, pitch_transform, hp, external_prosody=ext,
            external_embeddings=torch.FloatTensor(spk_embs),
            external_accent_emb=torch.FloatTensor(accent))
        t_mel, t_out_lens = dec_preds[0].numpy(), dec_preds[1].numpy()

    # ---- our path: host transforms + jitted static-shape inference ----
    duration_preds = dur * dur_factors
    duration_preds, durations_int = get_int_durations(duration_preds, hp)
    energy_preds = energy * energy_factors
    energy_preds[durations_int == 0] = 0.0
    pitch_preds = pitch.copy()
    pitch_preds[durations_int == 0] = 0.0
    if pitch_transform == 'add':
        pitch_preds = pitch_shift(pitch_preds, pitch_factors, hp, spk_ids)
    else:
        pitch_preds = pitch_multiply(pitch_preds, pitch_factors)

    output_lengths = durations_int.sum(axis=1)
    output_lengths[output_lengths == 0] = 1
    T = int(output_lengths.max())
    out = jmodel.apply(
        variables, method=jmodel.inference,
        symbols=symbols, duration_preds=duration_preds,
        durations_int=durations_int, energy_preds=energy_preds,
        pitch_preds=pitch_preds, input_lengths=input_lengths,
        output_lengths=output_lengths, n_frames=T,
        spk_embs=spk_embs, accent_emb=accent, deterministic=True)

    np.testing.assert_array_equal(output_lengths, t_out_lens)
    j_mel = np.asarray(out['mel_preds'])
    assert j_mel.shape == t_mel.shape
    assert np.max(np.abs(j_mel - t_mel)) < 1e-3


def test_single_utterance_strict_parity(models):
    """BASELINE config #1 gate: single-utterance synthesis with the default
    (strict) masking matches the reference exactly — with B=1 the reference
    carries no padding, so strict and reference behavior coincide."""
    tmodel, _, jmodel, variables = models
    hp = _hp_with_stats()
    rng = np.random.RandomState(21)
    symbols, input_lengths, dur, energy, pitch, spk_ids, spk_embs, accent = \
        make_inference_inputs(rng, B=1, L=12)
    B, L = symbols.shape
    ones = np.ones((B, L), dtype=np.float32)
    with torch.no_grad():
        ext = {'duration_preds': torch.FloatTensor(dur.copy()),
               'durations_int': torch.zeros(B, L).long(),
               'energy_preds': torch.FloatTensor(energy.copy()),
               'pitch_preds': torch.FloatTensor(pitch.copy())}
        inputs = (torch.LongTensor(symbols), torch.FloatTensor(ones),
                  torch.FloatTensor(ones), torch.FloatTensor(ones * 0.0),
                  torch.LongTensor(input_lengths), torch.LongTensor(spk_ids))
        _, dec_preds, _ = tmodel.inference(
            inputs, 'add', hp, external_prosody=ext,
            external_embeddings=torch.FloatTensor(spk_embs),
            external_accent_emb=torch.FloatTensor(accent))
        t_mel = dec_preds[0].numpy()

    duration_preds, durations_int = get_int_durations(dur.copy(), hp)
    energy_preds = energy.copy()
    energy_preds[durations_int == 0] = 0.0
    pitch_preds = pitch.copy()
    pitch_preds[durations_int == 0] = 0.0
    pitch_preds = pitch_shift(pitch_preds, ones * 0.0, hp, spk_ids)
    output_lengths = durations_int.sum(axis=1)
    T = int(output_lengths.max())
    out = jmodel.apply(
        variables, method=jmodel.inference, symbols=symbols,
        duration_preds=duration_preds, durations_int=durations_int,
        energy_preds=energy_preds, pitch_preds=pitch_preds,
        input_lengths=input_lengths, output_lengths=output_lengths,
        n_frames=T, spk_embs=spk_embs, accent_emb=accent, deterministic=True)
    assert np.max(np.abs(np.asarray(out['mel_preds']) - t_mel)) < 1e-3


def test_padded_inference_matches_unpadded(models):
    """Bucketed (padded L/T) inference must produce identical valid frames
    (strict_masking=True — the framework default)."""
    _, _, jmodel, variables = models
    hp = _hp_with_stats()
    rng = np.random.RandomState(9)
    symbols, input_lengths, dur, energy, pitch, spk_ids, spk_embs, accent = \
        make_inference_inputs(rng, B=1, L=7)
    duration_preds, durations_int = get_int_durations(dur, hp)
    energy[durations_int == 0] = 0.0
    pitch[durations_int == 0] = 0.0
    output_lengths = durations_int.sum(axis=1)
    T = int(output_lengths.max())

    def run(L_pad, T_pad):
        pad = lambda x: np.pad(x, ((0, 0), (0, L_pad - x.shape[1])))
        return np.asarray(jmodel.apply(
            variables, method=jmodel.inference,
            symbols=pad(symbols).astype(np.int64),
            duration_preds=pad(duration_preds),
            durations_int=pad(durations_int),
            energy_preds=pad(energy), pitch_preds=pad(pitch),
            input_lengths=input_lengths, output_lengths=output_lengths,
            n_frames=T_pad, spk_embs=spk_embs, accent_emb=accent,
            deterministic=True)['mel_preds'])

    exact = run(symbols.shape[1], T)
    padded = run(symbols.shape[1] + 9, T + 33)
    np.testing.assert_allclose(padded[:, :, :T], exact, atol=2e-5)


def test_normalize_external_feature_roundtrip():
    rng = np.random.RandomState(0)
    vals = rng.rand(20) * 100
    vals[[3, 7]] = 0.0
    zero_mask = vals == 0.0
    out = normalize_external_feature(
        vals, zero_mask, {'mean': 50.0, 'std': 10.0},
        source_stats={'mean': float(vals[~zero_mask].mean()),
                      'std': float(vals[~zero_mask].std())})
    assert (out[zero_mask] == 0).all()
    # after source→target remap then target z-score, result is the source
    # z-score itself
    src = (vals[~zero_mask] - vals[~zero_mask].mean()) / vals[~zero_mask].std()
    np.testing.assert_allclose(out[~zero_mask], src, atol=1e-6)
