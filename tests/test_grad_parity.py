"""End-to-end gradient parity vs torch autograd.

Forward parity (test_model_parity) plus per-term loss parity (test_loss)
do not catch backward-pass bugs in the custom VJPs (the Gaussian-upsampling
weight normalization in models/daft_exprt.py, the GRL in ops/grl.py) or in
masked reductions — a wrong gradient that stays finite would pass those
suites. This file differentiates the FULL composite 5-term loss
(reference: src/daft_exprt/loss.py:57-146) through the FULL model
(reference: src/daft_exprt/model.py:889-948) and compares ``jax.grad``
against torch autograd for EVERY parameter leaf.

Trick: ``convert_torch_state_dict`` is a purely linear re-layout
(transposes/reshapes, no weight folding for the acoustic model), so running
the torch *gradient* state dict through the same converter yields gradients
in flax layout exactly — no name-by-name mapping table needed.
"""
import os
import tempfile
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from daft_exprt_tpu.checkpoint import (
    convert_torch_pitch_predictor, convert_torch_state_dict,
)
from daft_exprt_tpu.loss import compute_loss
from daft_exprt_tpu.models.daft_exprt import DaftExprt
from daft_exprt_tpu.models.pitch_predictor import PitchPredictor

from tests.ref_loader import load_reference_module
from tests.test_model_parity import (
    EMB_DIM, N_MELS, N_SPEAKERS, jax_model, make_batch, torch_hparams,
)

ITERATION = 100


@pytest.fixture(scope='module')
def setup():
    torch.manual_seed(0)
    ref_model_mod = load_reference_module('model')
    tmodel = ref_model_mod.DaftExprt(torch_hparams())
    tmodel.eval()                       # dropout off; matches deterministic

    ref_pp = load_reference_module('layers.pitch_predictor')
    tpp = ref_pp.PitchPredictor(n_mel_channels=N_MELS)
    tpp.eval()
    pp_path = os.path.join(tempfile.mkdtemp(), 'pp.pt')
    torch.save(tpp.state_dict(), pp_path)

    ref_loss_mod = load_reference_module('loss')
    hp = types.SimpleNamespace(
        n_mel_channels=N_MELS, warmup_steps=10000, adv_max_weight=1e-2,
        post_mult_weight=1e-3, mel_spec_weight=1.0,
        energy_consistency_weight=0.05, pitch_consistency_weight=0.15,
        pitch_predictor_path=pp_path)
    criterion = ref_loss_mod.DaftExprtLoss('cpu', hp)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_state_dict(sd, nb_pe_blocks=2, nb_ae_blocks=2,
                                      nb_fd_blocks=2)
    jmodel = jax_model()                # strict_masking=False: ref parity

    pp_params, pp_bs = convert_torch_pitch_predictor(
        {k: v.numpy() for k, v in tpp.state_dict().items()})
    jpp = PitchPredictor(n_mel_channels=N_MELS)

    def pp_apply(variables, mel):
        return jpp.apply(variables, mel, deterministic=True,
                         use_running_average=True)

    pp_tuple = (pp_apply, {'params': pp_params, 'batch_stats': pp_bs})
    return tmodel, criterion, jmodel, params, pp_tuple


LOSS_CFG = {'warmup_steps': 10000.0, 'adv_max_weight': 1e-2,
            'post_mult_weight': 1e-3, 'mel_spec_weight': 1.0,
            'energy_consistency_weight': 0.05,
            'pitch_consistency_weight': 0.15,
            'n_mel_channels': float(N_MELS)}

INPUT_KEYS = ('symbols', 'durations_float', 'durations_int',
              'symbols_energy', 'symbols_pitch', 'input_lengths',
              'frames_energy', 'frames_pitch', 'mel_specs',
              'output_lengths', 'speaker_ids', 'spk_embs')


def _torch_loss(tmodel, criterion, b):
    t_inputs = tuple(
        (torch.LongTensor(b[k]) if b[k].dtype.kind in 'iu'
         else torch.FloatTensor(b[k]))
        for k in INPUT_KEYS)
    outputs = tmodel(t_inputs)
    targets = (None, None, None, torch.FloatTensor(b['mel_specs']),
               torch.LongTensor(b['output_lengths']),
               torch.LongTensor(b['speaker_ids']),
               torch.FloatTensor(b['frames_energy_raw']),
               torch.FloatTensor(b['frames_pitch_raw']))
    loss, indiv = criterion(outputs, targets, ITERATION)
    return loss


def _jax_loss_fn(jmodel, b, pp_tuple):
    inputs = {k: b[k] for k in INPUT_KEYS}
    targets = {'mel_specs': b['mel_specs'],
               'output_lengths': b['output_lengths'],
               'speaker_ids': b['speaker_ids'],
               'frames_energy_raw': b['frames_energy_raw'],
               'frames_pitch_raw': b['frames_pitch_raw']}

    def loss_fn(params):
        out = jmodel.apply({'params': params}, deterministic=True, **inputs)
        loss, _ = compute_loss(out, targets, float(ITERATION), LOSS_CFG,
                               pitch_predictor=pp_tuple)
        return loss

    return loss_fn


def _grad_batch(seed):
    rng = np.random.RandomState(seed)
    b = make_batch(rng, B=2, L=11)
    T = b['mel_specs'].shape[-1]
    # raw-scale frame prosody for the consistency terms: positive energy,
    # f0-like voiced pitch with unvoiced zeros, zero past output_lengths
    f_energy = np.abs(rng.randn(2, T)).astype(np.float32) * 4
    f_pitch = np.where(rng.rand(2, T) < 0.75,
                       rng.randn(2, T) * 0.3 + 5.0, 0.0).astype(np.float32)
    for i, n in enumerate(b['output_lengths']):
        f_energy[i, n:] = 0
        f_pitch[i, n:] = 0
    b['frames_energy_raw'] = f_energy
    b['frames_pitch_raw'] = f_pitch
    return b


def test_end_to_end_grad_parity(setup):
    tmodel, criterion, jmodel, params, pp_tuple = setup
    b = _grad_batch(seed=7)

    tmodel.zero_grad()
    t_loss = _torch_loss(tmodel, criterion, b)
    t_loss.backward()
    grad_sd = {}
    for name, p in tmodel.named_parameters():
        grad_sd[name] = (p.grad.detach().numpy() if p.grad is not None
                         else np.zeros_like(p.detach().numpy()))
    t_grads = convert_torch_state_dict(grad_sd, nb_pe_blocks=2,
                                       nb_ae_blocks=2, nb_fd_blocks=2)

    loss_fn = _jax_loss_fn(jmodel, b, pp_tuple)
    j_loss, j_grads = jax.value_and_grad(loss_fn)(params)

    assert abs(float(j_loss) - float(t_loss)) < 2e-3, \
        (float(j_loss), float(t_loss))

    flat_t = jax.tree_util.tree_flatten_with_path(t_grads)[0]
    flat_j = jax.tree_util.tree_flatten_with_path(j_grads)[0]
    assert len(flat_t) == len(flat_j)
    checked = 0
    bad = []
    for (path_t, gt), (path_j, gj) in zip(flat_t, flat_j):
        assert path_t == path_j
        name = '/'.join(str(k.key) for k in path_t if hasattr(k, 'key'))
        gt = np.asarray(gt, np.float64)
        gj = np.asarray(gj, np.float64)
        # relative-to-leaf-scale error: masked frames/phones make many
        # entries exactly zero, so elementwise relative error is undefined;
        # normalize by the leaf's max-abs torch gradient
        scale = max(np.abs(gt).max(), 1e-8)
        err = np.abs(gj - gt).max() / scale
        checked += 1
        if err > 1e-2:
            bad.append((name, err, float(np.abs(gt).max())))
    assert checked > 50          # every leaf of every submodule was compared
    assert not bad, f'gradient mismatches (name, rel_err, |g_t|max): {bad}'


def test_grad_covers_all_submodules(setup):
    """The gradient must be nonzero in every submodule (a silently dead
    branch — e.g. a stop_gradient swallowing the GRL path — would zero a
    whole subtree while the parity test above still passes on zeros)."""
    tmodel, criterion, jmodel, params, pp_tuple = setup
    b = _grad_batch(seed=13)
    loss_fn = _jax_loss_fn(jmodel, b, pp_tuple)
    j_grads = jax.grad(loss_fn)(params)
    for submodule in ('phoneme_encoder', 'accent_encoder', 'frame_decoder',
                      'speaker_classifier', 'style_adapter',
                      'gaussian_upsampling', 'spk_projection'):
        norms = [float(jnp.linalg.norm(g)) for g in
                 jax.tree_util.tree_leaves(j_grads[submodule])]
        assert max(norms) > 0, f'{submodule} has all-zero gradients'


def test_grl_flips_accent_encoder_gradient(setup):
    """The speaker-adversarial term must push the accent encoder in the
    OPPOSITE direction of the classifier (reference: model.py:27-54).
    Compare the accent-encoder gradient of the adversarial term alone with
    lambda_reversal=+1 vs a no-reversal model: they must be exact
    negatives."""
    tmodel, criterion, jmodel, params, pp_tuple = setup
    b = _grad_batch(seed=21)
    inputs = {k: b[k] for k in INPUT_KEYS}

    def adv_loss(params, model):
        out = model.apply({'params': params}, deterministic=True, **inputs)
        cfg = dict(LOSS_CFG, mel_spec_weight=0.0,
                   energy_consistency_weight=0.0,
                   pitch_consistency_weight=0.0, post_mult_weight=0.0)
        targets = {'mel_specs': b['mel_specs'],
                   'output_lengths': b['output_lengths'],
                   'speaker_ids': b['speaker_ids']}
        loss, _ = compute_loss(out, targets, float(ITERATION), cfg)
        return loss

    from tests.test_model_parity import small_cfg
    jmodel_noflip = DaftExprt(
        n_symbols=76, n_speakers=N_SPEAKERS, n_mel_channels=N_MELS,
        phoneme_encoder_cfg=small_cfg(), accent_encoder_cfg=small_cfg(),
        frame_decoder_cfg=small_cfg(), gum_conv_kernel=3,
        gum_use_concatenation=False, external_emb_dim=EMB_DIM,
        lambda_reversal=-1.0, post_mult_weight=1e-3, strict_masking=False)

    g_flip = jax.grad(adv_loss)(params, jmodel)['accent_encoder']
    g_noflip = jax.grad(adv_loss)(params, jmodel_noflip)['accent_encoder']
    for gf, gn in zip(jax.tree_util.tree_leaves(g_flip),
                      jax.tree_util.tree_leaves(g_noflip)):
        np.testing.assert_allclose(np.asarray(gf), -np.asarray(gn),
                                   rtol=1e-5, atol=1e-8)
