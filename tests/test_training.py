"""End-to-end training smoke on a synthetic dataset over the virtual
8-device CPU mesh (the SURVEY.md §4 distributed-testing strategy the
reference lacks)."""
import os

import jax
import numpy as np
import pytest

from daft_exprt_tpu.data import (
    DaftExprtDataset, DynamicSpeakerStatsManager, collate_batch,
    prepare_data_iterators,
)
from daft_exprt_tpu.hparams import HyperParams
from daft_exprt_tpu.parallel.mesh import make_mesh
from daft_exprt_tpu.parallel.train_step import make_learning_rate_fn
from daft_exprt_tpu.train import train

from tests.synth_data import build_synthetic_dataset

SMALL = {'nb_blocks': 1, 'hidden_embed_dim': 16, 'attn_nb_heads': 2,
         'attn_dropout': 0.1, 'conv_kernel': 3, 'conv_channels': 24,
         'conv_dropout': 0.1}


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('synth'))
    train_list, val_list, _ = build_synthetic_dataset(root)
    return root, train_list, val_list


def make_hp(root, train_list, val_list, **kw):
    kwargs = dict(
        training_files=train_list, validation_files=val_list,
        output_directory=os.path.join(root, 'out'), language='english',
        speakers=['speaker_0', 'speaker_1'],
        phoneme_encoder=dict(SMALL), accent_encoder=dict(SMALL),
        frame_decoder={k: v for k, v in SMALL.items()},
        length_buckets=[16, 32], frame_buckets=[64, 128],
        batch_size=2, accumulation_steps=1,
        iters_check_for_model_improvement=4, iters_per_checkpoint=1000,
        warmup_steps=10, pitch_consistency_weight=0.0)
    kwargs.update(kw)
    return HyperParams(verbose=False, **kwargs)


def test_dataset_and_collate(synth):
    root, train_list, val_list = synth
    hp = make_hp(root, train_list, val_list)
    ds = DaftExprtDataset(train_list, hp)
    item = ds[0]
    assert item['durations_int'].sum() == item['mel_spec'].shape[1]
    batch, dirs, files = collate_batch([ds[0], ds[1], ds[2]], hp)
    assert batch['symbols'].shape[1] in hp.length_buckets
    assert batch['mel_specs'].shape[2] in hp.frame_buckets
    # sorted by decreasing length
    assert (np.diff(batch['input_lengths']) <= 0).all()
    assert len(dirs) == len(files) == 3


def test_dynamic_stats_determinism(synth):
    root, train_list, val_list = synth
    hp = make_hp(root, train_list, val_list)
    m1 = DynamicSpeakerStatsManager(hp)
    m2 = DynamicSpeakerStatsManager(hp)
    for sid in m1.current_stats:
        assert m1.current_stats[sid]['pitch'] == m2.current_stats[sid]['pitch']
        np.testing.assert_array_equal(m1.current_stats[sid]['spk_emb'],
                                      m2.current_stats[sid]['spk_emb'])
    ds = DaftExprtDataset(train_list, hp)
    batch, _, _ = collate_batch([ds[0], ds[1]], hp)
    norm = m1.process_batch(batch)
    # zeros preserved
    assert ((batch['frames_pitch'] == 0) == (norm['frames_pitch'] == 0)).all()
    assert not np.allclose(batch['frames_pitch'], norm['frames_pitch'])


def test_lr_schedule(synth):
    root, train_list, val_list = synth
    hp = make_hp(root, train_list, val_list)
    lr = make_learning_rate_fn(hp)
    assert abs(float(lr(0)) - hp.initial_learning_rate) < 1e-9
    assert abs(float(lr(hp.warmup_steps))
               - hp.max_learning_rate) < 1e-6
    # inverse sqrt decay after warmup
    assert float(lr(4 * hp.warmup_steps)) == pytest.approx(
        hp.max_learning_rate / 2, rel=1e-4)


@pytest.mark.slow
def test_train_loop_dp_mesh(synth):
    """3 optimizer steps on an 8-device CPU data-parallel mesh."""
    root, train_list, val_list = synth
    hp = make_hp(root, train_list, val_list, batch_size=1)
    mesh = make_mesh(n_data=2, n_model=1,
                     devices=jax.devices('cpu')[:2])
    params, metrics = train(hp, num_iterations=3, mesh=mesh)
    assert np.isfinite(metrics['loss'])
    assert metrics['grad_norm'] > 0
    ckpts = os.listdir(os.path.join(hp.output_directory, 'checkpoints'))
    assert any(c.startswith('DaftExprt_3') for c in ckpts)


@pytest.mark.slow
def test_train_with_accumulation(synth):
    root, train_list, val_list = synth
    hp = make_hp(root, train_list, val_list, batch_size=1,
                 accumulation_steps=2)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices('cpu')[:1])
    params, metrics = train(hp, num_iterations=2, mesh=mesh)
    assert np.isfinite(metrics['loss'])


@pytest.mark.slow
def test_train_step_prng_impls_smoke(synth):
    """The step folds the iteration into the key internally; both PRNG
    impls ('rbg' is the TPU-fast default — threefry mask generation is
    ~60% of a train step at B=16/T=1024) produce finite, step-dependent
    dropout draws from the SAME base key object passed every call."""
    from daft_exprt_tpu.loss import loss_cfg_from_hparams
    from daft_exprt_tpu.parallel.train_step import (
        make_optimizer, make_train_step)
    from daft_exprt_tpu.train import init_model_and_state

    root, train_list, val_list = synth
    hp = make_hp(root, train_list, val_list, batch_size=2)
    from __graft_entry__ import _make_batch
    batch = _make_batch(hp, 2, hp.length_buckets[0], hp.frame_buckets[0])
    raw = {'frames_energy': batch['frames_energy'],
           'frames_pitch': batch['frames_pitch']}
    model, params = init_model_and_state(hp)
    tx = make_optimizer(hp)

    losses = {}
    for impl in ('rbg', 'threefry2x32'):
        step = make_train_step(model, tx, loss_cfg_from_hparams(hp), None,
                               mesh=None, donate=False)
        base = jax.random.key(hp.seed, impl=impl)
        p, o = params, tx.init(params)
        seen = []
        for it in range(2):
            p, o, m = step(p, o, batch, raw, np.float32(it), base)
            seen.append(float(m['loss']))
            assert np.isfinite(seen[-1])
        losses[impl] = seen
    # same data, same init: losses agree at step 0 up to dropout-mask
    # differences between impls, and both evolve
    assert losses['rbg'] != losses['threefry2x32']
