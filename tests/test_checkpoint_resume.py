"""Checkpoint/resume semantics: optimizer-state round trip, feature-config
guards, torch-checkpoint conversion metadata."""
import os

import jax
import numpy as np
import pytest

from daft_exprt_tpu import checkpoint as ckpt
from daft_exprt_tpu.parallel.mesh import make_mesh
from daft_exprt_tpu.train import check_train_config, train

from tests.synth_data import build_synthetic_dataset
from tests.test_training import make_hp


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('resume'))
    return (root, *build_synthetic_dataset(root, files_per_speaker=6))


@pytest.mark.slow
def test_resume_continues_iteration_and_state(synth):
    root, train_list, val_list, _ = synth
    mesh = make_mesh(n_data=1, devices=jax.devices('cpu')[:1])
    hp = make_hp(root, train_list, val_list, batch_size=2,
                 iters_per_checkpoint=2)
    params1, _ = train(hp, num_iterations=2, mesh=mesh)
    ck = os.path.join(hp.output_directory, 'checkpoints', 'DaftExprt_2')
    assert os.path.isfile(ck)
    _, meta = ckpt.load_checkpoint(ck)
    assert meta['iteration'] == 2

    hp2 = make_hp(root, train_list, val_list, batch_size=2,
                  iters_per_checkpoint=2, checkpoint=ck)
    params2, metrics = train(hp2, num_iterations=4, mesh=mesh)
    assert np.isfinite(metrics['loss'])
    ck4 = os.path.join(hp2.output_directory, 'checkpoints', 'DaftExprt_4')
    assert os.path.isfile(ck4)
    _, meta4 = ckpt.load_checkpoint(ck4)
    assert meta4['iteration'] == 4
    # parameters actually moved after resuming
    a = np.asarray(jax.tree_util.tree_leaves(params1)[0])
    b = np.asarray(jax.tree_util.tree_leaves(params2)[0])
    assert not np.allclose(a, b)


def test_feature_config_guard(synth, tmp_path):
    """check_train_config raises when the features dir carries a different
    extraction config (reference: train.py:42-60)."""
    root, train_list, val_list, features_root = synth
    hp = make_hp(root, train_list, val_list)
    spk_dir = os.path.join(features_root, 'speaker_0')
    bad_hp = make_hp(root, train_list, val_list, sampling_rate=16000,
                     filter_length=1024, hop_length=256)
    bad_hp.save_hyper_params(os.path.join(spk_dir, 'config.json'))
    try:
        with pytest.raises(ValueError, match='config mismatch'):
            check_train_config(hp)
    finally:
        os.remove(os.path.join(spk_dir, 'config.json'))


def test_torch_checkpoint_metadata_roundtrip(tmp_path):
    import torch
    from tests.ref_loader import load_reference_module
    from tests.test_model_parity import torch_hparams
    ref_model = load_reference_module('model')
    torch.manual_seed(1)
    tmodel = ref_model.DaftExprt(torch_hparams())
    path = str(tmp_path / 'ref.pt')
    torch.save({'state_dict': {f'module.{k}': v for k, v
                               in tmodel.state_dict().items()},
                'iteration': 1234, 'learning_rate': 3e-4,
                'best_val_loss': 0.5,
                'config_params': {'language': 'english'}}, path)
    params, config_params, meta = ckpt.load_torch_checkpoint(path)
    assert meta['iteration'] == 1234
    assert config_params['language'] == 'english'
    # DDP prefix stripped and converted
    assert 'phoneme_encoder' in params
