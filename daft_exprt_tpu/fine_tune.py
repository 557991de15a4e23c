"""Vocoder fine-tuning dataset generation: (predicted-mel, GT-wav) pairs.

Capability parity with the reference (reference: src/daft_exprt/fine_tune.py:
23-190): run the trained acoustic model in eval mode over the training set,
crop each mel prediction to its true length, re-extract the ground-truth mel
for a shape check, and store ``<file>.npy`` + ``<file>.wav`` pairs per
speaker under ``fine_tuning_dataset/``. Dynamic speaker stats are applied
exactly as in training so the predictions match the training distribution.
"""
import logging
import os
import time

import jax
import numpy as np

from daft_exprt_tpu import checkpoint as ckpt
from daft_exprt_tpu.data import DynamicSpeakerStatsManager, prepare_data_iterators
from daft_exprt_tpu.frontend.audio import load_wav, save_wav
from daft_exprt_tpu.models.daft_exprt import DaftExprt
from daft_exprt_tpu.ops.mel import MelExtractor
from daft_exprt_tpu.parallel.train_step import MODEL_INPUT_KEYS
from daft_exprt_tpu.utils import estimate_required_time

_logger = logging.getLogger(__name__)


def fine_tuning(hparams, data_set_dir, params=None):
    """Generate the fine-tuning dataset; returns its root directory."""
    model = DaftExprt.from_hparams(hparams)
    if params is None:
        if not hparams.checkpoint:
            raise ValueError('no checkpoint specified in hparams.checkpoint')
        if hparams.checkpoint.endswith('.pt'):
            params, _, _ = ckpt.load_torch_checkpoint(hparams.checkpoint)
        else:
            payload, _ = ckpt.load_checkpoint(hparams.checkpoint)
            params = payload['params']

    forward = jax.jit(
        lambda p, b: model.apply({'params': p}, deterministic=True, **b))

    train_it, _, _ = prepare_data_iterators(hparams, bucket=True)
    stats_manager = DynamicSpeakerStatsManager(hparams)

    experiment_root = os.path.dirname(os.path.abspath(hparams.training_files))
    ft_data_set = os.path.join(experiment_root, 'fine_tuning_dataset')
    for speaker in hparams.speakers:
        os.makedirs(os.path.join(ft_data_set, speaker), exist_ok=True)

    mel_extractor = MelExtractor(hparams)
    n_written = n_skipped_shape = n_skipped_short = 0
    start = time.time()
    for idx, (batch, feature_dirs, feature_files) in enumerate(train_it):
        estimate_required_time(len(train_it), idx, time.time() - start,
                               interval=1)
        norm = stats_manager.process_batch(batch)
        out = forward(params, {k: norm[k] for k in MODEL_INPUT_KEYS})
        mel_preds = np.asarray(out['mel_preds'])
        output_lengths = norm['output_lengths']

        for i in range(mel_preds.shape[0]):
            mel_pred = mel_preds[i][:, :int(output_lengths[i])]
            feature_dir, feature_file = feature_dirs[i], feature_files[i]
            speaker_name = next((s for s in hparams.speakers
                                 if feature_dir.rstrip('/').endswith(s)), None)
            if speaker_name is None:
                _logger.warning(f'{feature_dir}: unknown speaker, skipping')
                continue
            wav_file = os.path.join(data_set_dir, speaker_name, 'wavs',
                                    f'{feature_file}.wav')
            wav, fs = load_wav(wav_file, target_sr=hparams.sampling_rate)
            with open(os.path.join(feature_dir,
                                   f'{feature_file}.markers'), 'r',
                      encoding='utf-8') as f:
                lines = f.readlines()
            sent_begin = float(lines[0].strip().split('\t')[0])
            sent_end = float(lines[-1].strip().split('\t')[1])
            wav = wav[int(sent_begin * fs): int(sent_end * fs)]

            mel_tgt = mel_extractor(wav)
            if mel_tgt.shape != mel_pred.shape:
                n_skipped_shape += 1
                _logger.warning(f'{feature_file}: shape mismatch tgt '
                                f'{mel_tgt.shape} vs pred {mel_pred.shape}')
                continue
            if len(wav) < fs:
                n_skipped_short += 1
                continue
            np.save(os.path.join(ft_data_set, speaker_name,
                                 f'{feature_file}.npy'), mel_pred)
            save_wav(os.path.join(ft_data_set, speaker_name,
                                  f'{feature_file}.wav'), wav, fs)
            n_written += 1

    _logger.info(f'Fine-tuning dataset: written={n_written}, shape '
                 f'mismatches={n_skipped_shape}, too short={n_skipped_short}')
    return ft_data_set


def launch_fine_tuning(hparams, data_set_dir, params=None):
    """Entry point mirroring the reference launcher
    (reference: fine_tune.py:132-190)."""
    return fine_tuning(hparams, data_set_dir, params=params)
