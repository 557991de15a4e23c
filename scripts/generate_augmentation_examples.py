"""Mel-domain augmentation demos → vocoded wavs.

Capability parity with the reference
(reference: scripts/generate_augmentation_examples.py:18-84): bin-shift
pitch augmentation, time stretch via linear interpolation along the frame
axis, and energy scaling as a log-domain offset, each vocoded for listening.
"""
import argparse
import logging
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

_logger = logging.getLogger(__name__)


def pitch_shift_mel(mel, n_bins):
    """Shift mel bins (positive = up) with edge replication
    (reference: generate_augmentation_examples.py:18-54)."""
    shifted = np.empty_like(mel)
    if n_bins > 0:
        shifted[n_bins:] = mel[:-n_bins]
        shifted[:n_bins] = mel[0]
    elif n_bins < 0:
        shifted[:n_bins] = mel[-n_bins:]
        shifted[n_bins:] = mel[-1]
    else:
        shifted[:] = mel
    return shifted


def time_stretch_mel(mel, factor):
    """Stretch along the frame axis via linear interpolation
    (reference: generate_augmentation_examples.py:56-71)."""
    T = mel.shape[1]
    new_T = max(2, int(round(T * factor)))
    src = np.linspace(0, T - 1, new_T)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, T - 1)
    frac = src - lo
    return mel[:, lo] * (1 - frac)[None, :] + mel[:, hi] * frac[None, :]


def energy_scale_mel(mel, factor):
    """Scale energy as a log-domain additive offset
    (reference: generate_augmentation_examples.py:73-84)."""
    return mel + np.log(factor)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-w', '--wav_file', type=str, required=True)
    parser.add_argument('-out', '--output_dir', type=str, required=True)
    parser.add_argument('--vocoder_checkpoint', type=str, required=True)
    parser.add_argument('--mel_shifts', type=int, nargs='*', default=[-3, 3])
    parser.add_argument('--stretches', type=float, nargs='*',
                        default=[0.8, 1.2])
    parser.add_argument('--energy_scales', type=float, nargs='*',
                        default=[0.7, 1.3])
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from daft_exprt_tpu.frontend.audio import load_wav, save_wav
    from daft_exprt_tpu.hparams import HyperParams
    from daft_exprt_tpu.models.hifigan import load_hifigan_vocoder
    from daft_exprt_tpu.ops.mel import MelExtractor

    hparams = HyperParams(verbose=False, training_files='unused',
                          validation_files='unused',
                          output_directory=args.output_dir,
                          language='english', speakers=['spk'])
    os.makedirs(args.output_dir, exist_ok=True)
    wav, _ = load_wav(args.wav_file, target_sr=hparams.sampling_rate)
    mel = MelExtractor(hparams)(wav)
    vocoder = load_hifigan_vocoder(args.vocoder_checkpoint)
    name = os.path.basename(args.wav_file).replace('.wav', '')

    variants = [('orig', mel)]
    variants += [(f'pitch{sh:+d}', pitch_shift_mel(mel, sh))
                 for sh in args.mel_shifts]
    variants += [(f'stretch{st}', time_stretch_mel(mel, st))
                 for st in args.stretches]
    variants += [(f'energy{sc}', energy_scale_mel(mel, sc))
                 for sc in args.energy_scales]
    for tag, m in variants:
        audio = vocoder.infer(m.astype(np.float32))
        save_wav(os.path.join(args.output_dir, f'{name}_{tag}.wav'),
                 audio, hparams.sampling_rate)
        _logger.info(f'{tag}: {m.shape[1]} frames')
