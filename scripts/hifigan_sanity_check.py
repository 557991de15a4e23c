"""GT-wav → mel → vocoder → wav round trip to isolate vocoder artifacts
from mel mismatches (reference: scripts/hifigan_sanity_check.py:30-105)."""
import argparse
import logging
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

_logger = logging.getLogger(__name__)

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-w', '--wav_file', type=str, required=True)
    parser.add_argument('-out', '--output_dir', type=str, required=True)
    parser.add_argument('--vocoder_checkpoint', type=str, required=True)
    parser.add_argument('-l', '--language', type=str, default='english')
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from daft_exprt_tpu.frontend.audio import load_wav, save_wav
    from daft_exprt_tpu.hparams import HyperParams
    from daft_exprt_tpu.models.hifigan import load_hifigan_vocoder
    from daft_exprt_tpu.ops.mel import MelExtractor

    hparams = HyperParams(verbose=False, training_files='unused',
                          validation_files='unused',
                          output_directory=args.output_dir,
                          language=args.language, speakers=['spk'])
    os.makedirs(args.output_dir, exist_ok=True)
    wav, fs = load_wav(args.wav_file, target_sr=hparams.sampling_rate)
    mel = MelExtractor(hparams)(wav)
    _logger.info(f'GT mel: {mel.shape}, range [{mel.min():.2f}, '
                 f'{mel.max():.2f}]')
    vocoder = load_hifigan_vocoder(args.vocoder_checkpoint)
    audio = vocoder.infer(mel)
    name = os.path.basename(args.wav_file).replace('.wav', '')
    save_wav(os.path.join(args.output_dir, f'{name}_copy_synthesis.wav'),
             audio, hparams.sampling_rate)
    save_wav(os.path.join(args.output_dir, f'{name}_original_trimmed.wav'),
             wav[:len(audio)], hparams.sampling_rate)
    n = min(len(audio), len(wav))
    snr = 10 * np.log10(
        np.sum(wav[:n] ** 2) / (np.sum((wav[:n] - audio[:n]) ** 2) + 1e-12))
    _logger.info(f'copy-synthesis written -- naive SNR {snr:.2f} dB '
                 f'(phase differences make this pessimistic)')
