"""Vocode a saved mel (.npy or .npz) to a wav
(reference: scripts/verify_mel_spec.py:22-47)."""
import argparse
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--mel_file', type=str, required=True)
    parser.add_argument('-out', '--output_file', type=str, required=True)
    parser.add_argument('--vocoder_checkpoint', type=str, required=True)
    parser.add_argument('--sampling_rate', type=int, default=22050)
    args = parser.parse_args()

    from daft_exprt_tpu.frontend.audio import save_wav
    from daft_exprt_tpu.models.hifigan import load_hifigan_vocoder

    if args.mel_file.endswith('.npz'):
        mel = np.load(args.mel_file)['mel_spec']
    else:
        mel = np.load(args.mel_file)
    print(f'mel: {mel.shape}, range [{mel.min():.2f}, {mel.max():.2f}]')
    vocoder = load_hifigan_vocoder(args.vocoder_checkpoint)
    audio = vocoder.infer(mel)
    save_wav(args.output_file, audio, args.sampling_rate)
    print(f'wrote {args.output_file} ({len(audio) / args.sampling_rate:.2f}s)')
