"""Pearson correlation between two audio files' pitch curves.

Capability parity with the reference
(reference: scripts/evaluation/compare_pitch_curves.py:24-45): unvoiced
removal, resampling of the shorter curve onto the longer one's grid, Pearson
correlation.
"""
import argparse
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.realpath(__file__))))
sys.path.insert(0, PROJECT_ROOT)


def pitch_curve_correlation(pitch_a, pitch_b):
    """Voiced-only Pearson r with linear time-normalized resampling."""
    a = np.asarray(pitch_a, dtype=np.float64)
    b = np.asarray(pitch_b, dtype=np.float64)
    a = a[a > 0]
    b = b[b > 0]
    if len(a) < 2 or len(b) < 2:
        return None
    n = max(len(a), len(b))
    a_rs = np.interp(np.linspace(0, 1, n), np.linspace(0, 1, len(a)), a)
    b_rs = np.interp(np.linspace(0, 1, n), np.linspace(0, 1, len(b)), b)
    if a_rs.std() == 0 or b_rs.std() == 0:
        return None
    return float(np.corrcoef(a_rs, b_rs)[0, 1])


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('wav_a')
    parser.add_argument('wav_b')
    parser.add_argument('--pitch_method', type=str, default='auto')
    args = parser.parse_args()

    from daft_exprt_tpu.frontend.audio import load_wav
    from daft_exprt_tpu.frontend.pitch import extract_pitch
    from daft_exprt_tpu.hparams import HyperParams

    hp = HyperParams(verbose=False, training_files='unused',
                     validation_files='unused', output_directory='/tmp/cpc',
                     language='english', speakers=['spk'])
    curves = []
    for path in (args.wav_a, args.wav_b):
        wav, fs = load_wav(path, target_sr=hp.sampling_rate)
        curves.append(extract_pitch(wav, fs, hp, method=args.pitch_method))
    r = pitch_curve_correlation(*curves)
    print(f'pitch PCC: {r if r is not None else "undefined"}')
