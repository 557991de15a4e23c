"""Symbol-prosody file → speaker pitch/energy stats JSON.

Capability parity with the reference
(reference: scripts/compute_spk_stats_from_prosody.py:33-71): collect voiced
pitch and non-zero energy values across all entries, emit
{pitch: {mean, std}, energy: {mean, std}} for synthesize.py
--new_speaker_stats.
"""
import argparse
import json
import logging
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)


def compute_stats(prosody_file, hparams):
    from scripts.synthesize import parse_symbol_prosody_file
    _, _, external_prosody = parse_symbol_prosody_file(prosody_file, hparams)
    pitch_vals, energy_vals = [], []
    for entry in external_prosody:
        pitch_vals.extend(p for p in entry['pitch'] if p != 0.0)
        energy_vals.extend(e for e in entry['energy'] if e != 0.0)
    if not pitch_vals or not energy_vals:
        raise ValueError('no voiced pitch / non-zero energy values found')
    return {
        'pitch': {'mean': float(np.mean(pitch_vals)),
                  'std': float(np.std(pitch_vals)) or 1.0},
        'energy': {'mean': float(np.mean(energy_vals)),
                   'std': float(np.std(energy_vals)) or 1.0},
    }


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-spf', '--symbol_prosody_file', type=str,
                        required=True)
    parser.add_argument('-o', '--output_file', type=str, required=True)
    parser.add_argument('-l', '--language', type=str, default='english')
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from daft_exprt_tpu.hparams import HyperParams
    hparams = HyperParams(verbose=False, training_files='unused',
                          validation_files='unused',
                          output_directory='/tmp/spk_stats',
                          language=args.language, speakers=['spk'])
    stats = compute_stats(args.symbol_prosody_file, hparams)
    with open(args.output_file, 'w') as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))
