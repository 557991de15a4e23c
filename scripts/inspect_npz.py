"""Distribution stats + clipping checks on generated mel npz files
(reference: scripts/inspect_npz.py:4-21)."""
import argparse

import numpy as np

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('npz_files', nargs='+')
    args = parser.parse_args()
    for path in args.npz_files:
        data = np.load(path)
        mel = data['mel_spec'] if 'mel_spec' in data else data[data.files[0]]
        clip_floor = np.isclose(mel, np.log(1e-5)).mean()
        print(f'{path}: shape={mel.shape} min={mel.min():.3f} '
              f'max={mel.max():.3f} mean={mel.mean():.3f} '
              f'std={mel.std():.3f} at_clip_floor={clip_floor * 100:.1f}%')
