"""Synthetic on-disk dataset builder for training tests (reference feature
layout: src/daft_exprt/data_loader.py:123-178)."""
import os

import numpy as np

from daft_exprt_tpu.text.symbols import symbols_english


def build_synthetic_dataset(root, n_speakers=2, files_per_speaker=6,
                            n_mels=80, emb_dim=192, seed=0):
    """Creates features dirs + train/val list files; returns (train_list,
    val_list, features_root)."""
    rng = np.random.RandomState(seed)
    features_root = os.path.join(root, 'features')
    lines = []
    for spk in range(n_speakers):
        spk_dir = os.path.join(features_root, f'speaker_{spk}')
        os.makedirs(spk_dir, exist_ok=True)
        meta = []
        for i in range(files_per_speaker):
            name = f'utt_{i:03d}'
            L = rng.randint(6, 14)
            dur_int = rng.randint(2, 8, size=L)
            T = int(dur_int.sum())
            mel = rng.randn(n_mels, T).astype(np.float32)
            np.save(os.path.join(spk_dir, f'{name}.npy'), mel)

            sym_ids = rng.randint(7, len(symbols_english), size=L)
            hop_s = 256 / 22050
            with open(os.path.join(spk_dir, f'{name}.markers'), 'w') as f:
                t = 0.0
                for l in range(L):
                    d = dur_int[l] * hop_s
                    f.write(f'{t:.3f}\t{t + d:.3f}\t{dur_int[l]}\t'
                            f'{symbols_english[sym_ids[l]]}\tword\t{l}\n')
                    t += d
            frames_nrg = np.abs(rng.randn(T)) * 5 + 8
            frames_f0 = np.where(rng.rand(T) < 0.8,
                                 rng.randn(T) * 0.2 + 5.0, 0.0)
            symbols_nrg = np.abs(rng.randn(L)) * 5 + 8
            symbols_f0 = np.where(rng.rand(L) < 0.8,
                                  rng.randn(L) * 0.2 + 5.0, 0.0)
            for track, ext in ((frames_nrg, 'frames_nrg'),
                               (frames_f0, 'frames_f0'),
                               (symbols_nrg, 'symbols_nrg'),
                               (symbols_f0, 'symbols_f0')):
                with open(os.path.join(spk_dir, f'{name}.{ext}'), 'w') as f:
                    f.writelines(f'{v:.3f}\n' for v in track)
            np.save(os.path.join(spk_dir, f'{name}.spk_emb.npy'),
                    rng.randn(emb_dim).astype(np.float32))
            meta.append(f'{name}|some text\n')
            lines.append(f'{spk_dir}|{name}|{spk}\n')
        with open(os.path.join(spk_dir, 'metadata.csv'), 'w') as f:
            f.writelines(meta)

    train_list = os.path.join(root, 'train.txt')
    val_list = os.path.join(root, 'val.txt')
    with open(train_list, 'w') as f:
        f.writelines(lines[:-2])
    with open(val_list, 'w') as f:
        f.writelines(lines[-2:])
    return train_list, val_list, features_root
