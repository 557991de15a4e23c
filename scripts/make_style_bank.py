"""Populate the style bank from a formatted dataset (see
scripts/style_bank/english/README.md)."""
import argparse
import os
import random
import shutil
import sys

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-dd', '--data_set_dir', type=str, required=True)
    parser.add_argument('-out', '--output_dir', type=str, required=True)
    parser.add_argument('-n', '--nb_files', type=int, default=28)
    parser.add_argument('--seed', type=int, default=1234)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    wavs = []
    for root, _, files in os.walk(args.data_set_dir):
        wavs.extend(os.path.join(root, f) for f in files
                    if f.endswith('.wav'))
    if not wavs:
        sys.exit(f'no wavs under {args.data_set_dir}')
    os.makedirs(args.output_dir, exist_ok=True)
    for src in rng.sample(wavs, min(args.nb_files, len(wavs))):
        shutil.copyfile(src, os.path.join(args.output_dir,
                                          os.path.basename(src)))
    print(f'{min(args.nb_files, len(wavs))} wavs copied to '
          f'{args.output_dir}')
