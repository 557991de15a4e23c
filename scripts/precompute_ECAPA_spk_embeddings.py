"""Standalone ECAPA speaker-embedding precompute.

Capability parity with the reference
(reference: scripts/precompute_ECAPA_spk_embeddings.py:84-143): iterate
train/validation file lists, locate source wavs heuristically, and write
``<file>.spk_emb.npy`` next to the features.
"""
import argparse
import logging
import os
import sys

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-tf', '--training_files', type=str, required=True)
    parser.add_argument('-vf', '--validation_files', type=str, default='')
    parser.add_argument('-dd', '--data_set_dir', type=str, default=None,
                        help='dataset root for wav lookup')
    parser.add_argument('--device', type=str, default='cpu')
    parser.add_argument('--overwrite', action='store_true')
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from daft_exprt_tpu.frontend.ecapa import compute_ecapa_for_file_lists
    lists = [args.training_files]
    if args.validation_files:
        lists.append(args.validation_files)
    n = compute_ecapa_for_file_lists(lists, dataset_dir=args.data_set_dir,
                                     device=args.device,
                                     overwrite=args.overwrite)
    print(f'{n} embeddings computed')
