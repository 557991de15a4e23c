"""Embedding-manifold diagnostics for a checkpoint.

Modernized equivalent of the reference diagnostic
(reference: scripts/analyze_embedding_manifold.py — written for the removed
lookup-table era, SURVEY.md §7.4 note 3): analyzes the ECAPA-projection
weights and, given precomputed .spk_emb.npy files, the norm/cosine-distance
statistics of the projected speaker embeddings.
"""
import argparse
import logging
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

_logger = logging.getLogger(__name__)


def main(args):
    from scripts.synthesize import load_model_for_synthesis

    model, params, hparams, _extra = load_model_for_synthesis(args.checkpoint)
    W = np.asarray(params['spk_projection']['linear_layer']['kernel'])
    sv = np.linalg.svd(W, compute_uv=False)
    print(f'spk_projection: {W.shape}, singular values '
          f'max={sv.max():.3f} min={sv.min():.4f} '
          f'cond={sv.max() / max(sv.min(), 1e-9):.1f}')

    if args.features_dir:
        embs = []
        for root, _, files in os.walk(args.features_dir):
            for f in files:
                if f.endswith('.spk_emb.npy'):
                    embs.append(np.load(os.path.join(root, f)).reshape(-1))
        if embs:
            E = np.stack(embs)
            E_norm = E / np.linalg.norm(E, axis=1, keepdims=True)
            proj = E_norm @ W + np.asarray(
                params['spk_projection']['linear_layer']['bias'])
            norms = np.linalg.norm(proj, axis=1)
            cos = (proj @ proj.T) / np.outer(norms, norms)
            off = cos[~np.eye(len(cos), dtype=bool)]
            print(f'{len(embs)} embeddings: projected norm '
                  f'{norms.mean():.3f}±{norms.std():.3f}, pairwise cosine '
                  f'{off.mean():.3f}±{off.std():.3f} '
                  f'(min {off.min():.3f}, max {off.max():.3f})')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-chk', '--checkpoint', type=str, required=True)
    parser.add_argument('-fd', '--features_dir', type=str, default='')
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    main(args)
