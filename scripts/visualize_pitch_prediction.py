"""GT-vs-predicted pitch overlays from a PitchPredictor checkpoint
(reference: scripts/visualize_pitch_prediction.py:23-158)."""
import argparse
import logging
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

_logger = logging.getLogger(__name__)


def main(args):
    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.models.pitch_predictor import PitchPredictor
    from daft_exprt_tpu.utils.plots import plot_1d_overlay

    model = PitchPredictor(n_mel_channels=args.n_mel_channels)
    if args.checkpoint.endswith('.pt'):
        sd = ckpt.torch_load_guarded(args.checkpoint)
        sd = {k: v.detach().numpy() for k, v in sd.items()}
        params, batch_stats = ckpt.convert_torch_pitch_predictor(sd)
        variables = {'params': params, 'batch_stats': batch_stats}
    else:
        payload, _ = ckpt.load_checkpoint(args.checkpoint)
        variables = payload['params']

    from scripts.train_pitch_predictor import collect_files
    pairs = collect_files(args.features_dir)[:args.nb_files]
    os.makedirs(args.output_dir, exist_ok=True)
    for base in pairs:
        mel = np.load(base + '.npy').astype(np.float32)
        with open(base + '.frames_f0') as f:
            gt = np.array([float(x) for x in f], dtype=np.float32)
        pred = np.asarray(model.apply(variables, mel[None],
                                      deterministic=True,
                                      use_running_average=True))[0]
        name = os.path.basename(base)
        T = min(len(gt), len(pred))
        plot_1d_overlay([gt[:T], pred[:T]], labels=['GT', 'Predicted'],
                        filename=os.path.join(args.output_dir,
                                              f'{name}_pitch.png'),
                        title=name)
        voiced = gt[:T] != 0
        if voiced.any():
            mse = float(np.mean((pred[:T][voiced] - gt[:T][voiced]) ** 2))
            _logger.info(f'{name}: voiced MSE {mse:.5f}')
    _logger.info(f'{len(pairs)} overlays written to {args.output_dir}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-chk', '--checkpoint', type=str, required=True)
    parser.add_argument('-fd', '--features_dir', type=str, required=True)
    parser.add_argument('-out', '--output_dir', type=str, required=True)
    parser.add_argument('--nb_files', type=int, default=10)
    parser.add_argument('--n_mel_channels', type=int, default=80)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    main(args)
