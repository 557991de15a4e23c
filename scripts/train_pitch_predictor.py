"""Train the frozen-use PitchPredictor (mel → frame pitch, masked MSE).

Capability parity with the reference trainer
(reference: scripts/train_pitch_predictor.py:30-200): auto-generates file
lists from a features directory, trains the conv stack with masked MSE on
voiced+valid frames, saves epoch checkpoints. Runs as a jitted train step
with batch-norm state updates.
"""
import argparse
import logging
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

_logger = logging.getLogger(__name__)


def collect_files(features_dir):
    """All (mel.npy, frames_f0) pairs under a features directory."""
    pairs = []
    for root, _, files in os.walk(features_dir):
        for f in files:
            if f.endswith('.npy') and not f.endswith('.spk_emb.npy'):
                base = os.path.join(root, f[:-4])
                if os.path.isfile(base + '.frames_f0'):
                    pairs.append(base)
    return sorted(pairs)


def batches(pairs, batch_size, t_max, rng):
    order = rng.permutation(len(pairs))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        mels, pitches, lengths = [], [], []
        for j in order[i:i + batch_size]:
            mel = np.load(pairs[j] + '.npy')
            with open(pairs[j] + '.frames_f0') as f:
                f0 = np.array([float(x) for x in f], dtype=np.float32)
            T = min(mel.shape[1], len(f0), t_max)
            m = np.full((mel.shape[0], t_max), np.log(1e-5), dtype=np.float32)
            m[:, :T] = mel[:, :T]
            p = np.zeros(t_max, dtype=np.float32)
            p[:T] = f0[:T]
            mels.append(m)
            pitches.append(p)
            lengths.append(T)
        yield (np.stack(mels), np.stack(pitches),
               np.array(lengths, dtype=np.int64))


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.models.pitch_predictor import PitchPredictor

    pairs = collect_files(args.features_dir)
    if not pairs:
        raise ValueError(f'no (mel, frames_f0) pairs in {args.features_dir}')
    _logger.info(f'{len(pairs)} training files')

    model = PitchPredictor(n_mel_channels=args.n_mel_channels)
    rng = jax.random.PRNGKey(args.seed)
    dummy = np.zeros((1, args.n_mel_channels, args.t_max), dtype=np.float32)
    variables = model.init({'params': rng}, dummy, deterministic=True,
                           use_running_average=False)
    params, batch_stats = variables['params'], variables['batch_stats']
    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, mel, f0, lengths, drop_rng):
        def loss_fn(p):
            out, mutated = model.apply(
                {'params': p, 'batch_stats': batch_stats}, mel,
                deterministic=False, use_running_average=False,
                rngs={'dropout': drop_rng}, mutable=['batch_stats'])
            T = out.shape[1]
            mask = ((jnp.arange(T)[None, :] < lengths[:, None])
                    & (f0 != 0.0)).astype(jnp.float32)
            mse = jnp.sum(((out - f0) ** 2) * mask) / (jnp.sum(mask) + 1e-5)
            return mse, mutated['batch_stats']

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    np_rng = np.random.RandomState(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    step = 0
    for epoch in range(1, args.epochs + 1):
        losses = []
        for mel, f0, lengths in batches(pairs, args.batch_size, args.t_max,
                                        np_rng):
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, mel, f0, lengths,
                jax.random.fold_in(rng, step))
            losses.append(float(loss))
            step += 1
        _logger.info(f'epoch {epoch}: masked MSE {np.mean(losses):.5f} '
                     f'({len(losses)} steps)')
        ckpt.save_checkpoint(
            os.path.join(args.output_dir,
                         f'pitch_predictor_epoch_{epoch}'),
            {'params': params, 'batch_stats': batch_stats},
            iteration=step)
    _logger.info('done')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-fd', '--features_dir', type=str, required=True)
    parser.add_argument('-out', '--output_dir', type=str, required=True)
    parser.add_argument('--epochs', type=int, default=5)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--t_max', type=int, default=1024)
    parser.add_argument('--learning_rate', type=float, default=1e-4)
    parser.add_argument('--n_mel_channels', type=int, default=80)
    parser.add_argument('--seed', type=int, default=1234)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s [%(levelname)s] %(message)s')
    main(args)
