"""Few-shot speaker adaptation against the current zero-shot ECAPA model.

Modernized per SURVEY.md §7.4 note 3: the reference's adapt_speaker.py
targets the removed lookup-table embedding; the README-documented intent
(fine-tune a subset of modules on few-shot data, memorize the speaker
embedding in the checkpoint) is implemented here against the live
architecture: the averaged ECAPA embedding of the adaptation data is stored
as ``memorized_spk_emb`` and a tiered subset of modules (spk_projection →
style_adapter → frame_decoder) is unfrozen for fine-tuning.
"""
import argparse
import logging
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

_logger = logging.getLogger(__name__)

TIERS = {
    1: ['spk_projection'],
    2: ['spk_projection', 'style_adapter'],
    3: ['spk_projection', 'style_adapter', 'frame_decoder'],
}


def make_freeze_mask(params, unfrozen_roots):
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, _: path[0].key in unfrozen_roots, params)


def main(args):
    import jax
    import optax

    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.data import (
        DynamicSpeakerStatsManager, prepare_data_iterators)
    from daft_exprt_tpu.loss import loss_cfg_from_hparams
    from daft_exprt_tpu.parallel.train_step import (
        MODEL_INPUT_KEYS, make_train_step)
    from scripts.synthesize import load_model_for_synthesis

    model, params, hparams, _extra = load_model_for_synthesis(args.checkpoint)
    hparams.training_files = args.training_files
    hparams.validation_files = args.validation_files or args.training_files

    unfrozen = TIERS[args.tier]
    _logger.info(f'unfrozen modules (tier {args.tier}): {unfrozen}')
    mask = make_freeze_mask(params, unfrozen)
    tx = optax.masked(optax.adam(args.learning_rate), mask)
    opt_state = tx.init(params)

    step_fn = make_train_step(model, tx, loss_cfg_from_hparams(hparams),
                              None, mesh=None, accumulation_steps=1,
                              donate=False)

    train_it, _, n = prepare_data_iterators(hparams,
                                            batch_size=args.batch_size)
    stats_manager = DynamicSpeakerStatsManager(hparams)
    _logger.info(f'{n} adaptation examples')

    # memorized speaker embedding: average over the adaptation data
    embs = []
    with open(hparams.training_files) as f:
        for line in f:
            parts = line.strip().split('|')
            if len(parts) >= 2:
                p = os.path.join(parts[0], f'{parts[1]}.spk_emb.npy')
                if os.path.isfile(p):
                    embs.append(np.load(p).reshape(-1))
    memorized_spk_emb = (np.mean(np.stack(embs), axis=0)
                         if embs else None)

    rng = jax.random.PRNGKey(hparams.seed)
    iteration = 0
    for epoch in range(args.epochs):
        train_it.set_epoch(epoch)
        for batch, _, _ in train_it:
            norm = stats_manager.process_batch(batch)
            raw = {'frames_energy': batch['frames_energy'],
                   'frames_pitch': batch['frames_pitch']}
            params, opt_state, metrics = step_fn(
                params, opt_state, norm, raw, np.float32(iteration),
                jax.random.fold_in(rng, iteration))
            iteration += 1
            if iteration % args.log_every == 0:
                _logger.info(f"[{iteration}] loss {float(metrics['loss']):.4f}")

    extra = {}
    if memorized_spk_emb is not None:
        extra['memorized_spk_emb'] = memorized_spk_emb
    ckpt.save_checkpoint(args.output_checkpoint, params, iteration=iteration,
                         config_params={k: v for k, v in
                                        hparams.__dict__.items()
                                        if isinstance(v, (int, float, str,
                                                          bool, list, dict))},
                         extra=extra)
    _logger.info(f'adapted checkpoint saved to {args.output_checkpoint}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-chk', '--checkpoint', type=str, required=True)
    parser.add_argument('-out', '--output_checkpoint', type=str,
                        required=True)
    parser.add_argument('-tf', '--training_files', type=str, required=True)
    parser.add_argument('-vf', '--validation_files', type=str, default='')
    parser.add_argument('--tier', type=int, default=2, choices=[1, 2, 3])
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--batch_size', type=int, default=2)
    parser.add_argument('--learning_rate', type=float, default=1e-5)
    parser.add_argument('--log_every', type=int, default=10)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s [%(levelname)s] %(message)s')
    main(args)
