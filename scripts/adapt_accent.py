"""Accent adaptation: fine-tune the FiLM path on target-accent data and
memorize the accent embedding.

Implements the README-documented ``adapt_accent`` capability that is absent
from the reference tree (SURVEY.md §7.4 note 3): compute the average accent
embedding of the adaptation corpus through the accent encoder, fine-tune
style_adapter (+ optionally frame_decoder) on that corpus, and store
``memorized_accent_emb`` in the checkpoint so synthesis can run without
reference audio.
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
    import jax
    import optax

    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.data import (
        DynamicSpeakerStatsManager, prepare_data_iterators)
    from daft_exprt_tpu.loss import loss_cfg_from_hparams
    from daft_exprt_tpu.parallel.train_step import (
        MODEL_INPUT_KEYS, make_train_step)
    from scripts.adapt_speaker import make_freeze_mask
    from scripts.synthesize import load_model_for_synthesis

    model, params, hparams, _extra = load_model_for_synthesis(args.checkpoint)
    hparams.training_files = args.training_files
    hparams.validation_files = args.validation_files or args.training_files

    unfrozen = ['style_adapter']
    if args.unfreeze_decoder:
        unfrozen.append('frame_decoder')
    mask = make_freeze_mask(params, unfrozen)
    tx = optax.masked(optax.adam(args.learning_rate), mask)
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx, loss_cfg_from_hparams(hparams),
                              None, mesh=None, accumulation_steps=1,
                              donate=False)

    train_it, _, n = prepare_data_iterators(hparams,
                                            batch_size=args.batch_size)
    stats_manager = DynamicSpeakerStatsManager(hparams)
    _logger.info(f'{n} accent adaptation examples; unfrozen: {unfrozen}')

    encode = jax.jit(lambda p, b: model.apply(
        {'params': p}, method=model.encode_accent,
        frames_energy=b['frames_energy'], frames_pitch=b['frames_pitch'],
        mel_specs=b['mel_specs'], output_lengths=b['output_lengths'],
        deterministic=True))

    rng = jax.random.PRNGKey(hparams.seed)
    accent_embs, iteration = [], 0
    for epoch in range(args.epochs):
        train_it.set_epoch(epoch)
        for batch, _, _ in train_it:
            norm = stats_manager.process_batch(batch)
            raw = {'frames_energy': batch['frames_energy'],
                   'frames_pitch': batch['frames_pitch']}
            if epoch == 0:
                accent_embs.append(np.asarray(encode(params, norm)))
            params, opt_state, metrics = step_fn(
                params, opt_state, norm, raw, np.float32(iteration),
                jax.random.fold_in(rng, iteration))
            iteration += 1
            if iteration % args.log_every == 0:
                _logger.info(f"[{iteration}] loss {float(metrics['loss']):.4f}")

    memorized = np.concatenate(accent_embs).mean(axis=0) if accent_embs \
        else None
    extra = {'memorized_accent_emb': memorized} if memorized is not None \
        else {}
    ckpt.save_checkpoint(args.output_checkpoint, params, iteration=iteration,
                         config_params={k: v for k, v in
                                        hparams.__dict__.items()
                                        if isinstance(v, (int, float, str,
                                                          bool, list, dict))},
                         extra=extra)
    _logger.info(f'accent-adapted checkpoint saved to '
                 f'{args.output_checkpoint}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-chk', '--checkpoint', type=str, required=True)
    parser.add_argument('-out', '--output_checkpoint', type=str,
                        required=True)
    parser.add_argument('-tf', '--training_files', type=str, required=True)
    parser.add_argument('-vf', '--validation_files', type=str, default='')
    parser.add_argument('--unfreeze_decoder', action='store_true')
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--batch_size', type=int, default=2)
    parser.add_argument('--learning_rate', type=float, default=1e-5)
    parser.add_argument('--log_every', type=int, default=10)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s [%(levelname)s] %(message)s')
    main(args)
