"""Training driver — single-host and multi-host data parallel.

Capability parity with the reference DDP loop
(reference: src/daft_exprt/train.py:212-686): warmup + inverse-sqrt LR,
gradient accumulation, dynamic per-speaker stats refresh, periodic
validation with best-checkpoint tracking, per-iteration loss breakdown
logging, TensorBoard, resume with feature-config checks.

TPU-native execution model: one Python process per *host* (not per chip);
``jax.distributed.initialize`` replaces the TCP/NCCL rendezvous; the jitted
train step (parallel/train_step.py) is sharded over the mesh's data axis so
gradient reduction rides ICI via XLA collectives; explicit ``dist.barrier``
calls are unnecessary (collectives synchronize; checkpoint writes happen on
host 0 after ``block_until_ready``).
"""
import logging
import math
import os
import time

import jax
import numpy as np

from daft_exprt_tpu import checkpoint as ckpt
from daft_exprt_tpu.data import (
    DynamicSpeakerStatsManager, prepare_data_iterators,
)
from daft_exprt_tpu.loss import loss_cfg_from_hparams
from daft_exprt_tpu.models.daft_exprt import DaftExprt
from daft_exprt_tpu.models.pitch_predictor import PitchPredictor
from daft_exprt_tpu.parallel.mesh import make_mesh, shard_batch
from daft_exprt_tpu.parallel.train_step import (
    make_eval_step, make_learning_rate_fn, make_optimizer, make_train_step,
)
from daft_exprt_tpu.utils.logger import DaftExprtLogger

_logger = logging.getLogger(__name__)


def check_train_config(hparams):
    """Feature-config consistency between preprocessing and training
    (reference: train.py:42-60)."""
    import json
    ok = True
    with open(hparams.training_files, 'r', encoding='utf-8') as f:
        feature_dirs = {line.strip().split('|')[0] for line in f
                        if line.strip()}
    for d in feature_dirs:
        cfg_path = os.path.join(d, 'config.json')
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                ok &= hparams.features_config_matches(json.load(f))
    if not ok:
        raise ValueError('feature extraction config mismatch — re-run '
                         'pre_process or align hyper-parameters')


def load_frozen_pitch_predictor(hparams):
    """Load the frozen pitch predictor for the consistency loss; returns
    (apply_fn, variables) or None (reference: loss.py:41-50)."""
    path = getattr(hparams, 'pitch_predictor_path', '')
    weight = getattr(hparams, 'pitch_consistency_weight', 0.0)
    if not path or weight <= 0:
        return None
    model = PitchPredictor(n_mel_channels=hparams.n_mel_channels)
    if path.endswith('.pt'):
        import torch
        sd = torch.load(path, map_location='cpu', weights_only=False)
        if isinstance(sd, dict) and 'state_dict' in sd:
            sd = sd['state_dict']
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        params, batch_stats = ckpt.convert_torch_pitch_predictor(sd)
        variables = {'params': params, 'batch_stats': batch_stats}
    else:
        payload, _ = ckpt.load_checkpoint(path)
        variables = payload['params']

    def apply_fn(vars_, mel):
        return model.apply(vars_, mel, deterministic=True,
                           use_running_average=True)

    return (apply_fn, variables)


def init_model_and_state(hparams, rng_seed=None):
    """Build the model and (params, opt_state), freshly or from checkpoint."""
    model = DaftExprt.from_hparams(hparams)
    rng = jax.random.PRNGKey(rng_seed if rng_seed is not None
                             else hparams.seed)
    L0 = hparams.length_buckets[0]
    T0 = hparams.frame_buckets[0]
    dummy = dict(
        symbols=np.zeros((1, L0), dtype=np.int64),
        durations_float=np.zeros((1, L0), dtype=np.float32),
        durations_int=np.ones((1, L0), dtype=np.int64),
        symbols_energy=np.zeros((1, L0), dtype=np.float32),
        symbols_pitch=np.zeros((1, L0), dtype=np.float32),
        input_lengths=np.array([L0]),
        frames_energy=np.zeros((1, T0), dtype=np.float32),
        frames_pitch=np.zeros((1, T0), dtype=np.float32),
        mel_specs=np.zeros((1, hparams.n_mel_channels, T0), dtype=np.float32),
        output_lengths=np.array([T0]),
        speaker_ids=np.zeros((1,), dtype=np.int64),
        spk_embs=np.zeros((1, hparams.external_emb_dim), dtype=np.float32),
    )
    variables = model.init({'params': rng, 'dropout': rng}, **dummy)
    return model, variables['params']


def train(hparams, num_iterations=None, mesh=None, log_every=1,
          host_id=None, num_hosts=None):
    """Run the training loop; returns (params, final_metrics)."""
    check_train_config(hparams)
    os.makedirs(hparams.output_directory, exist_ok=True)
    host_id = host_id if host_id is not None else jax.process_index()
    num_hosts = num_hosts if num_hosts is not None else jax.process_count()
    is_chief = host_id == 0

    if mesh is None:
        mesh = make_mesh(n_model=1)
    n_replicas = mesh.devices.size
    local_batch = hparams.batch_size * (n_replicas // num_hosts)

    model, params = init_model_and_state(hparams)
    tx = make_optimizer(hparams)
    opt_state = tx.init(params)
    lr_fn = make_learning_rate_fn(hparams)
    loss_cfg = loss_cfg_from_hparams(hparams)
    pitch_predictor = load_frozen_pitch_predictor(hparams)

    iteration, best_val_loss = 0, float('inf')
    if hparams.checkpoint:
        payload, meta = ckpt.load_checkpoint(
            hparams.checkpoint,
            target={'params': params, 'opt_state': opt_state, 'extra': {}})
        params = payload['params']
        if payload.get('opt_state') is not None:
            opt_state = payload['opt_state']
        iteration = int(meta.get('iteration', 0))
        best_val_loss = float(meta.get('best_val_loss', float('inf')))
        _logger.info(f'resumed from {hparams.checkpoint} at iteration '
                     f'{iteration}')

    train_step = make_train_step(
        model, tx, loss_cfg, pitch_predictor, mesh=mesh,
        accumulation_steps=hparams.accumulation_steps,
        grad_clip=hparams.grad_clip_thresh,
        data_axis=hparams.mesh_data_axis)
    eval_step = make_eval_step(model, loss_cfg, pitch_predictor, mesh=mesh,
                               data_axis=hparams.mesh_data_axis)

    train_it, val_it, nb_examples = prepare_data_iterators(
        hparams, batch_size=local_batch * hparams.accumulation_steps,
        host_id=host_id, num_hosts=num_hosts)
    _logger.info(
        f'{nb_examples} training examples; effective batch '
        f'{hparams.batch_size * hparams.accumulation_steps * n_replicas} '
        f'({hparams.batch_size}/replica x {hparams.accumulation_steps} accum '
        f'x {n_replicas} replicas)')

    stats_manager = DynamicSpeakerStatsManager(hparams)
    refresh_interval = getattr(hparams, 'stats_refresh_interval', 100)
    tb = DaftExprtLogger(os.path.join(hparams.output_directory, 'logs')) \
        if is_chief else None
    # typed key so the impl choice is scoped to dropout draws (params init
    # above keeps the default impl — same init numerics as before)
    base_rng = jax.random.key(hparams.seed,
                              impl=getattr(hparams, 'prng_impl', '') or None)

    num_iterations = num_iterations or hparams.nb_iterations
    epochs = max(1, math.ceil((num_iterations - iteration)
                              / max(1, len(train_it))))
    start = time.time()
    metrics = {}
    done = False
    for epoch in range(epochs):
        if done:
            break
        train_it.set_epoch(epoch)
        for batch, _, _ in train_it:
            if iteration % refresh_interval == 0:
                stats_manager.refresh_stats()
            norm_batch = stats_manager.process_batch(batch)
            raw_frames = {'frames_energy': batch['frames_energy'],
                          'frames_pitch': batch['frames_pitch']}
            dev_batch = shard_batch(norm_batch, mesh, hparams.mesh_data_axis)
            dev_raw = shard_batch(raw_frames, mesh, hparams.mesh_data_axis)
            # the step folds the iteration into the key internally (see
            # make_train_step) — same base key object every call, no
            # per-step host-side key computation
            params, opt_state, metrics = train_step(
                params, opt_state, dev_batch, dev_raw,
                np.float32(iteration), base_rng)
            iteration += 1

            if is_chief and iteration % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                duration = time.time() - start
                start = time.time()
                lr = float(lr_fn(iteration))
                _logger.info(
                    f"Train loss [{iteration}]: {m['loss']:.6f} "
                    f"Grad Norm {m['grad_norm']:.6f} {duration:.2f}s/it "
                    f"(LR {lr:.6f})")
                if tb:
                    tb.log_training(
                        m['loss'],
                        {k: v for k, v in m.items()
                         if k not in ('loss', 'grad_norm')},
                        m['grad_norm'], lr, duration, iteration)

            if iteration % hparams.iters_check_for_model_improvement == 0:
                val_loss = validate(eval_step, params, val_it, stats_manager,
                                    mesh, hparams, tb, iteration)
                if val_loss < best_val_loss and is_chief:
                    best_val_loss = val_loss
                    _save(hparams, 'best_model', params, opt_state,
                          iteration, lr_fn, best_val_loss)

            if is_chief and iteration % hparams.iters_per_checkpoint == 0:
                _save(hparams, f'DaftExprt_{iteration}', params, opt_state,
                      iteration, lr_fn, best_val_loss)

            if iteration >= num_iterations:
                done = True
                break

    if is_chief:
        _save(hparams, f'DaftExprt_{iteration}', params, opt_state,
              iteration, lr_fn, best_val_loss)
        if tb:
            tb.close()
    return params, {k: float(v) for k, v in metrics.items()}


def validate(eval_step, params, val_it, stats_manager, mesh, hparams,
             tb=None, iteration=0):
    losses, indiv_acc, n = [], None, 0
    for batch, _, _ in val_it:
        norm_batch = stats_manager.process_batch(batch)
        raw = {'frames_energy': batch['frames_energy'],
               'frames_pitch': batch['frames_pitch']}
        metrics, _ = eval_step(params,
                               shard_batch(norm_batch, mesh,
                                           hparams.mesh_data_axis),
                               shard_batch(raw, mesh, hparams.mesh_data_axis))
        m = {k: float(v) for k, v in metrics.items()}
        losses.append(m.pop('loss'))
        indiv_acc = m if indiv_acc is None else \
            {k: indiv_acc[k] + v for k, v in m.items()}
        n += 1
    if n == 0:
        return float('inf')
    val_loss = float(np.mean(losses))
    indiv = {k: v / n for k, v in (indiv_acc or {}).items()}
    _logger.info(f'Validation loss [{iteration}]: {val_loss:.6f}')
    if tb is not None:
        tb.log_validation(val_loss, indiv, iteration)
    return val_loss


def _save(hparams, name, params, opt_state, iteration, lr_fn, best_val_loss):
    path = os.path.join(hparams.output_directory, 'checkpoints', name)
    config_params = {k: v for k, v in hparams.__dict__.items()
                     if isinstance(v, (int, float, str, bool, list, dict))}
    ckpt.save_checkpoint(path, params, opt_state=opt_state,
                         iteration=iteration,
                         learning_rate=float(lr_fn(iteration)),
                         best_val_loss=best_val_loss,
                         config_params=config_params)
    _logger.info(f'saved checkpoint {path}')


def launch_training(hparams, **kwargs):
    """Entry point mirroring the reference launcher
    (reference: train.py:548-686). Multi-host initialization is performed by
    the caller via jax.distributed.initialize when running on a pod slice."""
    log_file = os.path.join(hparams.output_directory, 'training.log')
    os.makedirs(hparams.output_directory, exist_ok=True)
    handler = logging.FileHandler(log_file)
    handler.setLevel(logging.INFO)
    logging.getLogger('daft_exprt_tpu').addHandler(handler)
    hparams.save_hyper_params(
        os.path.join(hparams.output_directory, 'config.json'))
    return train(hparams, **kwargs)
