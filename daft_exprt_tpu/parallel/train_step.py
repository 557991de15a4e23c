"""Jit-compiled, mesh-sharded training/eval steps.

One jitted program per (L, T) bucket covers: forward (with dropout),
composite loss, backward, gradient accumulation (lax.scan over stacked
micro-batches, reference: src/daft_exprt/train.py:423-445), global-norm
clipping, Adam with the warmup + inverse-sqrt schedule
(reference: train.py:148-160), and the parameter update. With the batch
sharded on the mesh's ``data`` axis and params replicated, XLA inserts the
gradient all-reduce over ICI — the DDP/NCCL equivalent, compiler-generated.
"""
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from daft_exprt_tpu.loss import compute_loss

MODEL_INPUT_KEYS = (
    'symbols', 'durations_float', 'durations_int', 'symbols_energy',
    'symbols_pitch', 'input_lengths', 'frames_energy', 'frames_pitch',
    'mel_specs', 'output_lengths', 'speaker_ids', 'spk_embs')


def make_learning_rate_fn(hp) -> Callable:
    """Linear warmup then inverse-sqrt decay (reference: train.py:148-160)."""
    initial = hp.initial_learning_rate
    maximum = hp.max_learning_rate
    warmup = hp.warmup_steps

    def lr(iteration):
        iteration = jnp.asarray(iteration, dtype=jnp.float32)
        warm = (maximum - initial) / warmup * iteration + initial
        decay = jnp.where(iteration > 0, iteration, 1.0) ** -0.5 \
            * maximum / warmup ** -0.5
        return jnp.where(iteration < warmup, warm, decay)

    return lr


def make_optimizer(hp) -> optax.GradientTransformation:
    """Adam with L2-into-gradient weight decay (torch Adam semantics,
    reference: train.py:297-300) and the custom LR schedule."""
    lr_fn = make_learning_rate_fn(hp)
    txs = []
    if hp.weight_decay:
        txs.append(optax.add_decayed_weights(hp.weight_decay))
    txs.append(optax.scale_by_adam(b1=hp.betas[0], b2=hp.betas[1],
                                   eps=hp.epsilon))
    txs.append(optax.scale_by_learning_rate(lr_fn))
    return optax.chain(*txs)


def _targets_from_batch(batch, norm_batch):
    """Targets mix: normalized symbol prosody, raw frame prosody for the
    consistency losses (reference: train.py:415-420)."""
    return {
        'mel_specs': norm_batch['mel_specs'],
        'output_lengths': norm_batch['output_lengths'],
        'speaker_ids': norm_batch['speaker_ids'],
        'frames_energy_raw': batch['frames_energy'],
        'frames_pitch_raw': batch['frames_pitch'],
    }


def make_train_step(model, tx, loss_cfg: Dict[str, float],
                    pitch_predictor: Optional[Tuple[Callable, Any]] = None,
                    mesh=None, accumulation_steps: int = 1,
                    grad_clip: float = float('inf'), data_axis='data',
                    donate=True):
    """Returns train_step(params, opt_state, batch, raw_frames, iteration,
    rng) → (params, opt_state, metrics).

    ``batch`` carries normalized prosody; ``raw_frames`` the pre-
    normalization frame prosody (for consistency losses). When
    accumulation_steps > 1 the leading axis of every batch array must be
    divisible by it; micro-batches are scanned with averaged gradients.
    """
    lr_fn = None

    def loss_for_micro(params, micro, raw, iteration, rng):
        inputs = {k: micro[k] for k in MODEL_INPUT_KEYS}
        out = model.apply({'params': params}, deterministic=False,
                          rngs={'dropout': rng}, **inputs)
        targets = {
            'mel_specs': micro['mel_specs'],
            'output_lengths': micro['output_lengths'],
            'speaker_ids': micro['speaker_ids'],
            'frames_energy_raw': raw['frames_energy'],
            'frames_pitch_raw': raw['frames_pitch'],
        }
        return compute_loss(out, targets, iteration, loss_cfg,
                            pitch_predictor)

    def step(params, opt_state, batch, raw_frames, iteration, rng):
        # fold the iteration into the key HERE, where iteration is traced:
        # host-side fold_in on an rbg typed key bakes the data operand into
        # the executable and recompiles (+~0.8 s) every iteration on the
        # axon tunnel. Callers pass the same base key every step.
        rng = jax.random.fold_in(rng, jnp.asarray(iteration, jnp.int32))
        grad_fn = jax.value_and_grad(loss_for_micro, has_aux=True)

        if accumulation_steps > 1:
            def split(x):
                # strided micro-batching: each micro-batch takes one row per
                # device block, so every micro-step stays balanced across the
                # data axis (a contiguous split would put a whole micro-batch
                # on one device)
                return x.reshape((x.shape[0] // accumulation_steps,
                                  accumulation_steps) + x.shape[1:]
                                 ).swapaxes(0, 1)
            micro_batches = jax.tree_util.tree_map(split, batch)
            micro_raw = jax.tree_util.tree_map(split, raw_frames)

            def scan_body(carry, xs):
                grads_acc, loss_acc, indiv_acc = carry
                micro, raw, idx = xs
                sub_rng = jax.random.fold_in(rng, idx)
                (loss, indiv), grads = grad_fn(params, micro, raw,
                                               iteration, sub_rng)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                indiv_acc = jax.tree_util.tree_map(jnp.add, indiv_acc, indiv)
                return (grads_acc, loss_acc + loss, indiv_acc), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            zero_indiv = {k: jnp.float32(0.0) for k in (
                'speaker_loss', 'speaker_ce_raw', 'post_mult_loss',
                'mel_spec_l1_loss', 'mel_spec_l2_loss',
                'energy_consistency_loss', 'pitch_consistency_loss')}
            (grads, loss, indiv), _ = jax.lax.scan(
                scan_body, (zero_grads, jnp.float32(0.0), zero_indiv),
                (micro_batches, micro_raw,
                 jnp.arange(accumulation_steps)))
            scale = 1.0 / accumulation_steps
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            loss = loss * scale
            indiv = jax.tree_util.tree_map(lambda v: v * scale, indiv)
        else:
            (loss, indiv), grads = grad_fn(params, batch, raw_frames,
                                           iteration, rng)

        grad_norm = optax.global_norm(grads)
        if grad_clip != float('inf'):
            factor = jnp.minimum(1.0, grad_clip / (grad_norm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * factor, grads)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(indiv)
        metrics['loss'] = loss
        metrics['grad_norm'] = grad_norm
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, data, repl, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else ())


def make_eval_step(model, loss_cfg, pitch_predictor=None, mesh=None,
                   data_axis='data'):
    """Deterministic forward + loss for validation
    (reference: train.py:163-210)."""

    def step(params, batch, raw_frames):
        inputs = {k: batch[k] for k in MODEL_INPUT_KEYS}
        out = model.apply({'params': params}, deterministic=True, **inputs)
        targets = {
            'mel_specs': batch['mel_specs'],
            'output_lengths': batch['output_lengths'],
            'speaker_ids': batch['speaker_ids'],
            'frames_energy_raw': raw_frames['frames_energy'],
            'frames_pitch_raw': raw_frames['frames_pitch'],
        }
        loss, indiv = compute_loss(out, targets, jnp.float32(0.0), loss_cfg,
                                   pitch_predictor)
        metrics = dict(indiv)
        metrics['loss'] = loss
        return metrics, out

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(step, in_shardings=(repl, data, data),
                   out_shardings=(repl, data))
