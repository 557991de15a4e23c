"""Composite training loss (functional, jit-friendly).

All five terms of the reference loss (reference: src/daft_exprt/loss.py:57-159):
  1. mel reconstruction L1 + L2, per-frame normalized
  2. adversarial speaker cross-entropy with linear warmup on the weight
  3. FiLM scalar post-multiplier L2 regularization
  4. energy consistency: smoothed linear-mel L2-norm MSE
  5. pitch consistency: frozen PitchPredictor on predicted mels, voiced-masked

Pure function of (outputs, targets, iteration) so it lives inside the jitted
train step; the frozen pitch predictor is passed as (apply_fn, variables).
"""
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp


def adversarial_weight(iteration, warmup_steps, adv_max_weight):
    """Linear warmup of the adversarial CE weight
    (reference: src/daft_exprt/loss.py:52-55)."""
    w = (iteration * warmup_steps ** -1.5 * adv_max_weight
         / warmup_steps ** -0.5)
    return jnp.minimum(adv_max_weight, w)


def _avg_pool5(x):
    """torch AvgPool1d(k=5, s=1, p=2, count_include_pad=True) over (B, T)."""
    pad = jnp.pad(x, ((0, 0), (2, 2)))
    return (pad[:, :-4] + pad[:, 1:-3] + pad[:, 2:-2] + pad[:, 3:-1]
            + pad[:, 4:]) / 5.0


def _softmax_ce(logits, labels):
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    logz = jnp.log(jnp.sum(jnp.exp(logits), axis=-1))
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - gold)


def compute_loss(
    outputs: Dict[str, Any],
    targets: Dict[str, Any],
    iteration,
    cfg: Dict[str, float],
    pitch_predictor: Optional[Tuple[Callable, Any]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """outputs: dict from DaftExprt.__call__; targets: dict with
    mel_specs, output_lengths, speaker_ids, frames_energy_raw,
    frames_pitch_raw. cfg: warmup_steps, adv_max_weight, post_mult_weight,
    mel_spec_weight, energy_consistency_weight, pitch_consistency_weight,
    n_mel_channels."""
    mel_preds = outputs['mel_preds']                      # (B, n_mel, T)
    mel_tgt = targets['mel_specs']
    out_lens = targets['output_lengths'].astype(jnp.float32)
    n_mel = cfg['n_mel_channels']

    # 1. adversarial speaker loss
    speaker_preds = outputs.get('speaker_preds')
    if speaker_preds is not None:
        ce_raw = _softmax_ce(speaker_preds, targets['speaker_ids'])
        w = adversarial_weight(iteration, cfg['warmup_steps'],
                               cfg['adv_max_weight'])
        speaker_loss = w * ce_raw
    else:
        ce_raw = jnp.float32(0.0)
        speaker_loss = jnp.float32(0.0)

    # 2. FiLM post-multiplier L2
    post = outputs.get('post_multipliers')
    if cfg['post_mult_weight'] != 0.0 and post is not None:
        post_mult_loss = cfg['post_mult_weight'] * jnp.linalg.norm(post)
    else:
        post_mult_loss = jnp.float32(0.0)

    # 3. mel reconstruction, per-frame normalized then batch-averaged
    diff = mel_preds - mel_tgt
    l1 = jnp.sum(jnp.abs(diff), axis=(1, 2)) / (n_mel * out_lens)
    l2 = jnp.sum(diff * diff, axis=(1, 2)) / (n_mel * out_lens)
    mel_l1 = cfg['mel_spec_weight'] * jnp.mean(l1)
    mel_l2 = cfg['mel_spec_weight'] * jnp.mean(l2)

    loss = speaker_loss + post_mult_loss + mel_l1 + mel_l2

    # 4. energy consistency
    energy_loss = jnp.float32(0.0)
    if cfg['energy_consistency_weight'] > 0:
        T = mel_preds.shape[-1]
        pred_e = jnp.linalg.norm(jnp.exp(mel_preds), axis=1)      # (B, T)
        tgt_e = jnp.linalg.norm(jnp.exp(mel_tgt), axis=1)
        mse = (_avg_pool5(pred_e) - _avg_pool5(tgt_e)) ** 2
        mask = jnp.arange(T)[None, :] < out_lens[:, None]
        energy_loss = jnp.sum(mse * mask) / jnp.sum(out_lens)
        loss = loss + cfg['energy_consistency_weight'] * energy_loss

    # 5. pitch consistency (frozen predictor)
    pitch_loss = jnp.float32(0.0)
    if (pitch_predictor is not None
            and cfg['pitch_consistency_weight'] > 0
            and targets.get('frames_pitch_raw') is not None):
        apply_fn, pp_vars = pitch_predictor
        pred_pitch = apply_fn(pp_vars, mel_preds)                 # (B, T)
        gt = targets['frames_pitch_raw']
        T = pred_pitch.shape[-1]
        mse = (pred_pitch - gt) ** 2
        len_mask = jnp.arange(T)[None, :] < out_lens[:, None]
        voiced = gt != 0.0
        mask = (len_mask & voiced).astype(jnp.float32)
        pitch_loss = jnp.sum(mse * mask) / (jnp.sum(mask) + 1e-5)
        loss = loss + cfg['pitch_consistency_weight'] * pitch_loss

    individual = {
        'speaker_loss': speaker_loss,
        'speaker_ce_raw': ce_raw,
        'post_mult_loss': post_mult_loss,
        'mel_spec_l1_loss': mel_l1,
        'mel_spec_l2_loss': mel_l2,
        'energy_consistency_loss': energy_loss,
        'pitch_consistency_loss': pitch_loss,
    }
    return loss, individual


def loss_cfg_from_hparams(hp) -> Dict[str, float]:
    return {
        'warmup_steps': float(getattr(hp, 'warmup_steps', 10000)),
        'adv_max_weight': float(getattr(hp, 'adv_max_weight', 1e-2)),
        'post_mult_weight': float(getattr(hp, 'post_mult_weight', 1e-3)),
        'mel_spec_weight': float(getattr(hp, 'mel_spec_weight', 1.0)),
        'energy_consistency_weight':
            float(getattr(hp, 'energy_consistency_weight', 0.0)),
        'pitch_consistency_weight':
            float(getattr(hp, 'pitch_consistency_weight', 0.0)),
        'n_mel_channels': float(hp.n_mel_channels),
    }
