"""Checkpointing + PyTorch-reference checkpoint conversion.

Our native checkpoints hold the same logical contents as the reference's
torch.save dict (reference: src/daft_exprt/train.py:80-85): iteration,
learning rate, best validation loss, model params, optimizer state, and the
full config — serialized as flax msgpack + a JSON sidecar so synthesis can
reconstruct the exact training config (reference: scripts/synthesize.py:198-205).

``convert_torch_state_dict`` maps a reference PyTorch DaftExprt state_dict
(DDP 'module.' prefix stripped) onto our flax parameter pytree; layout
correspondence is table-driven from the module structure described in
models/daft_exprt.py.
"""
import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

import flax
from flax import traverse_util


# ----------------------------------------------------------------------
# native checkpoint save/load
# ----------------------------------------------------------------------

def save_checkpoint(path, params, opt_state=None, iteration=0,
                    learning_rate=0.0, best_val_loss=float('inf'),
                    config_params=None, extra=None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        'params': params,
        'opt_state': opt_state,
        'extra': extra or {},
    }
    with open(path, 'wb') as f:
        f.write(flax.serialization.to_bytes(payload))
    meta = {
        'iteration': int(iteration),
        'learning_rate': float(learning_rate),
        'best_val_loss': float(best_val_loss),
        'config_params': config_params or {},
    }
    with open(path + '.json', 'w') as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def load_checkpoint(path, target=None):
    """Returns (payload, meta). ``target`` is an example pytree (same
    structure) used to restore typed arrays; None restores raw dicts."""
    with open(path, 'rb') as f:
        raw = f.read()
    if target is not None:
        payload = flax.serialization.from_bytes(target, raw)
    else:
        payload = flax.serialization.msgpack_restore(raw)
    meta_path = path + '.json'
    meta = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


# ----------------------------------------------------------------------
# torch → flax conversion
# ----------------------------------------------------------------------

def _t(x):
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix):
    return {'kernel': _t(sd[f'{prefix}.weight']).T,
            'bias': _t(sd[f'{prefix}.bias'])}


def _conv1d(sd, prefix):
    # torch (out, in, k) → flax (k, in, out)
    return {'kernel': _t(sd[f'{prefix}.weight']).transpose(2, 1, 0),
            'bias': _t(sd[f'{prefix}.bias'])}


def _layernorm(sd, prefix):
    return {'scale': _t(sd[f'{prefix}.weight']),
            'bias': _t(sd[f'{prefix}.bias'])}


def _fft_block(sd, prefix):
    return {
        'attention': {
            'in_proj': {
                'kernel': _t(sd[f'{prefix}.attention.multi_head_attention.in_proj_weight']).T,
                'bias': _t(sd[f'{prefix}.attention.multi_head_attention.in_proj_bias']),
            },
            'out_proj': _linear(sd, f'{prefix}.attention.multi_head_attention.out_proj'),
            'layer_norm': _layernorm(sd, f'{prefix}.attention.layer_norm'),
        },
        'feed_forward': {
            'conv1': {'conv': _conv1d(sd, f'{prefix}.feed_forward.convs.0.conv')},
            'conv2': {'conv': _conv1d(sd, f'{prefix}.feed_forward.convs.2.conv')},
            'layer_norm': _layernorm(sd, f'{prefix}.feed_forward.layer_norm'),
        },
    }


def strip_ddp_prefix(state_dict):
    return {(k[len('module.'):] if k.startswith('module.') else k): v
            for k, v in state_dict.items()}


def _count_blocks(sd, module):
    idxs = set()
    prefix = f'{module}.blocks.'
    for key in sd:
        if key.startswith(prefix):
            idxs.add(int(key[len(prefix):].split('.', 1)[0]))
    return (max(idxs) + 1) if idxs else 0


def convert_torch_state_dict(state_dict: Dict[str, Any],
                             nb_pe_blocks=None, nb_ae_blocks=None,
                             nb_fd_blocks=None):
    """Reference PyTorch DaftExprt state_dict → flax params dict. Block
    counts are inferred from the state dict unless given explicitly."""
    sd = strip_ddp_prefix({k: np.asarray(v) for k, v in state_dict.items()})
    if nb_pe_blocks is None:
        nb_pe_blocks = _count_blocks(sd, 'phoneme_encoder')
    if nb_ae_blocks is None:
        nb_ae_blocks = _count_blocks(sd, 'accent_encoder')
    if nb_fd_blocks is None:
        nb_fd_blocks = _count_blocks(sd, 'frame_decoder')

    params: Dict[str, Any] = {}
    params['spk_projection'] = {
        'linear_layer': _linear(sd, 'spk_projection.linear_layer')}

    pe = {'symbols_embedding': {
        'embedding': _t(sd['phoneme_encoder.symbols_embedding.weight'])}}
    for i in range(nb_pe_blocks):
        pe[f'block_{i}'] = _fft_block(sd, f'phoneme_encoder.blocks.{i}')
    params['phoneme_encoder'] = pe

    ae = {
        'energy_embedding': {'conv': _conv1d(sd, 'accent_encoder.energy_embedding.conv')},
        'pitch_embedding': {'conv': _conv1d(sd, 'accent_encoder.pitch_embedding.conv')},
    }
    # Sequential indices: convs at 0/4/8, LayerNorms at 2/6/10
    for j, (conv_idx, ln_idx) in enumerate([(0, 2), (4, 6), (8, 10)]):
        ae[f'conv_{j}'] = {'conv': _conv1d(sd, f'accent_encoder.convs.{conv_idx}.conv')}
        ae[f'ln_{j}'] = _layernorm(sd, f'accent_encoder.convs.{ln_idx}')
    for i in range(nb_ae_blocks):
        ae[f'block_{i}'] = _fft_block(sd, f'accent_encoder.blocks.{i}')
    params['accent_encoder'] = ae

    params['speaker_classifier'] = {
        'fc1': {'linear_layer': _linear(sd, 'speaker_classifier.classifier.1.linear_layer')},
        'fc2': {'linear_layer': _linear(sd, 'speaker_classifier.classifier.3.linear_layer')},
        'fc3': {'linear_layer': _linear(sd, 'speaker_classifier.classifier.5.linear_layer')},
    }

    sa = {
        'gammas_predictor': {'linear_layer': _linear(sd, 'style_adapter.gammas_predictor.linear_layer')},
        'betas_predictor': {'linear_layer': _linear(sd, 'style_adapter.betas_predictor.linear_layer')},
    }
    if 'style_adapter.post_multipliers' in sd:
        sa['post_multipliers'] = _t(sd['style_adapter.post_multipliers'])
    params['style_adapter'] = sa

    params['gaussian_upsampling'] = {
        'duration_projection': {'conv': _conv1d(sd, 'gaussian_upsampling.duration_projection.conv')},
        'energy_projection': {'conv': _conv1d(sd, 'gaussian_upsampling.energy_projection.conv')},
        'pitch_projection': {'conv': _conv1d(sd, 'gaussian_upsampling.pitch_projection.conv')},
        'range_projection': {'linear_layer': _linear(sd, 'gaussian_upsampling.projection.0.linear_layer')},
    }

    fd = {'projection': {'linear_layer': _linear(sd, 'frame_decoder.projection.linear_layer')}}
    for i in range(nb_fd_blocks):
        fd[f'block_{i}'] = _fft_block(sd, f'frame_decoder.blocks.{i}')
    params['frame_decoder'] = fd

    return jax_tree_cast(params)


def _fold_weight_norm(sd, prefix):
    """Fold torch weight_norm (dim=0) into a plain conv kernel."""
    v = _t(sd[f'{prefix}.weight_v'])               # (out, in, k)
    g = _t(sd[f'{prefix}.weight_g'])               # (out, 1, 1)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    return {'kernel': w.transpose(2, 1, 0), 'bias': _t(sd[f'{prefix}.bias'])}


def convert_torch_pitch_predictor(state_dict):
    """Reference PitchPredictor state_dict → (params, batch_stats)."""
    sd = strip_ddp_prefix({k: np.asarray(v) for k, v in state_dict.items()})
    params, batch_stats = {}, {}
    for j, (conv_idx, bn_idx) in enumerate([(0, 2), (4, 6), (8, 10)]):
        params[f'conv_{j}'] = _fold_weight_norm(sd, f'conv_layers.{conv_idx}.conv')
        params[f'bn_{j}'] = {
            'scale': _t(sd[f'conv_layers.{bn_idx}.weight']),
            'bias': _t(sd[f'conv_layers.{bn_idx}.bias']),
        }
        batch_stats[f'bn_{j}'] = {
            'mean': _t(sd[f'conv_layers.{bn_idx}.running_mean']),
            'var': _t(sd[f'conv_layers.{bn_idx}.running_var']),
        }
    params['conv_out'] = _fold_weight_norm(sd, 'conv_layers.12.conv')
    return jax_tree_cast(params), jax_tree_cast(batch_stats)


def jax_tree_cast(tree):
    flat = traverse_util.flatten_dict(tree)
    flat = {k: jnp.asarray(v) for k, v in flat.items()}
    return traverse_util.unflatten_dict(flat)


def torch_load_guarded(path):
    """torch.load with the repo-wide unpickling policy: try
    ``weights_only=True`` first (tensor-dict checkpoints never need full
    pickle deserialization, so a fetched artifact cannot execute code at
    load time); fall back to full unpickling only when the caller opts in
    with ``DAFT_TORCH_LOAD_UNSAFE=1`` — reserved for local trusted files.
    Shared by every torch-checkpoint loader (models/hifigan.py, the .pt
    converters here, scripts/visualize_pitch_prediction.py)."""
    import torch
    try:
        return torch.load(path, map_location='cpu', weights_only=True)
    except Exception:
        if os.environ.get('DAFT_TORCH_LOAD_UNSAFE', '0') != '1':
            raise RuntimeError(
                f'{path} is not loadable with torch.load(weights_only='
                'True) (it pickles non-tensor objects). Refusing to '
                'unpickle an untrusted checkpoint; set '
                'DAFT_TORCH_LOAD_UNSAFE=1 only for local files you trust.')
        return torch.load(path, map_location='cpu', weights_only=False)


def load_torch_checkpoint(path):
    """Load a reference .pt checkpoint (torch CPU) and convert it.

    Returns (flax_params, config_params, meta) where meta carries
    iteration/learning_rate/best_val_loss when present.
    """
    ckpt = torch_load_guarded(path)
    if isinstance(ckpt, dict) and 'state_dict' in ckpt:
        sd = ckpt['state_dict']
        config_params = ckpt.get('config_params', {})
        meta = {k: ckpt.get(k) for k in
                ('iteration', 'learning_rate', 'best_val_loss')}
    else:
        sd, config_params, meta = ckpt, {}, {}
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params = convert_torch_state_dict(sd)
    return params, config_params, meta
