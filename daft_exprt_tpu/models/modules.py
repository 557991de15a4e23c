"""Shared neural building blocks (flax.linen).

TPU-first re-design of the reference building blocks
(reference: src/daft_exprt/model.py:57-259): static shapes + boolean validity
masks everywhere (no data-dependent shapes), sinusoidal positions as a
precomputed table add (replacing the reference's per-row Python loops at
model.py:136-150), and attention as batched einsum over heads so XLA tiles
the contractions onto the MXU.

Parameter layouts intentionally mirror the PyTorch modules one-to-one so the
reference checkpoints convert mechanically (see checkpoint.py).
"""
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.ops.attention_kernels import fused_attention

def _fused_interpret() -> bool:
    """DAFT_FUSED_ATTN_INTERPRET=1 runs the fused-attention kernel in
    pallas interpret mode (CPU tests of the integrated path). Read at
    trace time so tests can toggle it."""
    return os.environ.get('DAFT_FUSED_ATTN_INTERPRET') == '1'


def fused_attention_available() -> bool:
    """True when the pallas fused-attention kernel should be the default:
    a TPU backend is present and the configured default device (if any) is
    not pinned elsewhere (tests pin CPU). Env DAFT_FUSED_ATTN=0/1
    overrides."""
    env = os.environ.get('DAFT_FUSED_ATTN')
    if env in ('0', '1'):
        return env == '1'
    if _fused_interpret():
        return True
    default = jax.config.jax_default_device
    if default is not None and default.platform not in ('tpu', 'axon'):
        return False
    try:
        return any(d.platform in ('tpu', 'axon') for d in jax.devices())
    except RuntimeError:
        return False


def sequence_mask(lengths, max_len):
    """(B,) lengths → (B, max_len) bool validity mask (True = valid)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def sinusoidal_table(max_len, embed_dim, timestep=10000.0):
    """Sinusoidal position table (max_len, embed_dim), float32.

    Matches the reference table (reference: src/daft_exprt/model.py:123-130):
    even columns sin, odd columns cos, frequencies exp(-2i ln(T)/d).
    """
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, embed_dim, 2, dtype=np.float64)
                 * (-np.log(timestep) / embed_dim))[None, :]
    table = np.zeros((max_len, embed_dim), dtype=np.float64)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(table, dtype=jnp.float32)


class LinearNorm(nn.Module):
    """Dense layer (torch LinearNorm equivalent, model.py:57-72)."""
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias,
                        dtype=self.dtype, name='linear_layer')(x)


class ConvNorm1D(nn.Module):
    """1D convolution over (B, L, C) with SAME padding (model.py:75-94)."""
    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, kernel_size=(self.kernel_size,),
                       kernel_dilation=(self.dilation,), padding='SAME',
                       use_bias=self.use_bias, dtype=self.dtype,
                       name='conv')(x)


class MultiHeadSelfAttention(nn.Module):
    """Self-attention + dropout + residual + LayerNorm (model.py:153-193).

    Packed qkv projection mirrors torch.nn.MultiheadAttention so reference
    checkpoints map directly (in_proj kernel (d, 3d), out_proj (d, d)).
    """
    embed_dim: int
    num_heads: int
    dropout: float
    dtype: Any = jnp.float32
    # pallas whole-row attention kernel: one VMEM pass per (batch, head,
    # q-block) instead of (B, h, T, T) HBM materializations; dropout mask
    # generated in-kernel and regenerated in the custom VJP
    fused: bool = False

    @nn.compact
    def __call__(self, x, valid_mask, deterministic=True):
        d, h = self.embed_dim, self.num_heads
        head_dim = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, name='in_proj')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = head_dim ** -0.5

        def split_heads(t):                                  # (B, L, d)→(B,h,L,hd)
            b, l, _ = t.shape
            return t.reshape(b, l, h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q) * scale, split_heads(k), split_heads(v)
        if self.fused:
            lengths = jnp.sum(valid_mask, axis=1, dtype=jnp.int32)
            if deterministic or self.dropout == 0.0:
                seed, p = jnp.int32(0), 0.0
            else:
                bits = jax.random.bits(self.make_rng('dropout'), (),
                                       jnp.uint32)
                seed = jax.lax.bitcast_convert_type(bits, jnp.int32)
                p = float(self.dropout)
            out = fused_attention(q, k, v, lengths, seed, p,
                                  _fused_interpret())
        else:
            logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                                preferred_element_type=jnp.float32)
            neg = jnp.asarray(-1e9, dtype=logits.dtype)
            logits = jnp.where(valid_mask[:, None, None, :], logits, neg)
            weights = nn.softmax(logits, axis=-1)
            weights = nn.Dropout(self.dropout, name='attn_drop')(
                weights, deterministic=deterministic)
            out = jnp.einsum('bhqk,bhkd->bhqd', weights.astype(v.dtype), v)
        b, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        out = nn.Dense(d, dtype=self.dtype, name='out_proj')(out)
        out = nn.Dropout(self.dropout, name='resid_drop')(
            out, deterministic=deterministic)
        # LayerNorm statistics stay in f32 for stability
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           name='layer_norm')(out + x)
        return out.astype(self.dtype)


class PositionWiseConvFF(nn.Module):
    """Two convs + ReLU + dropout + residual + LN + FiLM (model.py:196-235).

    With ``strict_masking`` (the default) the intermediate activation is
    re-masked between the two convs, making the block invariant to how much
    padding the batch carries — required for bucketed static shapes on TPU.
    The reference leaks conv1's bias through padded positions into the last
    valid frames (its Sequential has no interior mask), so its outputs
    depend on the batch's max length; ``strict_masking=False`` reproduces
    that bit-exactly for ragged-batch parity tests.
    """
    embed_dim: int
    conv_channels: int
    kernel_size: int
    dropout: float
    strict_masking: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, film_params, valid_mask=None, deterministic=True):
        y = ConvNorm1D(self.conv_channels, self.kernel_size,
                       dtype=self.dtype, name='conv1')(x)
        y = nn.relu(y)
        if self.strict_masking and valid_mask is not None:
            y = jnp.where(valid_mask[..., None], y, 0.0)
        y = ConvNorm1D(self.embed_dim, self.kernel_size,
                       dtype=self.dtype, name='conv2')(y)
        y = nn.Dropout(self.dropout, name='drop')(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name='layer_norm')(y + x)
        if film_params is not None:
            gammas = film_params[:, None, :self.embed_dim]   # (B, 1, d)
            betas = film_params[:, None, self.embed_dim:]    # (B, 1, d)
            y = gammas * y + betas
        return y.astype(self.dtype)


class FFTBlock(nn.Module):
    """Attention + conv feed-forward with FiLM + masking (model.py:238-259)."""
    embed_dim: int
    num_heads: int
    attn_dropout: float
    conv_channels: int
    conv_kernel: int
    conv_dropout: float
    strict_masking: bool = True
    dtype: Any = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, film_params, valid_mask, deterministic=True):
        y = MultiHeadSelfAttention(
            self.embed_dim, self.num_heads, self.attn_dropout,
            dtype=self.dtype, fused=self.fused_attention,
            name='attention')(x, valid_mask, deterministic)
        y = jnp.where(valid_mask[..., None], y, 0.0)
        y = PositionWiseConvFF(
            self.embed_dim, self.conv_channels, self.conv_kernel,
            self.conv_dropout, strict_masking=self.strict_masking,
            dtype=self.dtype,
            name='feed_forward')(y, film_params, valid_mask, deterministic)
        y = jnp.where(valid_mask[..., None], y, 0.0)
        return y
