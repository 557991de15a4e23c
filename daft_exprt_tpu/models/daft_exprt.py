"""DaftExprt acoustic model — TPU-native (flax.linen, static shapes).

Re-implements the full capability of the reference model
(reference: src/daft_exprt/model.py:832-1114, using the *live* later
definitions of AccentEncoder/StyleAdapter/SpeakerClassifier at
model.py:614/719/809 per SURVEY.md §7.4):

  * PhonemeEncoder: symbol embedding + sinusoidal positions + 4 FFT blocks
    with FiLM accent conditioning (model.py:567-610)
  * AccentEncoder: energy/pitch conv embeddings + mel conv stack + 4 FFT
    blocks + length-normalized mean pool (model.py:614-716)
  * SpeakerClassifier behind a gradient-reversal layer (model.py:809-830)
  * StyleAdapter: FiLM gamma/beta prediction with L2-regularized scalar
    post-multipliers (model.py:719-806)
  * GaussianUpsampling: duration/energy/pitch projections, softplus ranges,
    Gaussian attention weights as one batched matmul (model.py:385-510)
  * FrameDecoder: positions + 4 FiLM FFT blocks + linear mel projection
    (model.py:513-564)
  * Zero-shot speaker conditioning: L2-normalized ECAPA embedding through a
    linear projection (model.py:854-856, 898-905)

TPU-first differences: everything is shape-static and mask-driven; the
per-row Python loops of the reference (positional encodings model.py:136-150,
duration quantization model.py:960-969) are replaced by table adds and
vectorized host-side quantization (frontend/duration.py); the Gaussian
upsampling probability matrix + weighted sum compile to fused MXU matmuls.
"""
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.models.modules import (
    ConvNorm1D, FFTBlock, LinearNorm, sequence_mask, sinusoidal_table,
)
from daft_exprt_tpu.ops.grl import gradient_reversal

_LOG_2PI = float(np.log(2.0 * np.pi))


@jax.custom_vjp
def _normalize_weights(probs):
    """probs / (sum_L probs + 1e-20) — bit-identical to the reference
    normalization (model.py:505), but with a hand-written backward.

    The autodiff backward of this division computes 1/(S + 1e-20)^2, which
    overflows f32 to inf at frames where no gaussian has mass (S = 0) and
    poisons every upstream gradient with 0*inf = NaN. The factored VJP
    below (dp = inv * (g - Σ g·y)) only ever uses 1/(S + 1e-20) ≤ 1e20,
    which is finite in f32.
    """
    return probs / (jnp.sum(probs, axis=1, keepdims=True) + 1e-20)


def _normalize_weights_fwd(probs):
    denom = jnp.sum(probs, axis=1, keepdims=True) + 1e-20
    y = probs / denom
    return y, (y, 1.0 / denom)


def _normalize_weights_bwd(res, g):
    y, inv = res
    return (inv * (g - jnp.sum(g * y, axis=1, keepdims=True)),)


_normalize_weights.defvjp(_normalize_weights_fwd, _normalize_weights_bwd)


def _fft_block_kwargs(cfg: Dict[str, Any], embed_dim=None, strict=True,
                      dtype=jnp.float32):
    return dict(
        embed_dim=embed_dim if embed_dim is not None else cfg['hidden_embed_dim'],
        num_heads=cfg['attn_nb_heads'],
        attn_dropout=cfg['attn_dropout'],
        conv_channels=cfg['conv_channels'],
        conv_kernel=cfg['conv_kernel'],
        conv_dropout=cfg['conv_dropout'],
        strict_masking=strict,
        dtype=dtype,
        fused_attention=cfg.get('fused_attention', False),
    )


class PhonemeEncoder(nn.Module):
    """Symbols → contextual phoneme encodings with FiLM conditioning."""
    n_symbols: int
    cfg: Dict[str, Any]
    max_len: int = 5000
    strict_masking: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, symbols, film_params, input_lengths, deterministic=True):
        d = self.cfg['hidden_embed_dim']
        x = nn.Embed(self.n_symbols, d, name='symbols_embedding')(symbols)
        pos = sinusoidal_table(max(self.max_len, symbols.shape[1]), d)[:symbols.shape[1]]
        mask = sequence_mask(input_lengths, symbols.shape[1])
        x = jnp.where(mask[..., None], x + pos[None], 0.0)
        for idx in range(self.cfg['nb_blocks']):
            fp = film_params[:, idx, :] if film_params is not None else None
            x = FFTBlock(**_fft_block_kwargs(self.cfg, strict=self.strict_masking,
                                             dtype=self.dtype),
                         name=f'block_{idx}')(x, fp, mask, deterministic)
        return x


class AccentEncoder(nn.Module):
    """Reference mel + frame prosody → global accent embedding."""
    n_mel_channels: int
    cfg: Dict[str, Any]
    max_len: int = 5000
    strict_masking: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames_energy, frames_pitch, mel_specs, output_lengths,
                 deterministic=True):
        d = self.cfg['hidden_embed_dim']
        cc = self.cfg['conv_channels']
        k = self.cfg['conv_kernel']
        drop = self.cfg['conv_dropout']
        T = mel_specs.shape[-1]

        pos = sinusoidal_table(max(self.max_len, T), d)[:T]
        energy = ConvNorm1D(d, k, name='energy_embedding')(
            frames_energy[..., None])
        pitch = ConvNorm1D(d, k, name='pitch_embedding')(
            frames_pitch[..., None])

        mask = sequence_mask(output_lengths, T)
        x = jnp.swapaxes(mel_specs, 1, 2)                       # (B, T, n_mels)
        for i, feat in enumerate([cc, cc, d]):
            if self.strict_masking and i > 0:
                # padding-invariance: zero bias leakage between conv groups
                x = jnp.where(mask[..., None], x, 0.0)
            x = ConvNorm1D(feat, k, dtype=self.dtype, name=f'conv_{i}')(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f'ln_{i}')(x).astype(self.dtype)
            x = nn.Dropout(drop, name=f'drop_{i}')(x, deterministic=deterministic)

        x = jnp.where(mask[..., None], x + energy + pitch + pos[None], 0.0)
        x = x.astype(self.dtype)
        for idx in range(self.cfg['nb_blocks']):
            x = FFTBlock(**_fft_block_kwargs(self.cfg, strict=self.strict_masking,
                                             dtype=self.dtype),
                         name=f'block_{idx}')(x, None, mask, deterministic)
        # length-normalized mean pool over valid frames (f32 accumulation)
        x32 = x.astype(jnp.float32)
        return jnp.sum(x32, axis=1) / output_lengths[:, None].astype(jnp.float32)


class SpeakerClassifier(nn.Module):
    """3-layer MLP behind gradient reversal (adversarial disentanglement)."""
    n_speakers: int
    embed_dim: int
    lambda_reversal: float = 1.0

    @nn.compact
    def __call__(self, x):
        x = gradient_reversal(x, self.lambda_reversal)
        x = nn.relu(LinearNorm(self.embed_dim, name='fc1')(x))
        x = nn.relu(LinearNorm(self.embed_dim, name='fc2')(x))
        return LinearNorm(self.n_speakers, name='fc3')(x)


class StyleAdapter(nn.Module):
    """Style embedding → FiLM (gamma, beta) parameters per module block."""
    input_dim: int
    module_params: Dict[str, Any]   # {module: (nb_blocks, channels)}
    post_mult_weight: float

    @nn.compact
    def __call__(self, style_embedding):
        nb_tot = sum(b * c for b, c in self.module_params.values())
        gammas = LinearNorm(nb_tot, name='gammas_predictor')(style_embedding)
        betas = LinearNorm(nb_tot, name='betas_predictor')(style_embedding)

        if self.post_mult_weight != 0.0:
            nb_post = sum(b for b, _ in self.module_params.values())
            post = self.param('post_multipliers',
                              nn.initializers.xavier_uniform(), (2, nb_post))
        else:
            post = None

        film, col, blk = {}, 0, 0
        for name, (nb_blocks, channels) in self.module_params.items():
            n = nb_blocks * channels
            g = gammas[:, col:col + n].reshape(-1, nb_blocks, channels)
            b = betas[:, col:col + n].reshape(-1, nb_blocks, channels)
            if post is not None:
                g_post = post[0, blk:blk + nb_blocks][None, :, None]
                b_post = post[1, blk:blk + nb_blocks][None, :, None]
            else:
                g_post = b_post = 1.0
            g = g_post * g + 1.0
            b = b_post * b
            film[name] = jnp.concatenate([g, b], axis=2)   # (B, nb_blocks, 2c)
            blk += nb_blocks
            col += n
        return film, post


class GaussianUpsampling(nn.Module):
    """Symbol encodings → frame-rate sequence via Gaussian attention.

    The (B, L, T) probability matrix and the weighted sum are one fused
    batched matmul on the MXU; computations stay in float32 for the
    exp/log-prob path regardless of the model compute dtype
    (SURVEY.md §7.3 bf16-vs-f32 note).
    """
    embed_dim: int
    conv_kernel: int
    use_concatenation: bool = False

    @nn.compact
    def __call__(self, x, durations_float, durations_int, energies, pitch,
                 input_lengths, n_frames, film_params=None):
        d = self.embed_dim
        durs = ConvNorm1D(d, self.conv_kernel, name='duration_projection')(
            durations_float[..., None])
        nrg = ConvNorm1D(d, self.conv_kernel, name='energy_projection')(
            energies[..., None])
        f0 = ConvNorm1D(d, self.conv_kernel, name='pitch_projection')(
            pitch[..., None])

        if film_params is not None:
            def film(t, fp):
                gamma, beta = fp[:, None, :d], fp[:, None, d:]
                return nn.relu(gamma * t + beta)
            durs = film(durs, film_params[:, 0, :])
            nrg = film(nrg, film_params[:, 1, :])
            f0 = film(f0, film_params[:, 2, :])

        if self.use_concatenation:
            # reference quirk kept for checkpoint parity: in concatenation
            # mode the upsampled stream is the *raw* phoneme encoding
            # (reference: src/daft_exprt/model.py:466-472,507)
            x_summed = x + nrg + f0
            x_up_in = x
        else:
            x = x + nrg + f0
            x_summed = x
            x_up_in = x

        ranges = LinearNorm(1, name='range_projection')(x_summed + durs)
        ranges = nn.softplus(ranges)[..., 0]                       # (B, L)
        mask = sequence_mask(input_lengths, x.shape[1])            # (B, L)
        ranges = jnp.where(mask, ranges, 1.0)
        stds = jnp.clip(ranges.astype(jnp.float32), min=1e-3)

        dur_i = durations_int.astype(jnp.float32)
        cums = jnp.cumsum(dur_i, axis=1)
        means = dur_i / 2.0 + jnp.pad(cums[:, :-1], ((0, 0), (1, 0)))
        means = jnp.nan_to_num(means, nan=0.0, posinf=1e6, neginf=-1e6)
        stds = jnp.clip(jnp.nan_to_num(stds, nan=1.0, posinf=1e6, neginf=1e-3),
                        min=1e-3)

        t = jnp.arange(n_frames, dtype=jnp.float32) + 0.5          # (T,)
        z = (t[None, None, :] - means[..., None]) / stds[..., None]
        log_prob = -0.5 * z * z - jnp.log(stds)[..., None] - 0.5 * _LOG_2PI
        probs = jnp.exp(log_prob)                                  # (B, L, T)
        probs = jnp.where(mask[..., None], probs, 0.0)
        weights = _normalize_weights(probs)
        x_upsamp = jnp.einsum('blt,bld->btd', weights,
                              x_up_in.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        return x_upsamp.astype(x.dtype), weights


class FrameDecoder(nn.Module):
    """Frame-rate sequence → mel-spectrogram with FiLM conditioning."""
    n_mel_channels: int
    cfg: Dict[str, Any]
    embed_dim: int
    max_len: int = 5000
    strict_masking: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, film_params, output_lengths, deterministic=True):
        T = x.shape[1]
        pos = sinusoidal_table(max(self.max_len, T), self.embed_dim)[:T]
        mask = sequence_mask(output_lengths, T)
        x = jnp.where(mask[..., None], x + pos[None], 0.0).astype(self.dtype)
        for idx in range(self.cfg['nb_blocks']):
            x = FFTBlock(**_fft_block_kwargs(self.cfg, self.embed_dim,
                                             strict=self.strict_masking,
                                             dtype=self.dtype),
                         name=f'block_{idx}')(
                x, film_params[:, idx, :] if film_params is not None else None,
                mask, deterministic)
        mel = LinearNorm(self.n_mel_channels, name='projection')(
            x.astype(jnp.float32))
        mel = jnp.where(mask[..., None], mel, 0.0)
        return jnp.swapaxes(mel, 1, 2)                  # (B, n_mels, T)


class DaftExprt(nn.Module):
    """Full acoustic model. Construct with ``DaftExprt.from_hparams(hp)``."""
    n_symbols: int
    n_speakers: int
    n_mel_channels: int
    phoneme_encoder_cfg: Dict[str, Any]
    accent_encoder_cfg: Dict[str, Any]
    frame_decoder_cfg: Dict[str, Any]
    gum_conv_kernel: int = 3
    gum_use_concatenation: bool = False
    external_emb_dim: int = 192
    lambda_reversal: float = 1.0
    post_mult_weight: float = 1e-3
    frame_decoder_input_dim: Optional[int] = None
    # padding-invariant masking (True) vs reference bit-behavior on ragged
    # batches (False); see modules.PositionWiseConvFF docstring
    strict_masking: bool = True
    # activation dtype for the FFT-block stacks ('bfloat16' roughly doubles
    # MXU throughput; norms/softmax/gaussian/projections stay f32). Params
    # are always f32.
    compute_dtype: str = 'float32'

    @classmethod
    def from_hparams(cls, hp):
        gum = dict(hp.gaussian_upsampling_module)
        fused = getattr(hp, 'fused_attention', 'auto')
        if fused == 'auto':
            from daft_exprt_tpu.models.modules import fused_attention_available
            fused = fused_attention_available()
        enc_cfg, acc_cfg, dec_cfg = (dict(hp.phoneme_encoder),
                                     dict(hp.accent_encoder),
                                     dict(hp.frame_decoder))
        for cfg in (enc_cfg, acc_cfg, dec_cfg):
            cfg['fused_attention'] = bool(fused)
        return cls(
            compute_dtype=getattr(hp, 'compute_dtype', 'float32'),
            n_symbols=hp.n_symbols,
            n_speakers=hp.n_speakers,
            n_mel_channels=hp.n_mel_channels,
            phoneme_encoder_cfg=enc_cfg,
            accent_encoder_cfg=acc_cfg,
            frame_decoder_cfg=dec_cfg,
            gum_conv_kernel=gum.get('conv_kernel', 3),
            gum_use_concatenation=gum.get('use_concatenation', False),
            external_emb_dim=getattr(hp, 'external_emb_dim', 192),
            lambda_reversal=getattr(hp, 'lambda_reversal', 1.0),
            post_mult_weight=getattr(hp, 'post_mult_weight', 1e-3),
            frame_decoder_input_dim=getattr(hp, 'frame_decoder_input_dim', None),
        )

    @property
    def hidden_dim(self):
        return self.phoneme_encoder_cfg['hidden_embed_dim']

    def setup(self):
        d = self.hidden_dim
        dec_dim = self.frame_decoder_input_dim or d
        dtype = jnp.bfloat16 if self.compute_dtype == 'bfloat16' \
            else jnp.float32
        self.accent_encoder = AccentEncoder(self.n_mel_channels,
                                            self.accent_encoder_cfg,
                                            strict_masking=self.strict_masking,
                                            dtype=dtype)
        self.speaker_classifier = SpeakerClassifier(
            self.n_speakers, d, self.lambda_reversal)
        self.style_adapter = StyleAdapter(
            input_dim=self.accent_encoder_cfg['hidden_embed_dim'],
            module_params={
                'phoneme_encoder': (self.phoneme_encoder_cfg['nb_blocks'], d),
                'frame_decoder': (self.frame_decoder_cfg['nb_blocks'], d),
            },
            post_mult_weight=self.post_mult_weight)
        self.phoneme_encoder = PhonemeEncoder(self.n_symbols,
                                              self.phoneme_encoder_cfg,
                                              strict_masking=self.strict_masking,
                                              dtype=dtype)
        self.gaussian_upsampling = GaussianUpsampling(
            d, self.gum_conv_kernel, self.gum_use_concatenation)
        self.frame_decoder = FrameDecoder(
            self.n_mel_channels, self.frame_decoder_cfg, dec_dim,
            strict_masking=self.strict_masking, dtype=dtype)
        self.spk_projection = LinearNorm(d)

    # ------------------------------------------------------------------
    def _speaker_embedding(self, spk_embs):
        norm = jnp.linalg.norm(spk_embs, axis=-1, keepdims=True)
        normalized = spk_embs / jnp.maximum(norm, 1e-12)
        return self.spk_projection(normalized)

    def encode_accent(self, frames_energy, frames_pitch, mel_specs,
                      output_lengths, deterministic=True):
        """Expose the accent embedding (used by synthesis --accent_emb dirs)."""
        return self.accent_encoder(frames_energy, frames_pitch, mel_specs,
                                   output_lengths, deterministic)

    def __call__(self, symbols, durations_float, durations_int, symbols_energy,
                 symbols_pitch, input_lengths, frames_energy, frames_pitch,
                 mel_specs, output_lengths, speaker_ids, spk_embs,
                 deterministic=True, external_accent_emb=None,
                 external_spk_emb=None):
        """Training-style forward (reference: model.py:889-948)."""
        if external_spk_emb is not None:
            spk_emb = external_spk_emb
        else:
            spk_emb = self._speaker_embedding(spk_embs)

        if external_accent_emb is not None:
            accent_emb = external_accent_emb
        else:
            accent_emb = self.accent_encoder(
                frames_energy, frames_pitch, mel_specs, output_lengths,
                deterministic)

        speaker_preds = self.speaker_classifier(accent_emb)
        film, post_multipliers = self.style_adapter(accent_emb + spk_emb)

        enc = self.phoneme_encoder(symbols, film['phoneme_encoder'],
                                   input_lengths, deterministic)
        n_frames = mel_specs.shape[-1]
        x, weights = self.gaussian_upsampling(
            enc, durations_float, durations_int, symbols_energy, symbols_pitch,
            input_lengths, n_frames, film_params=None)
        mel_preds = self.frame_decoder(x, film['frame_decoder'],
                                       output_lengths, deterministic)
        return {
            'speaker_preds': speaker_preds,
            'post_multipliers': post_multipliers,
            'film_frame_decoder': film['frame_decoder'],
            'mel_preds': mel_preds,
            'alignments': weights,
            'accent_emb': accent_emb,
        }

    def inference(self, symbols, duration_preds, durations_int, energy_preds,
                  pitch_preds, input_lengths, output_lengths, n_frames,
                  spk_embs=None, accent_emb=None, spk_emb_projected=None,
                  deterministic=True):
        """Synthesis forward with externally supplied symbol prosody.

        Factor application, duration re-quantization and pitch transforms are
        host-side (see generate.py) to keep this function shape-static
        (reference: model.py:1026-1114 does them inline with Python loops).
        """
        if spk_emb_projected is not None:
            spk_emb = spk_emb_projected
        else:
            spk_emb = self._speaker_embedding(spk_embs)
        if accent_emb is None:
            raise ValueError('accent_emb is required for synthesis')

        film, _ = self.style_adapter(accent_emb + spk_emb)
        enc = self.phoneme_encoder(symbols, film['phoneme_encoder'],
                                   input_lengths, deterministic)
        x, weights = self.gaussian_upsampling(
            enc, duration_preds, durations_int, energy_preds, pitch_preds,
            input_lengths, n_frames, film_params=None)
        mel_preds = self.frame_decoder(x, film['frame_decoder'],
                                       output_lengths, deterministic)
        return {'mel_preds': mel_preds, 'alignments': weights}
