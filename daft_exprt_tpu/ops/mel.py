"""On-device mel-spectrogram extraction.

TPU-first design: the STFT is expressed as two dense matmuls against a
precomputed windowed DFT basis (real/imag), followed by a mel-filterbank
matmul — all three land on the MXU and fuse with the surrounding elementwise
ops under XLA. This replaces the torch.stft + librosa path of the reference
(reference: src/daft_exprt/extract_features.py:345-379) with identical
numerics: manual reflect padding of (n_fft - hop)/2 on both sides
(center=False semantics), periodic Hann window, amplitude = sqrt(re^2 + im^2
+ 1e-9), mel projection, log-clamp at min_clipping.

The mel filterbank reproduces librosa's default (Slaney mel scale, Slaney
area normalization) from the published formula — no librosa dependency.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

_MEL_HIGH_FREQ_Q = np.log(6.4) / 27.0
_MEL_BREAK_HZ = 1000.0
_MEL_FSP = 200.0 / 3.0


def _hz_to_mel(freq):
    freq = np.asarray(freq, dtype=np.float64)
    mel = freq / _MEL_FSP
    log_region = freq >= _MEL_BREAK_HZ
    mel = np.where(
        log_region,
        _MEL_BREAK_HZ / _MEL_FSP + np.log(np.maximum(freq, 1e-10) / _MEL_BREAK_HZ) / _MEL_HIGH_FREQ_Q,
        mel,
    )
    return mel


def _mel_to_hz(mel):
    mel = np.asarray(mel, dtype=np.float64)
    freq = mel * _MEL_FSP
    log_region = mel >= _MEL_BREAK_HZ / _MEL_FSP
    freq = np.where(
        log_region,
        _MEL_BREAK_HZ * np.exp(_MEL_HIGH_FREQ_Q * (mel - _MEL_BREAK_HZ / _MEL_FSP)),
        freq,
    )
    return freq


def mel_filterbank(sr, n_fft, n_mels, fmin, fmax):
    """Slaney-style triangular mel filterbank, shape (n_mels, 1 + n_fft//2)."""
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_min, mel_max = _hz_to_mel(fmin), _hz_to_mel(fmax)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]          # (n_mels+2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_freqs)

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann_periodic(n):
    # torch.hann_window default periodic=True
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float64)


def _windowed_dft_basis(n_fft):
    """Real/imag DFT basis with the Hann window folded in, (n_fft, n_freqs)."""
    n_freqs = 1 + n_fft // 2
    t = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_freqs)[None, :].astype(np.float64)
    phase = 2.0 * np.pi * t * k / n_fft
    win = _hann_periodic(n_fft)[:, None]
    basis_r = (np.cos(phase) * win).astype(np.float32)
    basis_i = (-np.sin(phase) * win).astype(np.float32)
    return basis_r, basis_i


@functools.partial(jax.jit, static_argnames=('n_fft', 'hop', 'min_clipping'))
def _mel_core(wav_padded, basis_r, basis_i, mel_fb_t, n_fft, hop, min_clipping):
    """wav_padded: (N,) already reflect-padded; returns (T, n_mels) log-mel."""
    n = wav_padded.shape[0]
    n_frames = 1 + (n - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = wav_padded[idx]                                   # (T, n_fft)
    # full-precision matmuls: mel parity vs the reference must hold at
    # atol 1e-3 even on TPU where the MXU default is bf16 passes
    re = jnp.dot(frames, basis_r, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, basis_i, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    spec = jnp.sqrt(re * re + im * im + 1e-9)                  # (T, n_freqs)
    mel = jnp.dot(spec, mel_fb_t, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=min_clipping))


class MelExtractor:
    """Reusable on-device log-mel extractor with bounded recompiles.

    Pads each waveform up to a multiple of ``bucket_samples`` so jit caches
    stay small, computes the full padded frame grid on device, and slices the
    host-known true frame count off the result.
    """

    def __init__(self, hparams, bucket_samples=None):
        self.n_fft = hparams.filter_length
        self.hop = hparams.hop_length
        self.sr = hparams.sampling_rate
        self.min_clipping = float(hparams.min_clipping)
        self.pad = (self.n_fft - self.hop) // 2
        self.bucket = bucket_samples or self.hop * 128
        self.basis_r, self.basis_i = _windowed_dft_basis(self.n_fft)
        self.mel_fb_t = mel_filterbank(
            self.sr, self.n_fft, hparams.n_mel_channels,
            hparams.mel_fmin, hparams.mel_fmax).T

    def num_frames(self, n_samples):
        """Frame count for a waveform of ``n_samples`` (pre-padding)."""
        return 1 + (n_samples + 2 * self.pad - self.n_fft) // self.hop

    def __call__(self, wav):
        """wav: float32 array (n_samples,) in [-1, 1] → (n_mels, T) log-mel."""
        wav = jnp.asarray(wav, dtype=jnp.float32)
        n = wav.shape[0]
        true_frames = self.num_frames(n)
        padded = jnp.pad(wav, (self.pad, self.pad), mode='reflect')
        total = padded.shape[0]
        # bucket so the kernel recompiles only per bucket, not per length
        bucketed = -(-total // self.bucket) * self.bucket
        padded = jnp.pad(padded, (0, bucketed - total))
        mel = _mel_core(padded, self.basis_r, self.basis_i,
                        jnp.asarray(self.mel_fb_t), self.n_fft, self.hop,
                        self.min_clipping)
        return np.asarray(mel[:true_frames]).T        # (n_mels, T)

    def batched(self, wavs, pad_to=None):
        """Device-batched extraction for a list of variable-length waveforms.

        Each wav is reflect-padded individually on host (so its own tail is
        mirrored, not the batch zero-padding), then the whole batch runs as
        one vmapped device call. Returns (B, n_mels, T_pad) with frames
        beyond each wav's true frame count pinned to log(min_clipping).
        """
        true_frames = [self.num_frames(len(w)) for w in wavs]
        padded = [np.pad(np.asarray(w, dtype=np.float32),
                         (self.pad, self.pad), mode='reflect') for w in wavs]
        max_len = max(len(p) for p in padded)
        total = -(-max_len // self.bucket) * self.bucket
        if pad_to is not None:
            total = max(total, pad_to)
        buf = np.zeros((len(padded), total), dtype=np.float32)
        for i, p in enumerate(padded):
            buf[i, :len(p)] = p
        mel = jax.vmap(lambda w: _mel_core(
            w, self.basis_r, self.basis_i, jnp.asarray(self.mel_fb_t),
            self.n_fft, self.hop, self.min_clipping))(jnp.asarray(buf))
        valid = (jnp.arange(mel.shape[1])[None, :]
                 < jnp.asarray(true_frames)[:, None])
        mel = jnp.where(valid[..., None], mel, float(np.log(self.min_clipping)))
        return jnp.transpose(mel, (0, 2, 1))


def frame_energy(mel_spec):
    """Per-frame energy: L2 norm of the linear-scale mel bins.

    mel_spec: (n_mels, T) log-mel → (T,) energy
    (reference: src/daft_exprt/extract_features.py:314-319 computes this on
    np.exp(mel_spec)).
    """
    mel_spec = jnp.asarray(mel_spec)
    return jnp.linalg.norm(jnp.exp(mel_spec), axis=0)
