"""Vocoder-free waveform reconstruction: mel → linear → Griffin-Lim.

Capability parity with the reference (reference: src/daft_exprt/griffin_lim.py:
63-198): non-negative mel→linear inversion followed by iterative phase
reconstruction. TPU-first implementation: the mel inversion is a pinv
projection refined by multiplicative NNLS updates (batched matmuls), and the
Griffin-Lim loop runs STFT/iSTFT as framed matmuls under lax.fori_loop —
everything jit-compiles into one device program.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.ops.mel import mel_filterbank, _hann_periodic


def mel_to_linear(mel_spec, hparams, nnls_iters=30):
    """Log-mel (n_mels, T) → linear amplitude spectrogram (n_freq, T).

    pinv initialization + multiplicative-update NNLS refinement
    (|| M @ S - mel ||² with S >= 0), replacing the reference's blocked
    L-BFGS NNLS (griffin_lim.py:63-114)."""
    fb = jnp.asarray(mel_filterbank(
        hparams.sampling_rate, hparams.filter_length, hparams.n_mel_channels,
        hparams.mel_fmin, hparams.mel_fmax))                  # (n_mels, F)
    mel = jnp.exp(jnp.asarray(mel_spec))                      # amplitude mels
    init = jnp.clip(jnp.linalg.pinv(fb) @ mel, min=0.0)

    def step(_, S):
        num = fb.T @ mel
        den = fb.T @ (fb @ S) + 1e-8
        return S * (num / den)

    S = jax.lax.fori_loop(0, nnls_iters, step, init + 1e-6)
    return S


@functools.partial(jax.jit, static_argnames=('n_fft', 'hop', 'n_iters',
                                             'length'))
def _griffin_lim_core(mag, n_fft, hop, n_iters, length):
    """mag: (n_freq, T) target amplitude; returns (length,) waveform."""
    window = jnp.asarray(_hann_periodic(n_fft), dtype=jnp.float32)
    T = mag.shape[1]

    def stft(x):
        idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
        frames = x[idx] * window[None, :]
        return jnp.fft.rfft(frames, axis=1).T            # (n_freq, T)

    def istft(spec):
        frames = jnp.fft.irfft(spec.T, n=n_fft, axis=1) * window[None, :]
        x = jnp.zeros(length + n_fft, dtype=jnp.float32)
        idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
        x = x.at[idx.reshape(-1)].add(frames.reshape(-1))
        win_sq = jnp.zeros(length + n_fft, dtype=jnp.float32)
        win_sq = win_sq.at[idx.reshape(-1)].add(
            jnp.tile(window * window, (T,)))
        win_sq = win_sq[:length]
        # only normalize where the window overlap has real mass — dividing
        # by the ~t^4 tail at the edges amplifies edge noise ~1/t^3 and the
        # GL iteration feeds it back as low-frequency garbage
        return jnp.where(win_sq > 1e-2, x[:length] / jnp.maximum(win_sq, 1e-2),
                         0.0)

    def body(_, x):
        spec = stft(x)
        phase = spec / jnp.maximum(jnp.abs(spec), 1e-8)
        return istft(mag.astype(jnp.complex64) * phase)

    key = jax.random.PRNGKey(0)
    x0 = istft(mag.astype(jnp.complex64) * jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, mag.shape)))
    return jax.lax.fori_loop(0, n_iters, body, x0)


def reconstruct_signal_griffin_lim(magnitude, hparams, n_iters=60):
    """Amplitude spectrogram → waveform (reference: griffin_lim.py:117-173
    runs 500 CPU iterations; 60 jitted iterations converge comparably)."""
    n_fft, hop = hparams.filter_length, hparams.hop_length
    T = magnitude.shape[1]
    length = (T - 1) * hop + n_fft
    wav = _griffin_lim_core(jnp.asarray(magnitude, dtype=jnp.float32),
                            n_fft, hop, n_iters, length)
    wav = np.asarray(wav)
    peak = np.abs(wav).max()
    if peak > 0:
        wav = wav / peak * 0.95
    return wav


def griffin_lim_reconstruction_from_mel_spec(mel_spec, hparams, n_iters=60,
                                             nnls_iters=30):
    """Log-mel (n_mels, T) → waveform (reference: griffin_lim.py:176-198)."""
    linear = mel_to_linear(mel_spec, hparams, nnls_iters=nnls_iters)
    return reconstruct_signal_griffin_lim(np.asarray(linear), hparams,
                                          n_iters=n_iters)
