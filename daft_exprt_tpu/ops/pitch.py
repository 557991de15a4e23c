"""On-device pitch tracking (JAX): NCCF + Viterbi voicing decision.

TPU-native replacement for the reference's per-utterance REAPER subprocess
(reference: src/daft_exprt/extract_features.py:237-284; binary protocol:
int16 WAV in → per-sample int16 F0 in Hz, -1 for unvoiced). Algorithm is the
RAPT/REAPER family: normalized cross-correlation over the candidate lag
range [sr/max_f0, sr/min_f0] computed as batched dot products (MXU), then a
dense Viterbi pass over (lags + unvoiced) states with log-pitch-ratio
transition costs and the ``uv_cost`` voicing penalty, via lax.scan.

Output protocol matches the binary: per-sample F0 (frame values held for
f0_interval), so the downstream decimation/log pipeline is shared.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _highpass_fir(sr, cutoff=80.0, numtaps=255):
    """FIR highpass (windowed sinc) — rumble removal like REAPER's."""
    t = np.arange(numtaps) - (numtaps - 1) / 2
    fc = cutoff / (sr / 2)
    lp = np.sinc(fc * t) * fc
    win = np.hamming(numtaps)
    lp = lp * win
    lp /= lp.sum()
    hp = -lp
    hp[(numtaps - 1) // 2] += 1.0
    return hp.astype(np.float32)


@functools.partial(jax.jit, static_argnames=(
    'frame_step', 'win', 'min_lag', 'max_lag', 'n_frames'))
def _nccf(x, frame_step, win, min_lag, max_lag, n_frames):
    """Normalized cross-correlation per frame and lag.

    x: (N,) highpassed signal. Returns (n_frames, n_lags) in [-1, 1].
    """
    lags = jnp.arange(min_lag, max_lag + 1)
    starts = jnp.arange(n_frames) * frame_step

    idx = starts[:, None] + jnp.arange(win)[None, :]          # (F, win)
    frames0 = x[idx]                                          # (F, win)
    e0 = jnp.sum(frames0 * frames0, axis=1)                   # (F,)

    def corr_for_lag(lag):
        shifted = x[idx + lag]                                # (F, win)
        num = jnp.sum(frames0 * shifted, axis=1)
        e1 = jnp.sum(shifted * shifted, axis=1)
        return num / jnp.sqrt(e0 * e1 + 1e-9)

    ncc = jax.vmap(corr_for_lag, out_axes=1)(lags)            # (F, n_lags)
    return ncc


@functools.partial(jax.jit, static_argnames=('n_lags',))
def _viterbi(ncc, trans_cost, uv_cost, n_lags):
    """Dense Viterbi over (n_lags + 1) states; state n_lags = unvoiced.

    ncc: (F, n_lags) candidate scores. trans_cost: (n_lags, n_lags)
    log-pitch-ratio costs. Returns best state sequence (F,).
    """
    F = ncc.shape[0]
    # local cost: voiced state s: 1 - ncc[s] + octave penalty; uv: uv_cost.
    # The small log-lag penalty breaks subharmonic ties toward the shorter
    # period (RAPT's doubling cost).
    local = jnp.concatenate(
        [1.0 - ncc, jnp.full((F, 1), uv_cost)], axis=1)       # (F, S)

    # transition: voiced→voiced = trans_cost; voiced↔unvoiced = uv switch
    S = n_lags + 1
    tc = jnp.full((S, S), 0.0)
    tc = tc.at[:n_lags, :n_lags].set(trans_cost)
    switch = jnp.asarray(uv_cost, dtype=ncc.dtype)
    tc = tc.at[n_lags, :n_lags].set(switch)
    tc = tc.at[:n_lags, n_lags].set(switch)

    def step(carry, local_t):
        prev_cost = carry
        total = prev_cost[:, None] + tc                       # (S, S)
        best_prev = jnp.argmin(total, axis=0)                 # (S,)
        cost = jnp.min(total, axis=0) + local_t
        return cost, best_prev

    init = local[0]
    final_cost, backptrs = jax.lax.scan(step, init, local[1:])

    last = jnp.argmin(final_cost)

    def backtrack(carry, bp):
        state = carry
        prev = bp[state]
        return prev, state

    _, states_rev = jax.lax.scan(backtrack, last, backptrs, reverse=True)
    states = jnp.concatenate([states_rev, last[None]])
    return states


class PitchTracker:
    """Reusable on-device pitch tracker with REAPER-compatible parameters."""

    def __init__(self, hparams, sr=None):
        self.sr = sr or hparams.sampling_rate
        self.min_f0 = hparams.min_f0
        self.max_f0 = hparams.max_f0
        self.f0_interval = hparams.f0_interval
        self.uv_cost = hparams.uv_cost
        self.frame_step = max(1, int(round(self.f0_interval * self.sr)))
        self.min_lag = max(2, int(self.sr / self.max_f0))
        self.max_lag = int(np.ceil(self.sr / self.min_f0))
        self.win = int(0.0075 * self.sr)            # 7.5 ms correlation window
        self.hp = jnp.asarray(_highpass_fir(self.sr))
        # voiced→voiced transition cost: |log(lag1/lag2)| octave-jump penalty
        lags = np.arange(self.min_lag, self.max_lag + 1, dtype=np.float64)
        self.trans_cost = jnp.asarray(
            np.abs(np.log(lags[:, None] / lags[None, :])), dtype=jnp.float32)
        self.n_lags = self.max_lag - self.min_lag + 1
        # RAPT-style doubling cost: bias candidate scores toward shorter
        # periods so exact subharmonics (octave errors) lose ties
        self.octave_cost = jnp.asarray(
            0.02 * np.log2(lags / self.min_lag), dtype=jnp.float32)

    def frame_f0(self, wav):
        """wav: (N,) float32 → (n_frames,) F0 Hz (0 = unvoiced), one value
        per f0_interval."""
        wav = jnp.asarray(wav, dtype=jnp.float32)
        x = jnp.convolve(wav, self.hp, mode='same')
        pad_needed = self.win + self.max_lag + 1
        n_frames = max(1, int(len(wav) // self.frame_step))
        total = (n_frames - 1) * self.frame_step + pad_needed
        if total > x.shape[0]:
            x = jnp.pad(x, (0, total - x.shape[0]))
        ncc = _nccf(x, self.frame_step, self.win, self.min_lag, self.max_lag,
                    n_frames)
        ncc = ncc - self.octave_cost[None, :]
        states = _viterbi(ncc, self.trans_cost,
                          jnp.float32(self.uv_cost), self.n_lags)
        lags = jnp.arange(self.min_lag, self.max_lag + 1)
        f0 = jnp.where(states < self.n_lags,
                       self.sr / lags[jnp.clip(states, 0, self.n_lags - 1)],
                       0.0)
        return np.asarray(f0)

    def per_sample_f0(self, wav):
        """Binary-protocol output: per-sample int-valued F0 in Hz, -1 when
        unvoiced, length == len(wav)."""
        f0 = self.frame_f0(wav)
        per_sample = np.repeat(f0, self.frame_step)[:len(wav)]
        if len(per_sample) < len(wav):
            per_sample = np.pad(per_sample, (0, len(wav) - len(per_sample)),
                                mode='edge')
        out = np.where(per_sample > 0, np.rint(per_sample), -1.0)
        return out.astype(np.int16)
