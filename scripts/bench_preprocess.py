"""On-device preprocessing throughput: mel + energy + pitch, batch on TPU.

BASELINE config #2 pairs batch synthesis with on-device mel/pitch/energy
feature extraction (the reference does all three on CPU: librosa mel at
extract_features.py:345-379, L2-norm energy at :314-319, and a REAPER
subprocess per utterance at :237-284). This measures our jitted batch
pipeline in audio-seconds processed per wall-second.

Usage: python scripts/bench_preprocess.py [--batch 32] [--seconds 11.9]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--seconds', type=float, default=11.9)
    ap.add_argument('--runs', type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.hparams import HyperParams
    from daft_exprt_tpu.ops.mel import MelExtractor, frame_energy
    from daft_exprt_tpu.ops.pitch import PitchTracker

    hp = HyperParams(verbose=False, training_files='x', validation_files='x',
                     output_directory='/tmp/bench_pre', language='english',
                     speakers=['s'])
    sr = hp.sampling_rate
    B = args.batch
    N = int(args.seconds * sr)
    rng = np.random.RandomState(0)
    t = np.arange(N) / sr
    f0s = rng.uniform(100, 300, size=(B, 1))
    wavs = (0.3 * np.sin(2 * np.pi * f0s * t[None, :])
            + 0.02 * rng.randn(B, N)).astype(np.float32)

    mel_ex = MelExtractor(hp)
    tracker = PitchTracker(hp)
    print(f'device={jax.devices()[0]} B={B} N={N} '
          f'({args.seconds:.1f}s each)', flush=True)

    from daft_exprt_tpu.ops.mel import _mel_core
    mel_fb_t = jnp.asarray(mel_ex.mel_fb_t)
    n_frames = max(1, int(N // tracker.frame_step))

    @jax.jit
    def fused(w):
        # one program: STFT-mel + energy + NCCF/Viterbi pitch for the batch
        wp = jnp.pad(w, ((0, 0), (mel_ex.pad, mel_ex.pad)), mode='reflect')
        total = wp.shape[1]
        bucketed = -(-total // mel_ex.bucket) * mel_ex.bucket
        wp = jnp.pad(wp, ((0, 0), (0, bucketed - total)))
        mel = jax.vmap(lambda a: _mel_core(
            a, mel_ex.basis_r, mel_ex.basis_i, mel_fb_t, mel_ex.n_fft,
            mel_ex.hop, mel_ex.min_clipping))(wp)
        nrg = frame_energy(jnp.transpose(mel, (0, 2, 1)))
        x, _, ms = tracker._prepare(w)
        f0 = jax.vmap(lambda xi, mi: tracker._pipeline(xi, n_frames, mi))(
            x, ms)
        return jnp.sum(mel) + jnp.sum(nrg) + jnp.sum(f0)

    w_dev = jnp.asarray(wavs)
    float(jnp.sum(w_dev))                     # compile the sync program
    t0 = time.perf_counter()
    w_dev = jnp.asarray(wavs + np.float32(1e-7))
    float(jnp.sum(w_dev))
    upload_s = time.perf_counter() - t0

    float(fused(w_dev))                       # compile
    ts = []
    for i in range(args.runs):
        w = w_dev + np.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(fused(w))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    audio_s = B * args.seconds
    print(f'mel+energy+pitch (device-resident): best={best*1e3:.1f} ms '
          f'{audio_s/best:.0f} audio-s/s '
          f'all={[round(x*1e3, 1) for x in ts]}', flush=True)
    print(f'# one-time H2D upload of {wavs.nbytes/1e6:.0f} MB audio: '
          f'{upload_s*1e3:.0f} ms (axon tunnel; on-host TPU this is '
          f'PCIe/DMA)', flush=True)


if __name__ == '__main__':
    main()
