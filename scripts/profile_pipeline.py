"""Split the synthesis pipeline time: acoustic model vs vocoder.

Same config as bench.py (B=128, T=1024, bf16 + pallas fast path) but times
each half separately so optimization effort goes where the milliseconds
are. Timing methodology matches bench.py: chained dispatch, one scalar
fetch per loop, several loops, report the min (the first loop of a fresh
executable absorbs a one-time server-side warmup on the axon platform).

Usage: python scripts/profile_pipeline.py [--batch 128] [--loops 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(label, fn, args_list, runs):
    import jax
    # warmup/compile + absorb first-loop server warmup
    best = None
    for li in range(3):
        start = time.perf_counter()
        accs = [fn(*a) for a in args_list[:runs]]
        total = float(sum(accs))
        elapsed = (time.perf_counter() - start) / runs
        assert np.isfinite(total)
        if best is None or elapsed < best:
            best = elapsed
        print(f'#   {label} loop{li}: {elapsed * 1e3:.1f} ms/run',
              file=sys.stderr)
    print(f'{label}: {best * 1e3:.1f} ms/run')
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--runs', type=int, default=5)
    ap.add_argument('--parity', action='store_true',
                    help='f32 XLA path instead of bf16+pallas')
    ap.add_argument('--int8', action='store_true',
                    help='int8-static serving tier (the bench.py default)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _full_size_model, _make_batch
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)

    parity = args.parity
    hp, model = _full_size_model(fused_attention=not parity)
    B, L, T = args.batch, 128, args.frames
    batch = _make_batch(hp, B, L, T)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           **{k: v[:1] for k, v in batch.items()})
    params = variables['params']
    voc_params = init_generator_params(jax.random.PRNGKey(2))
    voc_dtype = jnp.float32 if parity else jnp.bfloat16
    use_pallas = not parity
    voc_int8 = args.int8 and not parity
    voc_scales = None

    def acoustic_raw(params, b):
        return model.apply(
            {'params': params}, method=model.inference,
            symbols=b['symbols'], duration_preds=b['durations_float'],
            durations_int=b['durations_int'],
            energy_preds=b['symbols_energy'],
            pitch_preds=b['symbols_pitch'],
            input_lengths=b['input_lengths'],
            output_lengths=b['output_lengths'], n_frames=T,
            spk_embs=b['spk_embs'],
            accent_emb=b['spk_embs'][:, :model.hidden_dim],
            deterministic=True)['mel_preds']

    @jax.jit
    def acoustic_only(params, b):
        return jnp.sum(jnp.abs(acoustic_raw(params, b)))

    @jax.jit
    def vocoder_only(voc_params, mel):
        vp = jax.tree_util.tree_map(lambda x: x.astype(voc_dtype), voc_params)
        wav = generator_forward(vp, mel.astype(voc_dtype),
                                use_pallas=use_pallas, int8=voc_int8,
                                int8_act_scales=voc_scales)
        return jnp.sum(jnp.abs(wav.astype(jnp.float32)))

    @jax.jit
    def full(params, voc_params, b):
        mel = acoustic_raw(params, b)
        vp = jax.tree_util.tree_map(lambda x: x.astype(voc_dtype), voc_params)
        wav = generator_forward(vp, mel.astype(voc_dtype),
                                use_pallas=use_pallas, int8=voc_int8,
                                int8_act_scales=voc_scales)
        return jnp.sum(jnp.abs(wav.astype(jnp.float32)))

    def perturb(b, i):
        out = dict(b)
        out['spk_embs'] = b['spk_embs'] + np.float32(i * 1e-3)
        return out

    batches = [perturb(batch, i + 1) for i in range(args.runs)]
    # device-resident mels for the vocoder-only leg (tunnel H2D is ~2-4 MB/s)
    mel0 = jax.jit(acoustic_raw)(params, batch)
    if voc_int8:
        from daft_exprt_tpu.models.hifigan import calibrate_act_scales
        voc_scales = calibrate_act_scales(voc_params, mel0[:4])
    mels = [mel0 + jnp.float32(i * 1e-4) for i in range(args.runs)]
    for m in mels:
        m.block_until_ready()

    t_ac = timed('acoustic', acoustic_only,
                 [(params, b) for b in batches], args.runs)
    t_voc = timed('vocoder', vocoder_only,
                  [(voc_params, m) for m in mels], args.runs)
    t_full = timed('full', full,
                   [(params, voc_params, b) for b in batches], args.runs)
    nb_wav = (T - 1) * hp.hop_length + hp.filter_length
    audio_s = B * nb_wav / hp.sampling_rate
    print(f'# B={B} T={T} audio/run={audio_s:.1f}s  '
          f'acoustic {t_ac * 1e3:.1f} + vocoder {t_voc * 1e3:.1f} '
          f'= {1e3 * (t_ac + t_voc):.1f} vs full {t_full * 1e3:.1f} ms  '
          f'-> full pipeline {audio_s / t_full:.0f} audio-s/s')


if __name__ == '__main__':
    main()
