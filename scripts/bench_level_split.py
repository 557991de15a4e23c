"""Per-level vocoder attribution under the PRODUCTION routing.

`bench_vocoder --levels` times ct-kernel prefixes — not the shipped
tc/ptc chain — so its per-level numbers cannot be read as the serving
path's costs (CLAUDE.md round-2 note). This probe times the real thing:
it builds one jitted pipeline per chain prefix, returning only the
`_tap` capture at level k, and lets XLA dead-code-eliminate every later
level. prefix(k) - prefix(k-1) is then level k's cost under exactly the
bench.py config (int8-static tier by default, B=128, T=1024).

Timing methodology matches bench.py: several loops of `runs` chained
dispatches, one scalar fetch per loop, min over loops (first loop of a
fresh executable absorbs the axon server-side warmup).

Usage: python scripts/bench_level_split.py [--batch 128] [--bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--runs', type=int, default=5)
    ap.add_argument('--loops', type=int, default=3)
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 tier instead of the int8-static default')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _full_size_model, _make_batch
    from daft_exprt_tpu.models.hifigan import (
        calibrate_act_scales, generator_forward, init_generator_params)

    hp, model = _full_size_model(fused_attention=True)
    B, L, T = args.batch, 128, args.frames
    batch = _make_batch(hp, B, L, T)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           **{k: v[:1] for k, v in batch.items()})
    params = variables['params']

    def acoustic(params, b):
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

    voc_params = init_generator_params(jax.random.PRNGKey(2))
    int8 = not args.bf16
    voc_scales = None
    if int8:
        cal_batch = {k: v[:4] for k, v in batch.items()}
        mel_cal = jax.jit(acoustic)(params, cal_batch)
        voc_scales = calibrate_act_scales(voc_params, mel_cal)

    def make_prefix(k):
        # k in {-1: acoustic only, 0..3: through upsample level k,
        #       'full': whole pipeline}
        @jax.jit
        def f(params, voc_params, b):
            mel = acoustic(params, b)
            if k == -1:
                return jnp.sum(jnp.abs(mel.astype(jnp.float32)))
            vp = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), voc_params)
            taps = {}
            wav = generator_forward(
                vp, mel.astype(jnp.bfloat16), use_pallas=True,
                int8=int8, int8_act_scales=voc_scales,
                _tap=lambda i, x, cp, ct: taps.__setitem__(i, x))
            if k == 'full':
                return jnp.sum(jnp.abs(wav.astype(jnp.float32)))
            return jnp.sum(jnp.abs(taps[k].astype(jnp.float32)))
        return f

    def perturb(b, i):
        out = dict(b)
        out['spk_embs'] = b['spk_embs'] + np.float32(i * 1e-3)
        return out

    def timed(label, fn):
        best = None
        for li in range(args.loops):
            bs = [perturb(batch, li * args.runs + i + 1)
                  for i in range(args.runs)]
            start = time.perf_counter()
            accs = [fn(params, voc_params, b) for b in bs]
            total = float(sum(accs))
            elapsed = (time.perf_counter() - start) / args.runs
            assert np.isfinite(total)
            best = elapsed if best is None or elapsed < best else best
        print(f'{label}: {best * 1e3:.1f} ms/run', flush=True)
        return best

    tier = 'bf16' if args.bf16 else 'int8-static'
    print(f'# tier={tier} B={B} T={T} runs={args.runs}', flush=True)
    times = {}
    times[-1] = timed('acoustic-only', make_prefix(-1))
    for k in range(4):
        times[k] = timed(f'prefix-L{k}', make_prefix(k))
    times['full'] = timed('full-pipeline', make_prefix('full'))
    prev = -1
    for k in range(4):
        print(f'level L{k}: {(times[k] - times[prev]) * 1e3:.1f} ms',
              flush=True)
        prev = k
    print(f'post/tail residual: '
          f'{(times["full"] - times[3]) * 1e3:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
