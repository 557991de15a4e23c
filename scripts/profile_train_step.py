"""Ablation profiler for the jitted train step (real TPU).

bench_train_step.py fetches a scalar per iteration, charging the ~25 ms
axon tunnel round-trip to every step. Here steps are chained device-side
(params of step i feed step i+1) and synchronized ONCE at the end, which
is how a real training loop behaves — metrics are fetched every N iters.

Ablations (flags): --dtype, --fwd-only, --no-accent (external accent emb
skips the accent-encoder stack), --frames, --batch, --accum.

Usage: python scripts/profile_train_step.py [--steps 10] [--dtype bfloat16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--accum', type=int, default=1)
    ap.add_argument('--symbols', type=int, default=128)
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--fwd-only', action='store_true',
                    help='loss only, no grad/optimizer')
    ap.add_argument('--no-accent', action='store_true',
                    help='feed a fixed accent embedding (skips the '
                         'accent-encoder FFT stack)')
    ap.add_argument('--no-dropout', action='store_true',
                    help='deterministic forward (isolates dropout-RNG cost)')
    ap.add_argument('--no-attn-dropout', action='store_true',
                    help='zero attention-weight dropout rate (the (B,h,T,T) '
                         'masks are most of the RNG draws)')
    ap.add_argument('--mesh', action='store_true',
                    help='jit with mesh in_shardings (the production path)')
    ap.add_argument('--fused-attn', type=int, default=0, choices=(0, 1),
                    help='1: pallas whole-row attention kernel')
    ap.add_argument('--rng-impl', default=None,
                    help="jax_default_prng_impl (e.g. 'rbg')")
    args = ap.parse_args()

    if args.rng_impl:
        import jax
        jax.config.update('jax_default_prng_impl', args.rng_impl)

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _full_size_model, _make_batch
    from daft_exprt_tpu.loss import compute_loss, loss_cfg_from_hparams
    from daft_exprt_tpu.parallel.train_step import (
        MODEL_INPUT_KEYS, make_optimizer, make_train_step)

    hp, model = _full_size_model(fused_attention=bool(args.fused_attn))
    hp.compute_dtype = args.dtype
    if args.no_attn_dropout:
        for cfg_name in ('phoneme_encoder', 'accent_encoder', 'frame_decoder'):
            getattr(hp, cfg_name)['attn_dropout'] = 0.0
    from daft_exprt_tpu.models.daft_exprt import DaftExprt
    model = DaftExprt.from_hparams(hp)

    B = args.batch * args.accum
    batch = _make_batch(hp, B, args.symbols, args.frames)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           **{k: v[:1] for k, v in batch.items()})
    params = variables['params']
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    cfg = loss_cfg_from_hparams(hp)
    raw = {'frames_energy': batch['frames_energy'],
           'frames_pitch': batch['frames_pitch']}

    accent_emb = None
    if args.no_accent:
        accent_emb = jnp.zeros((B, model.hidden_dim), jnp.float32)

    det = args.no_dropout

    if args.fwd_only:
        @jax.jit
        def step(params, opt_state, b, r, it, rng):
            inputs = {k: b[k] for k in MODEL_INPUT_KEYS}
            out = model.apply({'params': params}, deterministic=det,
                              rngs={'dropout': rng},
                              external_accent_emb=accent_emb, **inputs)
            targets = {
                'mel_specs': b['mel_specs'],
                'output_lengths': b['output_lengths'],
                'speaker_ids': b['speaker_ids'],
                'frames_energy_raw': r['frames_energy'],
                'frames_pitch_raw': r['frames_pitch'],
            }
            loss, _ = compute_loss(out, targets, it, cfg, None)
            return params, opt_state, {'loss': loss}
    elif args.no_accent or args.no_dropout:
        # inline step with external accent emb / deterministic forward
        # (make_train_step doesn't expose these — profiler-only path)
        def loss_fn(params, b, r, it, rng):
            inputs = {k: b[k] for k in MODEL_INPUT_KEYS}
            out = model.apply({'params': params}, deterministic=det,
                              rngs={'dropout': rng},
                              external_accent_emb=accent_emb, **inputs)
            targets = {
                'mel_specs': b['mel_specs'],
                'output_lengths': b['output_lengths'],
                'speaker_ids': b['speaker_ids'],
                'frames_energy_raw': r['frames_energy'],
                'frames_pitch_raw': r['frames_pitch'],
            }
            return compute_loss(out, targets, it, cfg, None)

        import optax

        @jax.jit
        def step(params, opt_state, b, r, it, rng):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, b, r, it, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {'loss': loss}
    else:
        mesh = None
        if args.mesh:
            from daft_exprt_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
        step = make_train_step(model, tx, cfg, None, mesh=mesh,
                               accumulation_steps=args.accum, donate=False)

    key = jax.random.PRNGKey(0)
    # device-resident inputs
    batch = jax.device_put(batch)
    raw = jax.device_put(raw)

    # compile + full sync
    p, o, m = step(params, opt_state, batch, raw, np.float32(0), key)
    print(f'compiled; loss={float(m["loss"]):.4f}', flush=True)

    # chained timing: steps serialize on the params dependency; one fetch.
    # 3 repetitions — the axon tunnel's first timed loop in a process can
    # carry ~100 ms/call of warm-up noise; report all, trust the last.
    reps = []
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(args.steps):
            p, o, m = step(p, o, batch, raw, np.float32(i + 1), key)
        final = float(m['loss'])
        reps.append((time.perf_counter() - t0) / args.steps)
    per = reps[-1]
    elapsed = per * args.steps
    print(f'reps s/it: {[round(r, 4) for r in reps]}', flush=True)
    print(f'dtype={args.dtype} fwd_only={args.fwd_only} '
          f'no_accent={args.no_accent} no_dropout={args.no_dropout} rng={args.rng_impl} B={B} L={args.symbols} '
          f'T={args.frames} accum={args.accum}', flush=True)
    print(f's/it={per:.4f} ({elapsed:.3f}s / {args.steps} steps) '
          f'utt/s={B / per:.1f} loss={final:.4f}', flush=True)


if __name__ == '__main__':
    main()
