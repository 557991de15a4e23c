"""Training-step throughput benchmark (single chip or DP mesh).

The reference logs seconds/iteration during DDP training
(reference: src/daft_exprt/train.py:458-466) but publishes no numbers.
This measures our jitted train step (loss with all 5 terms + grads + Adam
update, grad accumulation via lax.scan) at the reference's full model size.

Usage: python scripts/bench_train_step.py [--batch 16] [--frames 1024]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16,
                    help='global batch (per microbatch)')
    ap.add_argument('--accum', type=int, default=1)
    ap.add_argument('--symbols', type=int, default=128)
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--runs', type=int, default=10)
    ap.add_argument('--prng', default=None,
                    help="dropout PRNG impl; default: hparams.prng_impl "
                         "('rbg' — the threefry default costs ~25 ms/it "
                         "extra in mask generation at B=16/T=1024)")
    ap.add_argument('--fused-attn', type=int, default=None, choices=(0, 1),
                    help='1: pallas whole-row attention kernel; '
                         '0: XLA path; default: hparams auto (on for TPU)')
    args = ap.parse_args()

    import jax
    from __graft_entry__ import _full_size_model, _make_batch
    from daft_exprt_tpu.loss import loss_cfg_from_hparams
    from daft_exprt_tpu.parallel.mesh import make_mesh, shard_batch
    from daft_exprt_tpu.parallel.train_step import (
        make_optimizer, make_train_step)

    hp, model = _full_size_model(
        fused_attention='auto' if args.fused_attn is None
        else bool(args.fused_attn))
    hp.batch_size = args.batch
    hp.accumulation_steps = args.accum
    B = args.batch * args.accum
    batch = _make_batch(hp, B, args.symbols, args.frames)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           **{k: v[:1] for k, v in batch.items()})
    params = variables['params']
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    step = make_train_step(model, tx, loss_cfg_from_hparams(hp), None,
                           mesh=mesh, accumulation_steps=args.accum,
                           donate=False)
    raw = {'frames_energy': batch['frames_energy'],
           'frames_pitch': batch['frames_pitch']}
    dev_batch = shard_batch(batch, mesh)
    dev_raw = shard_batch(raw, mesh)
    impl = (args.prng if args.prng is not None
            else getattr(hp, 'prng_impl', '')) or None
    base_rng = jax.random.key(hp.seed, impl=impl)
    print(f'device={jax.devices()[0]} B={B} L={args.symbols} '
          f'T={args.frames} prng={impl or "default"}', flush=True)

    # compile + full sync
    p, o, m = step(params, opt_state, dev_batch, dev_raw, np.float32(0),
                   base_rng)
    _ = float(m['loss'])

    # chained dispatch: steps serialize on the params dependency; a single
    # final fetch synchronizes (a per-step fetch would charge the ~25 ms
    # axon tunnel round-trip to every iteration — a real training loop
    # fetches metrics every log_every iterations, not every step)
    reps = []
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(args.runs):
            p, o, m = step(p, o, dev_batch, dev_raw, np.float32(i + 1),
                           base_rng)
        loss = float(m['loss'])
        reps.append((time.perf_counter() - t0) / args.runs)
    per = reps[-1]
    print(f'reps s/it: {[round(r, 4) for r in reps]}', flush=True)
    print(f's/it={per:.4f} (chained x{args.runs}) loss={loss:.3f} '
          f'utt/s={B / per:.1f}', flush=True)


if __name__ == '__main__':
    main()
