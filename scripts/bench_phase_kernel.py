"""Microbenchmark: phase-major banded MRF kernel vs channels-in-sublanes
kernel on the L3 (C=32) tail level, plus the to/from_phase relayout cost.

Usage: python scripts/bench_phase_kernel.py [--batch 8] [--T 262144]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, runs=3, warmup=1, reps=8):
    """Dispatch ``reps`` calls back-to-back and fetch once per timed loop:
    a per-call fetch would charge the ~25 ms tunnel round trip to every
    rep (the round-3 per-level numbers were read with that bias —
    CLAUDE.md)."""
    for _ in range(warmup):
        float(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        for _ in range(reps):
            v = fn(*args)
        float(v)
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--T', type=int, default=262144)
    ap.add_argument('--C', type=int, default=32)
    ap.add_argument('--runs', type=int, default=3)
    ap.add_argument('--tile', type=int, default=8192,
                    help='ct-kernel tile (time samples)')
    ap.add_argument('--ptile', type=int, default=4096,
                    help='phase-kernel tile (phase columns)')
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        from_phase, fused_mrf_ct, fused_mrf_phase, pack_mrf_phase_weights,
        pack_mrf_weights, to_phase)

    print(f'device={jax.devices()[0]}', flush=True)
    B, C, T = args.batch, args.C, args.T
    p = 128 // C
    dt = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    ks = (3, 7, 11)
    dils = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    rng = np.random.RandomState(0)
    params = {}
    for j, (k, d) in enumerate(zip(ks, dils)):
        rb = {}
        for i in range(len(d)):
            for pre in ('convs1', 'convs2'):
                rb[f'{pre}_{i}'] = {
                    'w': jnp.asarray(rng.randn(C, C, k).astype(np.float32)
                                     * 0.02),
                    'b': jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)}
        params[f'resblock_0_{j}'] = rb
    params = jax.tree_util.tree_map(lambda x: x.astype(dt), params)
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1).astype(dt)

    eff_ct = args.tile
    while eff_ct * C > (1 << 19) and eff_ct > 512:
        eff_ct //= 2

    ct_merge = C <= 64          # mirror the production routing

    @jax.jit
    def run_ct(params, x):
        w = pack_mrf_weights(params, 0, ks, dils, merge_taps=ct_merge)
        y = fused_mrf_ct(x, w, ks, dils, tile=eff_ct, merge_taps=ct_merge)
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))

    @jax.jit
    def run_phase(params, x):
        w = pack_mrf_phase_weights(params, 0, ks, dils, p)
        y = fused_mrf_phase(x, w, ks, dils, p, tile=args.ptile)
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))

    @jax.jit
    def run_phase_int8(params, x):
        w = pack_mrf_phase_weights(params, 0, ks, dils, p)
        y = fused_mrf_phase(x, w, ks, dils, p, tile=args.ptile,
                            int8_chain=True)
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))

    @jax.jit
    def run_ct_int8(params, x):
        w = pack_mrf_weights(params, 0, ks, dils, merge_taps=False)
        y = fused_mrf_ct(x, w, ks, dils, tile=eff_ct, int8_chain=True)
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))

    # static per-channel act scales: synthetic calibration from the
    # activation's own stats (value range ~0.1)
    n_dil = len(dils[0])
    stat_scales = [jnp.full((C,), 0.5, jnp.float32)
                   for _ in range(len(ks) * n_dil * 2)]

    @jax.jit
    def run_phase_int8_static(params, x):
        w = pack_mrf_phase_weights(params, 0, ks, dils, p)
        y = fused_mrf_phase(x, w, ks, dils, p, tile=args.ptile,
                            int8_chain=True, act_scales=stat_scales)
        return jnp.sum(jnp.abs(y.astype(jnp.float32)))

    @jax.jit
    def run_relayout(x):
        return jnp.sum(jnp.abs(from_phase(to_phase(x, p), p)
                               .astype(jnp.float32)))

    import os as _os
    todo = [('relayout-only', run_relayout, (x,)),
            ('ct-merged' if ct_merge else 'ct-pertap', run_ct, (params, x)),
            (f'phase-p{p}', run_phase, (params, x)),
            (f'phase-p{p}-int8', run_phase_int8, (params, x)),
            (f'phase-p{p}-int8s', run_phase_int8_static, (params, x)),
            ('ct-int8', run_ct_int8, (params, x)),
            ]
    only = _os.environ.get('BENCH_ONLY')
    if only:
        todo = [t for t in todo if t[0] in only.split(',')]
    for name, fn, a in todo:
        try:
            best, ts = timeit(fn, *a, runs=args.runs)
            print(f'{name:14s} best={best*1e3:8.1f} ms  '
                  f'all={[round(t*1e3, 1) for t in ts]}', flush=True)
        except Exception as e:
            print(f'{name:14s} FAILED: {type(e).__name__}: {e}', flush=True)


if __name__ == '__main__':
    main()
