"""Piecewise timing of the vocoder tail (levels 2-3 + conv_post) at the
bench geometry, phase-chain pieces vs ct-path pieces, to pick the fastest
composition per level.

Usage: python scripts/bench_tail_pieces.py [--batch 128] [--pieces ...]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, runs=3, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--runs', type=int, default=3)
    ap.add_argument('--pieces', default='ups2p,mrf2p,ups3p,mrf3p,mrf3post,'
                                        'tailp,ups2x,mrf2ct,ups3x,mrf3ct,'
                                        'tailx')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        DEFAULT_CONFIG, _conv1d, _conv_transpose1d, _lrelu, _pallas_mrf,
        init_generator_params)
    from daft_exprt_tpu.ops import vocoder_kernels as vk

    print(f'device={jax.devices()[0]}', flush=True)
    cfg = DEFAULT_CONFIG
    B, T = args.batch, args.frames
    dt = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dt),
        init_generator_params(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)

    T1 = T * 64            # after L1 (8*8): 65536 at T=1024
    x1 = jnp.asarray(rng.randn(B, 128, T1) * 0.1, dt)       # L1 output
    x2p = jnp.asarray(rng.randn(B, 128, T1) * 0.1, dt)      # L2 out, p=2
    x3p = jnp.asarray(rng.randn(B, 128, T1) * 0.1, dt)      # L3 out, p=4
    x2 = jnp.asarray(rng.randn(B, 64, 2 * T1) * 0.1, dt)    # L2 out, std
    x3 = jnp.asarray(rng.randn(B, 32, 4 * T1) * 0.1, dt)    # L3 out, std

    ks = tuple(cfg['resblock_kernel_sizes'])
    dils = tuple(tuple(d) for d in cfg['resblock_dilation_sizes'])

    def s(fn):
        return jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))

    pieces = {}
    pieces['ups2p'] = (s(lambda x: vk.conv_transpose1d_phase(
        x, params['ups_2']['w'], params['ups_2']['b'], 2, 1, 1)), (x1,))
    w2 = vk.pack_mrf_phase_weights(params, 2, ks, dils, 2)
    pieces['mrf2p'] = (s(lambda x: vk.fused_mrf_phase(
        x, w2, ks, dils, 2, tile=4096, in_phase=True, out_phase=True)),
        (x2p,))
    pieces['ups3p'] = (s(lambda x: vk.conv_transpose1d_phase(
        x, params['ups_3']['w'], params['ups_3']['b'], 2, 1, 2)), (x2p,))
    w3 = vk.pack_mrf_phase_weights(params, 3, ks, dils, 4)
    pieces['mrf3p'] = (s(lambda x: vk.fused_mrf_phase(
        x, w3, ks, dils, 4, tile=4096, in_phase=True, out_phase=True)),
        (x3p,))
    pw = vk.pack_post_phase_weights(params['conv_post']['w'],
                                    params['conv_post']['b'], 4)
    pieces['mrf3post'] = (s(lambda x: vk.fused_mrf_phase(
        x, w3, ks, dils, 4, tile=4096, in_phase=True, out_phase=True,
        post_weights=pw, post_k=7)), (x3p,))
    pieces['tailp'] = (s(lambda x: jnp.tanh(vk.from_phase(
        vk.phase_conv1d(_lrelu(x), params['conv_post']['w'],
                        params['conv_post']['b'], 4), 4))), (x3p,))

    pieces['ups2x'] = (s(lambda x: _conv_transpose1d(
        x, params['ups_2']['w'], params['ups_2']['b'], 2, 1)), (x1,))
    pieces['mrf2ct'] = (s(lambda x: _pallas_mrf(
        params, x, 2, cfg, 3, 8192)), (x2,))
    pieces['ups3x'] = (s(lambda x: _conv_transpose1d(
        x, params['ups_3']['w'], params['ups_3']['b'], 2, 1)), (x2,))
    pieces['mrf3ct'] = (s(lambda x: _pallas_mrf(
        params, x, 3, cfg, 3, 8192)), (x3,))
    pieces['tailx'] = (s(lambda x: jnp.tanh(_conv1d(
        _lrelu(x), params['conv_post']['w'], params['conv_post']['b']))),
        (x3,))

    for name in args.pieces.split(','):
        fn, xs = pieces[name]
        best, ts = timeit(fn, *xs, runs=args.runs)
        print(f'{name:9s} best={best * 1e3:8.1f} ms '
              f'all={[round(t * 1e3, 1) for t in ts]}', flush=True)


if __name__ == '__main__':
    main()
