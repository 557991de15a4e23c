"""Microbenchmark: HiFi-GAN vocoder XLA path vs fused-Pallas path on TPU.

Times generator_forward end-to-end (f32 and bf16, with/without the fused
resblock kernel) and a per-upsample-level breakdown so we know where the
766 ms/batch goes. Staged prints; scalar fetch for synchronization
(block_until_ready is unreliable on the axon tunnel).

Usage: python scripts/bench_vocoder.py [--batch 32] [--frames 1024]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, runs=3, warmup=1):
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
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--runs', type=int, default=3)
    ap.add_argument('--levels', action='store_true',
                    help='also run the per-level breakdown')
    ap.add_argument('--configs', default='xla-f32,xla-bf16,pallas-f32,pallas-bf16',
                    help='comma-separated subset of configs to run')
    ap.add_argument('--check', action='store_true',
                    help='validate pallas vs XLA numerics on-device first')
    ap.add_argument('--tile', type=int, default=8192,
                    help='pallas_tile for the pallas configs')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        DEFAULT_CONFIG, generator_forward, init_generator_params)

    print(f'device={jax.devices()[0]}', flush=True)
    B, T = args.batch, args.frames
    params = init_generator_params(jax.random.PRNGKey(0))
    mel = jnp.asarray(np.random.RandomState(0).randn(B, 80, T), jnp.float32)

    def run(dtype, use_pallas, tile, int8=False):
        p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

        @jax.jit
        def f(p, m):
            wav = generator_forward(p, m.astype(dtype),
                                    use_pallas=use_pallas, pallas_tile=tile,
                                    int8=int8)
            return jnp.sum(jnp.abs(wav.astype(jnp.float32)))
        return timeit(f, p, mel, runs=args.runs)

    audio_s = B * T * 256 / 22050.0
    if args.check:
        # numerical validation of the compiled (non-interpret) pallas path
        # vs the XLA path on the actual device, small shape
        mel_s = jnp.asarray(np.random.RandomState(1).randn(1, 80, 64),
                            jnp.float32)
        ref = np.asarray(jax.jit(
            lambda p, m: generator_forward(p, m))(params, mel_s))
        out = np.asarray(jax.jit(
            lambda p, m: generator_forward(p, m, use_pallas=True,
                                           pallas_tile=2048))(params, mel_s))
        err = np.abs(out[:, :, 512:-512] - ref[:, :, 512:-512]).max()
        edge = np.abs(out - ref).max()
        print(f'check: interior_max_err={err:.2e} full_max_err={edge:.2e}',
              flush=True)
        assert err < 5e-4, 'pallas path diverges from XLA path'

    wanted = set(args.configs.split(','))
    for name, dtype, up, tile in [
            ('xla-f32', jnp.float32, False, 0),
            ('xla-bf16', jnp.bfloat16, False, 0),
            ('pallas-f32', jnp.float32, True, args.tile),
            ('pallas-bf16', jnp.bfloat16, True, args.tile),
            ('pallas-int8', jnp.bfloat16, True, args.tile),
    ]:
        if name not in wanted:
            continue
        try:
            best, ts = run(dtype, up, tile, int8=(name == 'pallas-int8'))
            print(f'{name:12s} best={best*1e3:8.1f} ms  '
                  f'{audio_s/best:8.1f} audio-s/s  all={[round(t*1e3,1) for t in ts]}',
                  flush=True)
        except Exception as e:
            print(f'{name:12s} FAILED: {type(e).__name__}: {e}', flush=True)

    if not args.levels:
        return

    # per-level breakdown for the last selected config: time prefix
    # pipelines and difference
    last = args.configs.split(',')[-1]
    lvl_dtype = jnp.bfloat16 if last.endswith('bf16') else jnp.float32
    lvl_pallas = last.startswith('pallas')
    lvl_params = jax.tree_util.tree_map(lambda x: x.astype(lvl_dtype), params)
    lvl_mel = mel.astype(lvl_dtype)
    print(f'breakdown config: dtype={lvl_dtype.__name__} '
          f'pallas={lvl_pallas}', flush=True)
    cfg = DEFAULT_CONFIG

    def prefix(p, m, n_levels, use_pallas=False):
        from daft_exprt_tpu.models.hifigan import (
            _conv1d, _conv_transpose1d, _lrelu, _resblock1, _pallas_mrf)
        x = _conv1d(m, p['conv_pre']['w'], p['conv_pre']['b'])
        for i in range(n_levels):
            u = cfg['upsample_rates'][i]
            k = cfg['upsample_kernel_sizes'][i]
            x = _lrelu(x)
            x = _conv_transpose1d(x, p[f'ups_{i}']['w'], p[f'ups_{i}']['b'],
                                  stride=u, padding=(k - u) // 2)
            if use_pallas and x.shape[1] % 128 == 0:
                x = _pallas_mrf(p, x, i, cfg, 3, 8192)
            else:
                xs = None
                for j, dil in enumerate(cfg['resblock_dilation_sizes']):
                    y = _resblock1(p[f'resblock_{i}_{j}'], x, dil)
                    xs = y if xs is None else xs + y
                x = xs / 3
        return jnp.sum(jnp.abs(x.astype(jnp.float32)))

    prev = 0.0
    for n in range(5):
        f = jax.jit(lambda p, m, n=n: prefix(p, m, n, use_pallas=lvl_pallas))
        best, _ = timeit(f, lvl_params, lvl_mel, runs=args.runs)
        print(f'levels 0..{n-1}: cumulative {best*1e3:8.1f} ms '
              f'(delta {(best-prev)*1e3:8.1f} ms)', flush=True)
        prev = best


if __name__ == '__main__':
    main()
