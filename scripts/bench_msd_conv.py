"""Grouped-conv lowering A/B for the MSD discriminator (VERDICT r4 #6).

The GAN profile attributes 58.8 of the 140 ms D+G iteration to the MSD's
grouped k=41 conv stacks (~13% MXU util). This micro-bench compares
lowerings of the full 3-scale MSD conv stack (fwd + bwd wrt weights,
real+fake pair at B=16 like the training step):

  nch    production ('NCH','OIH','NCH') conv_general_dilated
  nhc    channels-last ('NHC','HIO','NHC') — TPU convs often prefer
         feature-minor layouts
  bf16   nch with bf16 conv compute (the --dtype bfloat16 training flag)

Usage: python scripts/bench_msd_conv.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from daft_exprt_tpu.models.discriminators import _MSD_LAYERS

B, T = 16, 8192


def make_params(rng):
    params = []
    for (cin, cout, k, _st, g, _pad) in _MSD_LAYERS:
        params.append((
            jnp.asarray(rng.randn(cout, cin // g, k).astype(np.float32)
                        * 0.02),
            jnp.asarray(rng.randn(cout).astype(np.float32) * 0.01)))
    return params


def stack_fwd(params, x, layout, dtype):
    """The 7-layer grouped conv stack of one MSD scale."""
    if dtype is not None:
        x = x.astype(dtype)
    if layout == 'nhc':
        x = jnp.swapaxes(x, 1, 2)                      # (B, T, C)
    for (w, b), (_ci, _co, _k, st, g, pad) in zip(params, _MSD_LAYERS):
        if dtype is not None:
            w, b = w.astype(dtype), b.astype(dtype)
        if layout == 'nhc':
            y = jax.lax.conv_general_dilated(
                x, jnp.transpose(w, (2, 1, 0)), window_strides=(st,),
                padding=[(pad, pad)], feature_group_count=g,
                dimension_numbers=('NHC', 'HIO', 'NHC'))
            x = jax.nn.leaky_relu(y + b[None, None, :], 0.1)
        else:
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(st,), padding=[(pad, pad)],
                feature_group_count=g,
                dimension_numbers=('NCH', 'OIH', 'NCH'))
            x = jax.nn.leaky_relu(y + b[:, None], 0.1)
    return x.astype(jnp.float32)


def main():
    rng = np.random.RandomState(0)
    params = make_params(rng)
    y = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)
    y_hat = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)
    print('device', jax.devices()[0], 'B', B, 'T', T, flush=True)

    def make_loss(layout, dtype):
        def loss(params):
            # 3 scales (T, T/2, T/4) x (real, fake), like msd_forward
            tot = jnp.float32(0.0)
            for s in range(3):
                for x in (y, y_hat):
                    xs = x[:, :, ::2 ** s]
                    tot += jnp.sum(stack_fwd(params, xs, layout,
                                             dtype) ** 2)
            return tot
        return jax.jit(jax.grad(loss))

    ref = None
    for name, layout, dtype in (('nch', 'nch', None),
                                ('nhc', 'nhc', None),
                                ('bf16', 'nch', jnp.bfloat16)):
        fn = make_loss(layout, dtype)
        t0 = time.time()
        g = fn(params)
        float(jnp.sum(g[0][0]))
        print(f'{name}: compiled in {time.time() - t0:.1f}s', flush=True)
        if name == 'nch':
            ref = g
        else:
            err = max(float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32))))
                for ga, gb in zip(g, ref) for a, b in zip(ga, gb))
            print(f'  max grad diff vs nch: {err:.2e}', flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                g = fn(params)
            float(jnp.sum(g[0][0]))
            ts.append((time.perf_counter() - t0) / 10)
        print(f'{name}: {min(ts) * 1e3:.2f} ms '
              f'(all {[f"{t * 1e3:.2f}" for t in ts]})', flush=True)


if __name__ == '__main__':
    main()
