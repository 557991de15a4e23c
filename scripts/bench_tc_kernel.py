"""ct-vs-tc MRF kernel microbench at the wide-level shapes (L0/L1).

The ct kernel lane-rotates ~126 shifted operands per tile (VPU) which holds
L1 at ~67% MXU; the tc kernel's tap shifts are sublane offsets (free).
Measures both kernels + the XLA per-conv reference at the same shape, and
the XLA transpose cost (the integration tax if neighbors stay ct).

Usage: python scripts/bench_tc_kernel.py [--level 1] [--batch 8] [--reps 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from daft_exprt_tpu.ops.vocoder_kernels import (
    fused_mrf_ct, fused_mrf_tc, pack_mrf_tc_int8_weights,
    pack_mrf_tc_weights, pack_mrf_weights,
)

ap = argparse.ArgumentParser()
ap.add_argument('--level', type=int, default=1, help='0: C=256 T=8192; '
                '1: C=128 T=65536 (per 1024-frame utterance)')
ap.add_argument('--batch', type=int, default=8)
ap.add_argument('--reps', type=int, default=30)
ap.add_argument('--tile_ct', type=int, default=0)
ap.add_argument('--tile_tc', type=int, default=0)
ap.add_argument('--dtype', default='bfloat16')
ap.add_argument('--kinds', default='',
                help='comma list: ct-pertap,tc,tc+transpose-io,xla,'
                     'tc-int8,ct-int8 (default: the four bf16 kinds)')
args = ap.parse_args()

C = {0: 256, 1: 128}[args.level]
T = {0: 8192, 1: 65536}[args.level]
B = args.batch
dt = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
ks = (3, 7, 11)
dils = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
_sel_kinds = [k.strip() for k in args.kinds.split(',')] if args.kinds else []
_int8_sel = any('int8' in k for k in _sel_kinds)
tile_ct = args.tile_ct or max(512, (1 << 19) // C)
# int8 kinds default to the production tile rule (4x with the 2^21 cap,
# mirroring hifigan._pallas_mrf_tc) — the bf16 rule understates the
# documented int8 numbers by ~10%
tile_tc = args.tile_tc or max(512, ((1 << 21) if _int8_sel
                                    else (1 << 19)) // C)

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
x_ct = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1).astype(dt)
x_tc = jnp.swapaxes(x_ct, 1, 2)


@jax.jit
def run_ct(params, x):
    w = pack_mrf_weights(params, 0, ks, dils, merge_taps=False)
    y = fused_mrf_ct(x, w, ks, dils, tile=tile_ct)
    return jnp.sum(jnp.abs(y.astype(jnp.float32)))


@jax.jit
def run_tc(params, x):
    w = pack_mrf_tc_weights(params, 0, ks, dils)
    y = fused_mrf_tc(x, w, ks, dils, tile=tile_tc)
    return jnp.sum(jnp.abs(y.astype(jnp.float32)))


@jax.jit
def run_tc_transposed_io(params, x):
    """tc kernel fed from/to ct-layout HBM tensors (integration tax)."""
    w = pack_mrf_tc_weights(params, 0, ks, dils)
    y = fused_mrf_tc(jnp.swapaxes(x, 1, 2), w, ks, dils, tile=tile_tc)
    return jnp.sum(jnp.abs(jnp.swapaxes(y, 1, 2).astype(jnp.float32)))


@jax.jit
def run_xla(params, x):
    from daft_exprt_tpu.models.hifigan import _resblock1
    acc = None
    for j, d in enumerate(dils):
        y = _resblock1(params[f'resblock_0_{j}'], x, d)
        acc = y if acc is None else acc + y
    return jnp.sum(jnp.abs((acc / len(ks)).astype(jnp.float32)))


def _chain_act_scales():
    """Per-conv input amax (calibration-style) from the XLA reference
    chain — the int8-static benches fold these at pack time."""
    from daft_exprt_tpu.models.hifigan import _conv1d, _lrelu
    scales = []
    pf = jax.tree_util.tree_map(lambda v: v.astype(jnp.float32), params)
    xf = x_ct.astype(jnp.float32)
    for j, (k, ds) in enumerate(zip(ks, dils)):
        rb = pf[f'resblock_0_{j}']
        cur, s1s, s2s = xf, [], []
        for i, d in enumerate(ds):
            t1 = _lrelu(cur)
            s1s.append(jnp.max(jnp.abs(t1), axis=(0, 2)))
            a = _conv1d(t1, rb[f'convs1_{i}']['w'],
                        rb[f'convs1_{i}']['b'], dilation=d)
            t2 = _lrelu(a)
            s2s.append(jnp.max(jnp.abs(t2), axis=(0, 2)))
            cur = cur + _conv1d(t2, rb[f'convs2_{i}']['w'],
                                rb[f'convs2_{i}']['b'])
        scales.append((np.asarray(jnp.stack(s1s)),
                       np.asarray(jnp.stack(s2s))))
    return scales


@jax.jit
def run_tc_int8(params, x):
    w = pack_mrf_tc_int8_weights(params, 0, ks, dils, ACT_SCALES)
    y = fused_mrf_tc(x, w, ks, dils, tile=tile_tc, q8=True)
    return jnp.sum(jnp.abs(y.astype(jnp.float32)))


@jax.jit
def run_ct_int8(params, x):
    w = pack_mrf_weights(params, 0, ks, dils, merge_taps=False)
    y = fused_mrf_ct(x, w, ks, dils, tile=tile_ct, int8_chain=True,
                     act_scales=[s for s1, s2 in ACT_SCALES
                                 for s in (s1, s2)])
    return jnp.sum(jnp.abs(y.astype(jnp.float32)))


def bench(name, fn, *a):
    t0 = time.time()
    v = float(fn(*a))
    print(f'  {name}: compile+1 {time.time() - t0:.1f}s (val {v:.1f})',
          flush=True)
    for loop in range(3):
        t0 = time.time()
        for _ in range(args.reps):
            v = fn(*a)
        v = float(v)                  # fetch = sync (axon)
        dtm = (time.time() - t0) / args.reps * 1000
        print(f'  {name}: {dtm:.2f} ms/call (loop {loop})', flush=True)
    return dtm


print(f'level {args.level}: C={C} T={T} B={B} tile_ct={tile_ct} '
      f'tile_tc={tile_tc} dtype={args.dtype}', flush=True)
kinds = {'ct-pertap': (run_ct, 'ct'), 'tc': (run_tc, 'tc'),
         'tc+transpose-io': (run_tc_transposed_io, 'ct'),
         'xla': (run_xla, 'ct'),
         'tc-int8': (run_tc_int8, 'tc'), 'ct-int8': (run_ct_int8, 'ct')}
sel = _sel_kinds or ['ct-pertap', 'tc', 'tc+transpose-io', 'xla']
ACT_SCALES = _chain_act_scales() if any('int8' in k for k in sel) else None
r = {}
for name in sel:
    fn, layout = kinds[name]
    r[name] = bench(name, fn, params, x_ct if layout == 'ct' else x_tc)
print({k: round(v, 2) for k, v in r.items()})
