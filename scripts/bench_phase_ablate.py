"""Ablation microbench for the phase-major fused MRF kernel.

Times the L3/L2 tail configs with pieces disabled to locate the
non-matmul cost (Amdahl bookkeeping for the tail levels):
  full      — the production kernel
  nostage   — matmuls read a fixed aligned slice of the scratch instead of
              staging W lane-shifted copies per conv (WRONG results; same
              matmul count/geometry, zero shift-copy stores)
  nolrelu   — leaky-relu replaced by identity (WRONG results)
  nomatmul  — stages the stream but replaces each banded dot with a cheap
              slice-add (WRONG results; isolates staging+VPU cost)

Usage: python scripts/bench_phase_ablate.py [--batch 128] [--level 3]
"""
import argparse
import functools
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
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--level', type=int, default=3, choices=[2, 3])
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--runs', type=int, default=3)
    ap.add_argument('--tile', type=int, default=0, help='0 = level default')
    ap.add_argument('--modes', default='full,nostage,nolrelu,nomatmul')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from daft_exprt_tpu.ops import vocoder_kernels as vk

    print(f'device={jax.devices()[0]}', flush=True)
    B = args.batch
    # HiFi-GAN V1 geometry at T mel frames
    T_wav = args.frames * 256
    if args.level == 3:
        C, T = 32, T_wav
    else:
        C, T = 64, T_wav // 2
    p = 128 // C
    ks = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    tile = args.tile or (2048 if args.level == 3 else 4096)

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, C, T) * 0.1, dt)
    params = {}
    for j, k in enumerate(ks):
        rb = {}
        for i, d in enumerate(dils[j]):
            for pref in ('convs1', 'convs2'):
                rb[f'{pref}_{i}'] = {
                    'w': jnp.asarray(rng.randn(C, C, k) * 0.05, jnp.float32),
                    'b': jnp.asarray(rng.randn(C) * 0.01, jnp.float32)}
        params[f'resblock_{args.level}_{j}'] = rb
    weights = [w.astype(dt) if w.ndim > 1 else w
               for w in vk.pack_mrf_phase_weights(params, args.level, ks,
                                                  dils, p)]
    weights = [w.astype(dt) for w in weights]
    xp = vk.to_phase(x, p)

    def make_variant(mode):
        def phase_conv(t_in, wd_ref, b_ref, spec, L_out, stack_ref):
            pc = p * C
            if mode != 'nostage':
                for u in range(spec['W']):
                    stack_ref[u * pc:(u + 1) * pc, 0:L_out] = \
                        t_in[:, u:u + L_out]
            if mode == 'nomatmul':
                return t_in[:, :L_out].astype(jnp.float32) + b_ref[:]
            row0 = (spec['j0'] * C) if mode != 'nostage' else 0
            operand = stack_ref[row0:row0 + spec['kcols'] * C, 0:L_out]
            acc = jnp.dot(wd_ref[:], operand,
                          preferred_element_type=jnp.float32)
            return acc + b_ref[:]

        def kernel(x_hbm, *refs, tile, halo, nb):
            n_w = 4 * sum(len(d) for d in dils)
            o_ref = refs[n_w]
            x_scratch = refs[n_w + 1]
            sem = refs[n_w + 2]
            stack_ref = refs[n_w + 3]
            b = pl.program_id(0)
            t = pl.program_id(1)
            copy = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(t * tile, tile + 2 * halo)],
                x_scratch, sem)
            copy.start()
            copy.wait()
            cdt = x_scratch.dtype
            x0 = x_scratch[:]
            acc_out = None
            ref_idx = 0
            for blk in range(nb):
                k = ks[blk]
                cur = x0.astype(jnp.float32)
                cur_len = tile + 2 * halo
                off = 0
                for d in dils[blk]:
                    s1 = vk._phase_conv_spec(k, d, p)
                    s2 = vk._phase_conv_spec(k, 1, p)
                    wd1, b1, wd2, b2 = refs[ref_idx:ref_idx + 4]
                    ref_idx += 4
                    act = (lambda a: a) if mode == 'nolrelu' else vk._lrelu
                    t_in = act(cur).astype(cdt)
                    L1 = cur_len - (s1['W'] - 1)
                    a1 = phase_conv(t_in, wd1, b1, s1, L1, stack_ref)
                    t2 = act(a1).astype(cdt)
                    L2 = L1 - (s2['W'] - 1)
                    a2 = phase_conv(t2, wd2, b2, s2, L2, stack_ref)
                    shift = -s1['dmin'] - s2['dmin']
                    cur = cur[:, shift:shift + L2] + a2
                    cur_len = L2
                    off += shift
                tile_out = cur[:, halo - off: halo - off + tile]
                acc_out = tile_out if acc_out is None else acc_out + tile_out
            o_ref[0, :, :] = (acc_out * (1.0 / 3)).astype(o_ref.dtype)

        halo = vk.phase_chain_halo(ks, dils, p)
        Tq = T // p
        max_w = max(vk._phase_conv_spec(k, d, p)['W']
                    for k, ds in zip(ks, dils) for d in ds)
        kfn = functools.partial(kernel, tile=tile, halo=halo, nb=3)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        for w in weights:
            in_specs.append(pl.BlockSpec(
                w.shape, (lambda b, t, _n=w.ndim: (0,) * _n),
                memory_space=pltpu.VMEM))

        @jax.jit
        def run(xp, *ws):
            xpad = jnp.pad(xp, ((0, 0), (0, 0), (halo, halo)))
            out = pl.pallas_call(
                kfn,
                grid=(B, Tq // tile),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, p * C, tile),
                                       lambda b, t: (b, 0, t),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, p * C, Tq), xp.dtype),
                scratch_shapes=[
                    pltpu.VMEM((p * C, tile + 2 * halo), xp.dtype),
                    pltpu.SemaphoreType.DMA,
                    pltpu.VMEM((max_w * p * C, tile + 2 * halo), xp.dtype),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(xpad, *ws)
            return jnp.sum(jnp.abs(out.astype(jnp.float32)))
        return run

    for mode in args.modes.split(','):
        run = make_variant(mode)
        best, ts = timeit(run, xp, *weights, runs=args.runs)
        print(f'L{args.level} B={B} tile={tile} {mode:9s} '
              f'best={best * 1e3:8.1f} ms all={[round(t * 1e3, 1) for t in ts]}',
              flush=True)


if __name__ == '__main__':
    main()
