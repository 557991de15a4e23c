"""Decompose the narrow-level int8 phase kernel's runtime: staging copies
vs MXU dots vs elementwise (quant/requant/residual).

The round-4 fused integer-domain epilogue (DAFT_INT8_FUSED_EPI) measured
neutral at pipeline level (+0.33%, tunnel noise), contradicting the "VPU
elementwise is ~2/3 of narrow-level int8 runtime" working theory. This
probe runs stripped kernel VARIANTS of the production chain structure at
the L3/L2 shapes — each deletes one cost component while keeping the rest
byte-identical (wrong numerics, right traffic):

  compact    the round-5 production path: run-merged compact staging of
             the used C-blocks against column-gathered weights
  full       the pre-compact chain (full-width staging + banded dots +
             requant + f32 residual)
  nostage    stage each conv input ONCE at full width, all dots read the
             same stack rows (deletes ~SigmaW re-staging copies)
  nodots     staging + elementwise, dots replaced by a slice of the staged
             stack (deletes MXU time)
  noelem     staging + dots, boundary/requant replaced by a raw cast
             (deletes VPU ALU sweeps; staging still writes s8)

Usage: python scripts/bench_int8_decompose.py [--C 32] [--T 131072]
       [--batch 8] [--variants full,nostage,...]
Each variant is a separate Pallas compile (~minutes via the tunnel).
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daft_exprt_tpu.ops.vocoder_kernels import (
    LRELU_SLOPE, _phase_conv_spec, _quantize_lrelu_static,
    _requant_lrelu_s32, fold_act_scales_band, pack_mrf_phase_weights,
    phase_chain_halo, quantize_rows, to_phase, _fuse_boundary_consts,
)

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _probe_kernel(x_hbm, *refs, tile, halo, p, C, variant):
    n_dil = sum(len(d) for d in DILS)
    o_ref = refs[7 * n_dil]
    x_scratch = refs[7 * n_dil + 1]
    sem = refs[7 * n_dil + 2]
    stack8 = refs[7 * n_dil + 3]
    b = pl.program_id(0)
    t = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(t * tile, tile + 2 * halo)], x_scratch, sem)
    copy.start()
    copy.wait()
    pc = p * C
    x0 = x_scratch[:]

    def dot_q8(q, wd_ref, spec, L_out, stage=True):
        if variant == 'compact':
            # the round-5 production path: run-merged compact staging
            # against column-gathered weights (weights are gathered by
            # the compact packer in main())
            from daft_exprt_tpu.ops.vocoder_kernels import _stage_compact
            operand = _stage_compact(q, spec, C, L_out, stack8)
            return jnp.dot(wd_ref[:], operand,
                           preferred_element_type=jnp.int32)
        if stage:
            for u in range(spec['W']):
                stack8[u * pc:(u + 1) * pc, 0:L_out] = q[:, u:u + L_out]
        row0 = spec['j0'] * C
        operand = stack8[row0:row0 + spec['kcols'] * C, 0:L_out]
        if variant == 'nodots':
            # same operand traffic, no MXU: reduce the staged block with a
            # cheap strided slice (keeps the result data-dependent)
            return operand[0:pc, :].astype(jnp.int32) * 2
        return jnp.dot(wd_ref[:], operand, preferred_element_type=jnp.int32)

    acc_out = None
    ref_idx = 0
    for blk in range(len(KS)):
        k = KS[blk]
        cur = x0.astype(jnp.float32)
        cur_len = tile + 2 * halo
        off = 0
        for d in DILS[blk]:
            s1 = _phase_conv_spec(k, d, p)
            s2 = _phase_conv_spec(k, 1, p)
            L1 = cur_len - (s1['W'] - 1)
            L2 = L1 - (s2['W'] - 1)
            wd1, inv1, b1i, m1, wd2, sw2, b2 = refs[ref_idx:ref_idx + 7]
            ref_idx += 7
            if variant == 'noelem':
                q_in = cur.astype(jnp.int8)
                acc1 = dot_q8(q_in, wd1, s1, L1)
                q_mid = acc1.astype(jnp.int8)
                acc2 = dot_q8(q_mid, wd2, s2, L2)
                a2 = acc2.astype(jnp.float32)
            elif variant == 'nostage':
                q_in = _quantize_lrelu_static(cur, inv1[:])
                # stage once at the conv's width, then run the dot twice
                # against the SAME rows (deletes conv2's re-staging)
                acc1 = dot_q8(q_in, wd1, s1, L1)
                q_mid = _requant_lrelu_s32(acc1, b1i[:], m1[:])
                acc2 = dot_q8(q_mid[:, :L2 + s2['W'] - 1], wd2, s2, L2,
                              stage=False)[:, 0:L2]
                a2 = acc2.astype(jnp.float32) * sw2[:] + b2[:]
            else:                                        # full
                q_in = _quantize_lrelu_static(cur, inv1[:])
                acc1 = dot_q8(q_in, wd1, s1, L1)
                q_mid = _requant_lrelu_s32(acc1, b1i[:], m1[:])
                acc2 = dot_q8(q_mid, wd2, s2, L2)
                a2 = acc2.astype(jnp.float32) * sw2[:] + b2[:]
            shift = -s1['dmin'] - s2['dmin']
            cur = cur[:, shift:shift + L2] + a2
            cur_len = L2
            off += shift
        win = cur[:, halo - off: halo - off + tile]
        acc_out = win if acc_out is None else acc_out + win
    o_ref[0, :, :] = (acc_out * (1.0 / len(KS))).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('p', 'tile', 'variant'))
def probe(xp, weights, p, tile, variant):
    B, PC, Tq = xp.shape
    C = PC // p
    halo = phase_chain_halo(KS, DILS, p)
    max_w = max(_phase_conv_spec(k, d, p)['W']
                for k, ds in zip(KS, DILS) for d in ds)
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (halo, halo)))
    kernel = functools.partial(_probe_kernel, tile=tile, halo=halo, p=p,
                               C=C, variant=variant)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda b, t, _n=w.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(B, Tq // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, PC, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, PC, Tq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PC, tile + 2 * halo), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((max_w * PC, tile + 2 * halo), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(xpad, *weights)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--C', type=int, default=32)
    ap.add_argument('--T', type=int, default=131072)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--tile', type=int, default=4096)
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--variants',
                default='compact,full,nostage,nodots,noelem')
    args = ap.parse_args()
    B, C, T = args.batch, args.C, args.T
    p = 128 // C
    print(f'device={jax.devices()[0]} C={C} T={T} B={B} p={p}', flush=True)

    rng = np.random.RandomState(0)
    params = {}
    for j, (k, d) in enumerate(zip(KS, DILS)):
        params[f'resblock_0_{j}'] = {
            f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, k)
                                            .astype(np.float32) * .05),
                           'b': jnp.asarray(rng.randn(C)
                                            .astype(np.float32) * .01)}
            for pre in ('convs1', 'convs2') for i in range(len(d))}
    raw = pack_mrf_phase_weights(params, 0, KS, DILS, p)
    scales = [jnp.asarray(0.5 + rng.rand(C).astype(np.float32))
              for _ in range(2 * sum(len(d) for d in DILS))]
    kd = [(k, d) for k, ds in zip(KS, DILS) for d in ds]

    def gather(wq, spec):
        return jnp.concatenate(
            [wq[:, jj * C:(jj + 1) * C] for jj in spec['used']], axis=1)

    weights, weights_c = [], []
    for j in range(0, len(raw), 4):
        k_j, d_j = kd[j // 4]
        wd1, b1, wd2, b2 = raw[j:j + 4]
        wd1f, inv1 = fold_act_scales_band(wd1, scales[j // 2], C, p)
        wq1, sw1 = quantize_rows(wd1f)
        wd2f, inv2 = fold_act_scales_band(wd2, scales[j // 2 + 1], C, p)
        wq2, sw2 = quantize_rows(wd2f)
        b1i, m1 = _fuse_boundary_consts(sw1, b1, inv2)
        weights += [wq1, inv1, b1i, m1, wq2, sw2, b2.astype(jnp.float32)]
        weights_c += [gather(wq1, _phase_conv_spec(k_j, d_j, p)),
                      inv1, b1i, m1,
                      gather(wq2, _phase_conv_spec(k_j, 1, p)),
                      sw2, b2.astype(jnp.float32)]

    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    xp = to_phase(x, p)
    tile = args.tile
    while (T // p) % tile != 0 and tile > 128:
        tile //= 2

    for variant in args.variants.split(','):
        w_sel = weights_c if variant == 'compact' else weights
        t0 = time.time()
        out = probe(xp, w_sel, p, tile, variant)
        float(jnp.sum(out))
        print(f'{variant}: compiled+first in {time.time() - t0:.1f}s',
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = probe(xp, w_sel, p, tile, variant)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / args.reps)
        print(f'{variant}: {min(ts) * 1e3:.2f} ms  (all {[f"{t*1e3:.2f}" for t in ts]})',
              flush=True)


if __name__ == '__main__':
    main()
