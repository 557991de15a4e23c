"""Phase-tc vs banded-compact int8 form probe at the narrow-level shapes.

VERDICT r4 #3: the narrow-level (C=32/64) int8 vocoder runs ~2.2x above
its dense-FLOP floor — the banded phase form inflates FLOPs by
|used|/k ≈ 2.14x on the V1 conv mix and pays ~34% staging. The candidate
alternative is a "phase-tc" form: time in SUBLANES, the p phases x C
channels packed into the 128 LANES, so a dilated conv becomes

    y[q, r*C+co] = sum_s  X[q + s, :] @ M_s[:, r*C+co]

— |S| dense (L, 128) @ (128, 128) s8 dots per conv with tap shifts as
free sublane offsets and ZERO staging, at the cost of more MXU FLOPs
(sum_s p per conv; the alignment offset is fixed by conv semantics, so
S cannot be minimized). On the V1 mix the FLOP ratio ptc/banded-compact
is ~376/270 = +39%; this probe measures whether the eliminated staging
and VPU overheads buy that back on real hardware.

Both forms quantize identically (per-(r, co) joint weight scales, static
per-channel act scales, fused s32 boundary), so their outputs are
BIT-IDENTICAL up to layout transpose — the probe asserts that, making it
a correctness check as well as a bench.

Usage: python scripts/bench_ptc_probe.py [--C 32] [--T 131072] [--batch 8]
Each form is a separate Pallas compile (~minutes via the tunnel).
"""
import argparse
import functools
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daft_exprt_tpu.ops.vocoder_kernels import (
    _fuse_boundary_consts, _phase_conv_spec, _quantize_lrelu_static,
    _requant_lrelu_s32, _stage_compact, fold_act_scales_band,
    pack_mrf_phase_weights, phase_chain_halo, quantize_rows, to_phase,
)

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
MARGIN = 1.1


# ----------------------------------------------------------------------
# phase-tc static geometry + packing
# ----------------------------------------------------------------------

def ptc_spec(k, d, p):
    """Shift table of one dilated conv in phase-tc layout: row q of the
    (Q, p*C) tile holds samples p*q..p*q+p-1; tap t of output phase r
    reads absolute offset e = r + d*(t - half) = p*s + a -> sublane
    shift s, lane block a. Empty shifts (dilation gaps) are skipped."""
    half = (k - 1) // 2
    ent = {}
    for r in range(p):
        for t in range(k):
            s_, a = divmod(r + d * (t - half), p)
            ent.setdefault(s_, []).append((a, r, t))
    shifts = tuple(sorted(ent))
    return dict(shifts=shifts, smin=shifts[0], smax=shifts[-1],
                span=shifts[-1] - shifts[0], entries=ent)


def pack_ptc_conv(w, d, p, s_cal):
    """torch (C_out, C_in, k) -> (S, p*C_in, p*C_out) f32 shift matrices
    with the per-channel act scales folded into the input rows."""
    C_out, C_in, k = w.shape
    spec = ptc_spec(k, d, p)
    fold = np.maximum(np.asarray(s_cal, np.float32), 1e-30) * MARGIN / 127.0
    M = np.zeros((len(spec['shifts']), p * C_in, p * C_out), np.float32)
    wt = np.asarray(w, np.float32)
    for si, s_ in enumerate(spec['shifts']):
        for (a, r, t) in spec['entries'][s_]:
            M[si, a * C_in:(a + 1) * C_in, r * C_out:(r + 1) * C_out] += \
                wt[:, :, t].T * fold[:, None]
    return M, (1.0 / fold), spec


def quantize_ptc(M):
    """Joint per-output-column s8 quantization across all shift matrices
    (they accumulate into one s32 sum, so they must share scales)."""
    amax = np.abs(M).max(axis=(0, 1))                      # (p*C_out,)
    sw = np.maximum(amax, 1e-30) / 127.0
    q = np.rint(M / sw[None, None, :]).astype(np.int8)
    return q, sw[None, :].astype(np.float32)               # (1, p*C_out)


def pack_ptc_chain(params, p, C, scales):
    """Per (block, dilation): [W1 (S1,128,128) s8, inv1 (1,128),
    b1i (1,128), m1 (1,128), W2 (S2,128,128) s8, sw2 (1,128), b2 (1,128)]
    with the conv1->conv2 boundary folded into the integer domain —
    byte-for-byte the same quantization constants as the banded q8f
    production path, re-laid-out."""
    weights, specs = [], []
    si = 0
    for j, (k, dils) in enumerate(zip(KS, DILS)):
        rb = params[f'resblock_0_{j}']
        for i, d in enumerate(dils):
            w1 = np.asarray(rb[f'convs1_{i}']['w'])
            b1 = np.asarray(rb[f'convs1_{i}']['b'])
            w2 = np.asarray(rb[f'convs2_{i}']['w'])
            b2 = np.asarray(rb[f'convs2_{i}']['b'])
            M1, inv1, sp1 = pack_ptc_conv(w1, d, p, scales[si])
            M2, inv2, sp2 = pack_ptc_conv(w2, 1, p, scales[si + 1])
            si += 2
            q1, sw1 = quantize_ptc(M1)
            q2, sw2 = quantize_ptc(M2)
            b1i, m1 = _fuse_boundary_consts(
                jnp.asarray(sw1), jnp.asarray(np.tile(b1, p)[None, :]),
                jnp.asarray(np.tile(inv2, p)[None, :]))
            weights += [jnp.asarray(q1),
                        jnp.asarray(np.tile(inv1, p)[None, :]),
                        b1i, m1,
                        jnp.asarray(q2), jnp.asarray(sw2),
                        jnp.asarray(np.tile(b2, p)[None, :])]
            specs.append((sp1, sp2))
    return weights, specs


def ptc_chain_halo(p):
    worst = 0
    for k, dils in zip(KS, DILS):
        tot = sum(ptc_spec(k, d, p)['span'] + ptc_spec(k, 1, p)['span']
                  for d in dils)
        worst = max(worst, tot)
    return -(-worst // 64) * 64


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------

def _ptc_kernel(x_hbm, *refs, tile, halo, p, C):
    n_dil = sum(len(d) for d in DILS)
    o_ref = refs[7 * n_dil]
    x_scratch = refs[7 * n_dil + 1]
    sem = refs[7 * n_dil + 2]
    b = pl.program_id(0)
    t = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + 2 * halo), :], x_scratch, sem)
    copy.start()
    copy.wait()
    x0 = x_scratch[:].astype(jnp.float32)             # (rows, p*C)

    def conv_q8(q_in, W_ref, sp, L_out):
        acc = None
        for si, s_ in enumerate(sp['shifts']):
            seg = q_in[s_ - sp['smin']: s_ - sp['smin'] + L_out]
            c = jnp.dot(seg, W_ref[si], preferred_element_type=jnp.int32)
            acc = c if acc is None else acc + c
        return acc

    acc_out = None
    ref_idx = 0
    for blk, k in enumerate(KS):
        cur = x0
        cur_len = tile + 2 * halo
        off = 0
        for d in DILS[blk]:
            sp1, sp2 = ptc_spec(k, d, p), ptc_spec(k, 1, p)
            L1 = cur_len - sp1['span']
            L2 = L1 - sp2['span']
            W1, inv1, b1i, m1, W2, sw2, b2 = refs[ref_idx:ref_idx + 7]
            ref_idx += 7
            q_in = _quantize_lrelu_static(cur, inv1[:])
            acc1 = conv_q8(q_in, W1, sp1, L1)
            q_mid = _requant_lrelu_s32(acc1, b1i[:], m1[:])
            acc2 = conv_q8(q_mid, W2, sp2, L2)
            a2 = acc2.astype(jnp.float32) * sw2[:] + b2[:]
            shift = -sp1['smin'] - sp2['smin']
            cur = cur[shift:shift + L2] + a2
            cur_len = L2
            off += shift
        win = cur[halo - off: halo - off + tile]
        acc_out = win if acc_out is None else acc_out + win
    o_ref[0, :, :] = (acc_out * (1.0 / len(KS))).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('p', 'tile', 'interpret'))
def ptc_probe(x_tp, weights, p, tile, interpret=False):
    B, Trows, PC = x_tp.shape
    C = PC // p
    halo = ptc_chain_halo(p)
    xpad = jnp.pad(x_tp, ((0, 0), (halo, halo), (0, 0)))
    kernel = functools.partial(_ptc_kernel, tile=tile, halo=halo, p=p,
                               C=C)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda b, t, _n=w.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(B, Trows // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, PC), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Trows, PC), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, PC), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xpad, *weights)


def _banded_kernel(x_hbm, *refs, tile, halo, p, C):
    """Production-equivalent banded chain with compact run-merged staging
    (mirrors _fused_mrf_phase_kernel's q8f path at probe scope)."""
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
    x0 = x_scratch[:].astype(jnp.float32)

    def dot_q8(q, wd_ref, spec, L_out):
        operand = _stage_compact(q, spec, C, L_out, stack8)
        return jnp.dot(wd_ref[:], operand, preferred_element_type=jnp.int32)

    acc_out = None
    ref_idx = 0
    for blk, k in enumerate(KS):
        cur = x0
        cur_len = tile + 2 * halo
        off = 0
        for d in DILS[blk]:
            s1 = _phase_conv_spec(k, d, p)
            s2 = _phase_conv_spec(k, 1, p)
            L1 = cur_len - (s1['W'] - 1)
            L2 = L1 - (s2['W'] - 1)
            wd1, inv1, b1i, m1, wd2, sw2, b2 = refs[ref_idx:ref_idx + 7]
            ref_idx += 7
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


@functools.partial(jax.jit, static_argnames=('p', 'tile', 'interpret'))
def banded_probe(xp, weights, p, tile, interpret=False):
    B, PC, Tq = xp.shape
    C = PC // p
    halo = phase_chain_halo(KS, DILS, p)
    max_used = max(len(_phase_conv_spec(k, d, p)['used'])
                   for k, ds in zip(KS, DILS) for d in list(ds) + [1])
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (halo, halo)))
    kernel = functools.partial(_banded_kernel, tile=tile, halo=halo, p=p,
                               C=C)
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
            pltpu.VMEM((max_used * C, tile + 2 * halo), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xpad, *weights)


def pack_banded_chain(params, p, C, scales):
    """The production q8f packing with column gather (per (block, dil):
    [wd1q_g, inv1, b1i, m1, wd2q_g, sw2, b2])."""
    raw = pack_mrf_phase_weights(params, 0, KS, DILS, p)
    kd = [(k, d) for k, ds in zip(KS, DILS) for d in ds]
    out = []
    for j in range(0, len(raw), 4):
        k_j, d_j = kd[j // 4]
        wd1, b1, wd2, b2 = raw[j:j + 4]
        wd1f, inv1 = fold_act_scales_band(wd1, scales[j // 2], C, p)
        wq1, sw1 = quantize_rows(wd1f)
        wd2f, inv2 = fold_act_scales_band(wd2, scales[j // 2 + 1], C, p)
        wq2, sw2 = quantize_rows(wd2f)
        b1i, m1 = _fuse_boundary_consts(sw1, b1, inv2)

        def g(wq, spec):
            return jnp.concatenate(
                [wq[:, jj * C:(jj + 1) * C] for jj in spec['used']], axis=1)

        out += [g(wq1, _phase_conv_spec(k_j, d_j, p)), inv1, b1i, m1,
                g(wq2, _phase_conv_spec(k_j, 1, p)), sw2,
                b2.astype(jnp.float32)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--C', type=int, default=32)
    ap.add_argument('--T', type=int, default=131072)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--tile', type=int, default=8192)
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--forms', default='banded,ptc')
    ap.add_argument('--interpret', action='store_true')
    ap.add_argument('--check', action='store_true',
                    help='assert bit-identity between the two forms')
    args = ap.parse_args()
    B, C, T = args.batch, args.C, args.T
    p = 128 // C
    print(f'device={jax.devices()[0]} C={C} T={T} B={B} p={p}', flush=True)
    flops = {'dense': 0, 'banded': 0, 'ptc': 0}
    for k, dils in zip(KS, DILS):
        for d in list(dils):
            for kk, dd in ((k, d), (k, 1)):
                flops['dense'] += kk
                flops['banded'] += len(_phase_conv_spec(kk, dd, p)['used'])
                flops['ptc'] += len(ptc_spec(kk, dd, p)['shifts']) * p
    print(f"static FLOP units: dense {flops['dense']} banded-compact "
          f"{flops['banded']} ({flops['banded'] / flops['dense']:.2f}x) "
          f"ptc {flops['ptc']} ({flops['ptc'] / flops['dense']:.2f}x)",
          flush=True)

    rng = np.random.RandomState(0)
    params = {}
    for j, (k, d) in enumerate(zip(KS, DILS)):
        params[f'resblock_0_{j}'] = {
            f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, k)
                                            .astype(np.float32) * .05),
                           'b': jnp.asarray(rng.randn(C)
                                            .astype(np.float32) * .01)}
            for pre in ('convs1', 'convs2') for i in range(len(d))}
    scales = [0.5 + rng.rand(C).astype(np.float32)
              for _ in range(2 * sum(len(d) for d in DILS))]

    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    xp = to_phase(x, p)                        # (B, pC, Tq)
    x_tp = jnp.swapaxes(xp, 1, 2)              # (B, Tq, pC)
    Tq = T // p
    tile = args.tile
    while Tq % tile != 0 and tile > 128:
        tile //= 2

    # pack BOTH weight sets on the host CPU: the banded packer is jnp and
    # would otherwise run eagerly on the TPU, whose f32 mul/div can differ
    # from numpy by one ulp in the scale computation — enough to flip a
    # rounded int8 weight by 1 and break the bit-identity comparison
    with jax.default_device(jax.devices('cpu')[0]):
        w_banded = [np.asarray(w) for w in pack_banded_chain(
            params, p, C, scales)]
        w_ptc0, _specs = pack_ptc_chain(params, p, C, scales)
        w_ptc = [np.asarray(w) for w in w_ptc0]
    w_banded = [jnp.asarray(w) for w in w_banded]
    w_ptc = [jnp.asarray(w) for w in w_ptc]

    outs = {}
    for form in args.forms.split(','):
        if form == 'banded':
            fn = lambda: banded_probe(xp, w_banded, p, tile,
                                      interpret=args.interpret)
        else:
            fn = lambda: ptc_probe(x_tp, w_ptc, p, tile,
                                   interpret=args.interpret)
        t0 = time.time()
        out = fn()
        float(jnp.sum(out))
        print(f'{form}: compiled+first in {time.time() - t0:.1f}s',
              flush=True)
        outs[form] = np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn()
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / args.reps)
        print(f'{form}: {min(ts) * 1e3:.2f} ms  '
              f'(all {[f"{t * 1e3:.2f}" for t in ts]})', flush=True)

    if args.check and 'banded' in outs and 'ptc' in outs:
        a = outs['banded']                     # (B, pC, Tq)
        b_ = np.swapaxes(outs['ptc'], 1, 2)    # -> (B, pC, Tq)
        eq = np.array_equal(a, b_)
        d = np.abs(a - b_)
        print(f'bit-identical: {eq} (max|d| {d.max():.3e}, '
              f'frac>0 {np.mean(d > 0):.2e})', flush=True)
        if not eq:
            # localize: which (batch, row, col) region disagrees?
            idx = np.argwhere(d == d.max())[0]
            cols = np.where(d.max(axis=(0, 1)) > 0)[0]
            rows = np.where(d.max(axis=(0, 2)) > 0)[0]
            print(f'  worst at {tuple(idx)}; differing cols '
                  f'{cols.min()}..{cols.max()} (n={len(cols)}, Tq={a.shape[2]}, '
                  f'tile={tile}); rows {rows.min()}..{rows.max()} '
                  f'(n={len(rows)})', flush=True)
            rel = np.linalg.norm(d) / np.linalg.norm(a)
            print(f'  rel-L2 {rel:.3e}', flush=True)
        assert eq, 'forms disagree'


if __name__ == '__main__':
    main()
