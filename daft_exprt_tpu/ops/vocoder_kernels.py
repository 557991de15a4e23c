"""Pallas TPU kernels for HiFi-GAN inference.

The vocoder's runtime is dominated by the multi-receptive-field resblocks:
6 dilated convolutions per block over very long time axes at 32-512
channels. XLA lowers each conv separately (~7 TFLOPS on the dominant shape,
one HBM round-trip per conv). The fused kernel below keeps a time tile in
VMEM across the whole 3-stage chain

    x = x + conv_k(lrelu(conv_{k,d}(lrelu(x))))   for d in dilations

expressing every conv as k shifted (T, C) @ (C, C) matmuls on the MXU, with
the halo DMA'd once per tile — 6x less HBM traffic and no per-op dispatch.
"""
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


# ----------------------------------------------------------------------
# int8 quantization helpers (v5e MXU runs s8 x s8 -> s32 at 2x the bf16
# rate; the tail levels are matmul-form-bound, so int8 is the remaining
# lever after the phase relayout — see CLAUDE.md perf notes)
# ----------------------------------------------------------------------

def quantize_rows(w, row_axes=None):
    """Symmetric per-output-row int8 quantization of a weight tensor.

    Returns (w_q int8, scale f32) with scale shaped to broadcast against
    the dequantized matmul output: amax is taken over all axes except the
    leading (output-row) axes.
    """
    if row_axes is None:
        row_axes = (0,)
    reduce_axes = tuple(a for a in range(w.ndim) if a not in row_axes)
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    s = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.round(wf / s).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _quantize_dynamic(x):
    """Per-tile symmetric int8 quantization of an activation value.

    One scalar scale for the whole tile: amax reduce + round + cast on the
    VPU, ~3 ops/element — negligible against the k-to-W-fold reuse of the
    quantized tile in the banded matmuls.
    """
    amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
    q = jnp.round(x * (127.0 / amax)).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def _quantize_static(x, inv_s):
    """Per-channel STATIC int8 quantization: ``inv_s`` (rows, 1) is
    127/amax from offline calibration — no per-tile amax reduce, and
    unlike per-time-column scales the per-row scale commutes with the
    banded time shifts (it is folded into the weight columns at pack
    time). Out-of-calibration values saturate at ±127."""
    return jnp.clip(jnp.round(x * inv_s), -127.0, 127.0).astype(jnp.int8)


def _quantize_lrelu_static(x, inv_s):
    """``_quantize_static(_lrelu(x), inv_s)`` in one sweep: ``inv_s`` > 0
    commutes with lrelu, so the slope folds into a per-element multiplier
    select — cmp/sel/mul/round/clip/cast instead of the separate
    lrelu (cmp/mul/sel) + quantize (mul/round/clip/cast) chains. Exact
    (bit-identical rounding) vs the two-step form."""
    m = jnp.where(x >= 0, inv_s, LRELU_SLOPE * inv_s)
    return jnp.clip(jnp.round(x * m), -127.0, 127.0).astype(jnp.int8)


def _requant_lrelu_s32(acc, b_i32, mult):
    """Collapse the conv1→conv2 boundary (dequant s32→f32 → +bias → f32
    lrelu → static requant to s8) into one s32-domain sweep.

    With per-row dequant scale ``sw1`` > 0 and next-conv act scale
    ``inv2`` > 0:  quantize(lrelu(acc*sw1 + b1), inv2)
    == clip(round((acc + round(b1/sw1)) * sel(sw1*inv2, slope*sw1*inv2))).
    ``b_i32`` = round(b1/sw1) (bias in s32 accumulator counts; rounding
    error ≤ 0.5*sw1 on the preactivation, far below the boundary's own s8
    step 1/inv2), ``mult`` = sw1*inv2 per conv1-output row."""
    accb = acc + b_i32
    m = jnp.where(accb >= 0, mult, LRELU_SLOPE * mult)
    return jnp.clip(jnp.round(accb.astype(jnp.float32) * m),
                    -127.0, 127.0).astype(jnp.int8)


def _fuse_boundary_consts(sw1, b1, inv2):
    """Pack-time constants for :func:`_requant_lrelu_s32`. Clip the s32
    bias so an all-zero weight row (sw1 ~ 1e-32 guard) cannot overflow the
    float→int cast; its contribution then rounds to zero in the multiply."""
    b_i32 = jnp.clip(jnp.round(b1.astype(jnp.float32) / sw1),
                     -2.0 ** 30, 2.0 ** 30).astype(jnp.int32)
    return b_i32, (sw1 * inv2).astype(jnp.float32)


def fold_act_scales_taps(w, s_in, margin=1.1):
    """Fold per-channel act scales into per-tap weights (n_dil, k, C_out,
    C_in) before row quantization: W'[..., ci] = W[..., ci] * s[ci].
    ``s_in``: (n_dil, C_in) calibrated amax; returns (w_folded, inv_s)
    with inv_s (n_dil, C_in, 1) the kernel-side activation multiplier."""
    s = jnp.maximum(s_in.astype(jnp.float32), 1e-30) * margin / 127.0
    w_f = w.astype(jnp.float32) * s[:, None, None, :]
    inv_s = (1.0 / s)[:, :, None]
    return w_f, inv_s


def fold_act_scales_band(wd, s_in, C, p, margin=1.1):
    """Fold per-channel act scales into a banded phase matrix
    (p*C_out, kcols*C_in): every column block is channel-contiguous and
    the per-row-block shifts are multiples of C_in, so column col always
    reads channel col % C_in — the per-channel scale tiles cleanly.
    Returns (wd_folded, inv_s (p*C_in, 1))."""
    s = jnp.maximum(s_in.astype(jnp.float32), 1e-30) * margin / 127.0
    kcols = wd.shape[1] // C
    wd_f = wd.astype(jnp.float32) * jnp.tile(s, kcols)[None, :]
    inv_s = jnp.tile(1.0 / s, p)[:, None]
    return wd_f, inv_s


def resblock1_halo(kernel_size: int, dilations: Sequence[int]) -> int:
    """Per-side receptive-field growth of the full chain, rounded up to the
    8-sublane granule so every DMA stays aligned."""
    half = (kernel_size - 1) // 2
    true_halo = sum(d * half + half for d in dilations)
    return -(-true_halo // 64) * 64


def _fused_resblock_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                           x_scratch, sem, *, tile, halo, k, dilations,
                           n_tiles):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # DMA the halo'd tile from HBM (input is pre-padded by `halo` each side;
    # `halo` is 64-aligned so offsets/lengths stay on sublane granules)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + 2 * halo)],
        x_scratch, sem)
    copy.start()
    copy.wait()

    cdt = x_scratch.dtype
    cur = x_scratch[:].astype(jnp.float32)  # (tile + 2*halo, C)
    cur_len = tile + 2 * halo
    half = (k - 1) // 2
    for i, d in enumerate(dilations):
        h1 = d * half
        t_in = _lrelu(cur).astype(cdt)
        L1 = cur_len - 2 * h1
        acc = None
        for tap in range(k):
            seg = t_in[tap * d: tap * d + L1]      # static slice
            contrib = jnp.dot(seg, w1_ref[i, tap],
                              preferred_element_type=jnp.float32)
            acc = contrib if acc is None else acc + contrib
        acc = acc + b1_ref[i][None, :]
        t2 = _lrelu(acc).astype(cdt)
        L2 = L1 - 2 * half
        acc2 = None
        for tap in range(k):
            seg = t2[tap: tap + L2]                # static slice
            contrib = jnp.dot(seg, w2_ref[i, tap],
                              preferred_element_type=jnp.float32)
            acc2 = contrib if acc2 is None else acc2 + contrib
        acc2 = acc2 + b2_ref[i][None, :]
        shrink = h1 + half
        cur = cur[shrink: shrink + L2] + acc2
        cur_len = L2
    # halo is rounded up past the true receptive field — slice the tile out
    # of the remaining valid center
    extra = (cur_len - tile) // 2
    o_ref[0, :, :] = cur[extra: extra + tile].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('kernel_size', 'dilations',
                                             'tile', 'interpret'))
def fused_resblock1(x, w1, b1, w2, b2, kernel_size, dilations, tile=4096,
                    interpret=False):
    """x: (B, T, C); w1/w2: (n_dil, k, C, C); b1/b2: (n_dil, C).

    Equivalent to the HiFi-GAN ResBlock1 chain with zero 'SAME' padding at
    the sequence edges. T must be a multiple of ``tile`` (callers pad).
    """
    B, T, C = x.shape
    halo = resblock1_halo(kernel_size, dilations)
    if T % tile != 0:
        raise ValueError(f'T={T} not a multiple of tile={tile}')
    n_tiles = T // tile
    x_padded = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))

    kernel = functools.partial(
        _fused_resblock_kernel, tile=tile, halo=halo, k=kernel_size,
        dilations=dilations, n_tiles=n_tiles)

    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec((len(dilations), kernel_size, C, C),
                         lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(dilations), C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(dilations), kernel_size, C, C),
                         lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(dilations), C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_padded, w1, b1, w2, b2)


def _ct_conv(t_in, w_ref, b_ref, i, k, d, L_out, merged, stack_ref=None):
    """One dilated conv in (C, T) layout.

    merged=False: w_ref[i] is (k, C_out, C_in); k separate matmuls.
    merged=True:  w_ref[i] is (C_out, k*C_in); the tap shifts are stacked
    along sublanes into one (k*C_in, L) operand so the MXU sees a single
    matmul with a k×-deeper reduction — essential when C is 32/64 and a
    per-tap (C, C) matmul would use a sliver of the systolic array. The
    shifts are staged through ``stack_ref`` (VMEM scratch) because Mosaic
    cannot concatenate lane-rotated vectors directly.
    """
    if merged:
        C = t_in.shape[0]
        for tap in range(k):
            stack_ref[tap * C:(tap + 1) * C, 0:L_out] = \
                t_in[:, tap * d: tap * d + L_out]
        stacked = stack_ref[0:k * C, 0:L_out]
        acc = jnp.dot(w_ref[i], stacked,
                      preferred_element_type=jnp.float32)
    else:
        acc = None
        for tap in range(k):
            seg = t_in[:, tap * d: tap * d + L_out]    # static lane slice
            contrib = jnp.dot(w_ref[i, tap], seg,
                              preferred_element_type=jnp.float32)
            acc = contrib if acc is None else acc + contrib
    return acc + b_ref[i]


def _ct_dot_q8(q, wq_ref, i, k, d, L_out):
    """Per-tap s8 x s8 -> s32 dots against lane-shifted slices of the
    pre-quantized activation, accumulated in int32 (no dequant)."""
    acc = None
    for tap in range(k):
        seg = q[:, tap * d: tap * d + L_out]       # static int8 lane slice
        c = jnp.dot(wq_ref[i, tap], seg, preferred_element_type=jnp.int32)
        acc = c if acc is None else acc + c
    return acc


def _ct_conv_q8(q, s_x, wq_ref, sw_ref, b_ref, i, k, d, L_out):
    """int8 variant of :func:`_ct_conv` (unmerged): s32 tap dots,
    dequantized once with (row_scale * act_scale). ``s_x=None`` = static
    act scales (already folded into the weights at pack time): dequantize
    with the row scale alone."""
    acc = _ct_dot_q8(q, wq_ref, i, k, d, L_out)
    scale = sw_ref[i] if s_x is None else sw_ref[i] * s_x
    return acc.astype(jnp.float32) * scale + b_ref[i]


def _fused_mrf_ct_kernel(x_hbm, *refs, tile, halo, ks, dils, nb, merge,
                         q8=False, q8s=False, q8f=False):
    """Multi-receptive-field fusion, channels-in-sublanes layout.

    refs = [w1_0, b1_0, w2_0, b2_0, ..., w1_{nb-1}, ..., o_ref, x_scratch,
    sem]. x_hbm: (B, C, T + 2*halo) in HBM; o_ref block: (1, C, tile).
    Computes (Σ_blocks resblock1_b(x)) / nb over one time tile, keeping the
    whole chain in VMEM. Weights w: (n_dil, k, C_out, C_in) — or
    (n_dil, C_out, k*C_in) when ``merge`` — biases b: (n_dil, C, 1).
    ``q8s``: static per-channel act scales — refs per block are
    [w1q, sw1, inv1, b1, w2q, sw2, inv2, b2]. ``q8f``: static scales with
    the conv1→conv2 boundary collapsed into the integer domain
    (:func:`_requant_lrelu_s32`) — refs per block are
    [w1q, inv1, b1_i32, mult1, w2q, sw2, b2].
    """
    stride = 7 if q8f else (8 if q8s else (6 if q8 else 4))
    o_ref = refs[stride * nb]
    x_scratch = refs[stride * nb + 1]
    sem = refs[stride * nb + 2]
    stack_ref = refs[stride * nb + 3] if merge else None
    b = pl.program_id(0)
    t = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(t * tile, tile + 2 * halo)],
        x_scratch, sem)
    copy.start()
    copy.wait()

    cdt = x_scratch.dtype
    x0 = x_scratch[:]                         # (C, tile + 2*halo), cdt
    acc_out = None
    for blk in range(nb):
        k = ks[blk]
        half = (k - 1) // 2
        cur = x0.astype(jnp.float32)
        cur_len = tile + 2 * halo
        for i, d in enumerate(dils[blk]):
            h1 = d * half
            L1 = cur_len - 2 * h1
            L2 = L1 - 2 * half
            if q8f:
                w1q, inv1, b1i, m1, w2q, sw2, b2_ref = \
                    refs[7 * blk: 7 * blk + 7]
                q = _quantize_lrelu_static(cur, inv1[i])
                acc1 = _ct_dot_q8(q, w1q, i, k, d, L1)
                q2 = _requant_lrelu_s32(acc1, b1i[i], m1[i])
                acc2 = (_ct_dot_q8(q2, w2q, i, k, 1, L2)
                        .astype(jnp.float32) * sw2[i] + b2_ref[i])
            elif q8s:
                w1q, sw1, inv1, b1_ref, w2q, sw2, inv2, b2_ref = \
                    refs[8 * blk: 8 * blk + 8]
                q = _quantize_static(_lrelu(cur), inv1[i])
                acc = _ct_conv_q8(q, None, w1q, sw1, b1_ref, i, k, d, L1)
                q2 = _quantize_static(_lrelu(acc), inv2[i])
                acc2 = _ct_conv_q8(q2, None, w2q, sw2, b2_ref, i, k, 1, L2)
            elif q8:
                w1q, sw1, b1_ref, w2q, sw2, b2_ref = \
                    refs[6 * blk: 6 * blk + 6]
                q, s_x = _quantize_dynamic(_lrelu(cur))
                acc = _ct_conv_q8(q, s_x, w1q, sw1, b1_ref, i, k, d, L1)
                q2, s2 = _quantize_dynamic(_lrelu(acc))
                acc2 = _ct_conv_q8(q2, s2, w2q, sw2, b2_ref, i, k, 1, L2)
            else:
                w1_ref, b1_ref, w2_ref, b2_ref = refs[4 * blk: 4 * blk + 4]
                t_in = _lrelu(cur).astype(cdt)
                acc = _ct_conv(t_in, w1_ref, b1_ref, i, k, d, L1, merge,
                               stack_ref)
                t2 = _lrelu(acc).astype(cdt)
                acc2 = _ct_conv(t2, w2_ref, b2_ref, i, k, 1, L2, merge,
                                stack_ref)
            shrink = h1 + half
            cur = cur[:, shrink: shrink + L2] + acc2
            cur_len = L2
        extra = (cur_len - tile) // 2
        tile_out = cur[:, extra: extra + tile]
        acc_out = tile_out if acc_out is None else acc_out + tile_out
    o_ref[0, :, :] = (acc_out * (1.0 / nb)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('kernel_sizes', 'dilations',
                                             'tile', 'merge_taps',
                                             'int8_chain', 'int8_fused',
                                             'interpret'))
def fused_mrf_ct(x, weights, kernel_sizes, dilations, tile=8192,
                 merge_taps=False, int8_chain=False, act_scales=None,
                 int8_fused=True, interpret=False):
    """Fused multi-receptive-field resblock group, (B, C, T) layout.

    x: (B, C, T) — the natural conv layout (time in lanes), so no
    transposes are needed around the kernel. ``weights`` is a flat list
    [w1_0, b1_0, w2_0, b2_0, ...] per resblock with w: (n_dil, k, C_out,
    C_in) and b: (n_dil, C, 1). Returns (Σ_b resblock1_b(x)) / nb with
    zero 'SAME' padding semantics at the utterance edges collapsed to the
    fused-chain form (interior samples exact — see fused_resblock1).

    One HBM round trip for the whole group vs ~6·nb for per-conv XLA
    lowering; matmuls are (C, C) @ (C, L) with time in lanes, so small-C
    levels (32/64 channels) keep full lane occupancy.
    """
    B, C, T = x.shape
    nb = len(kernel_sizes)
    halo = max(resblock1_halo(k, d)
               for k, d in zip(kernel_sizes, dilations))
    # lane-dim DMA offsets: keep everything on 128-lane granules
    halo = -(-halo // 128) * 128
    if T % tile != 0:
        raise ValueError(f'T={T} not a multiple of tile={tile}')
    if int8_chain and merge_taps:
        raise ValueError('int8_chain supports the unmerged per-tap form '
                         '(narrow levels route to the phase kernel)')
    n_tiles = T // tile
    x_padded = jnp.pad(x, ((0, 0), (0, 0), (halo, halo)))

    q8s = int8_chain and act_scales is not None
    q8f = q8s and int8_fused
    if q8f:
        # fused boundary: per block [w1q, inv1, b1_i32, mult1, w2q, sw2,
        # b2] — conv1's dequant/bias/lrelu and conv2's requant collapse
        # into one s32-domain sweep inside the kernel
        qw = []
        for j in range(0, len(weights), 4):
            w1, b1, w2, b2 = weights[j:j + 4]
            n_dil, _, c_out, _ = w1.shape
            w1f, inv1 = fold_act_scales_taps(w1, act_scales[j // 2])
            wq1, sw1 = quantize_rows(w1f, row_axes=(0, 2))
            sw1 = sw1.reshape(n_dil, c_out, 1)
            w2f, inv2 = fold_act_scales_taps(w2, act_scales[j // 2 + 1])
            wq2, sw2 = quantize_rows(w2f, row_axes=(0, 2))
            b1i, mult1 = _fuse_boundary_consts(sw1, b1, inv2)
            qw += [wq1, inv1, b1i, mult1, wq2,
                   sw2.reshape(n_dil, c_out, 1), b2.astype(jnp.float32)]
        weights = qw
    elif int8_chain:
        qw = []
        for i in range(0, len(weights), 2):
            w, b = weights[i], weights[i + 1]
            n_dil, _, c_out, _ = w.shape
            if q8s:
                # act_scales: per conv, (n_dil, C_in) calibrated amax in
                # pack order — fold into the weight columns, quantize
                # rows, and hand the kernel the static 127/amax rows
                w, inv_s = fold_act_scales_taps(w, act_scales[i // 2])
            wq, sw = quantize_rows(w, row_axes=(0, 2))
            qw += [wq, sw.reshape(n_dil, c_out, 1)]
            if q8s:
                qw.append(inv_s)
            qw.append(b.astype(jnp.float32))
        weights = qw

    kernel = functools.partial(
        _fused_mrf_ct_kernel, tile=tile, halo=halo,
        ks=tuple(kernel_sizes), dils=tuple(tuple(d) for d in dilations),
        nb=nb, merge=merge_taps, q8=int8_chain and not q8s,
        q8s=q8s and not q8f, q8f=q8f)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda b, t, _n=w.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, T), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, tile + 2 * halo), x.dtype),
            pltpu.SemaphoreType.DMA,
        ] + ([pltpu.VMEM((max(kernel_sizes) * C, tile + 2 * halo), x.dtype)]
             if merge_taps else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x_padded, *weights)


def pack_mrf_weights(params, level, kernel_sizes, dilations,
                     torch_layout=True, merge_taps=False):
    """Stack one upsample level's resblock weights for ``fused_mrf_ct``.

    params: generator params dict with ``resblock_{level}_{j}`` entries
    (see models/hifigan.py). Returns the flat [w1, b1, w2, b2] * nb list
    with w as (n_dil, k, C_out, C_in) — or (n_dil, C_out, k*C_in) when
    ``merge_taps``, matching the kernel's sublane-stacked operand order —
    and b as (n_dil, C, 1).
    """
    out = []
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        rb = params[f'resblock_{level}_{j}']
        for prefix in ('convs1', 'convs2'):
            ws, bs = [], []
            for i in range(len(dils)):
                w = rb[f'{prefix}_{i}']['w']
                if torch_layout:
                    w = jnp.transpose(w, (2, 0, 1))   # (out,in,k)->(k,out,in)
                ws.append(w)
                bs.append(rb[f'{prefix}_{i}']['b'][:, None])
            w = jnp.stack(ws)                         # (n_dil, k, out, in)
            if merge_taps:
                n_dil, kk, co, ci = w.shape
                w = jnp.transpose(w, (0, 2, 1, 3)).reshape(n_dil, co, kk * ci)
            out.append(w)
            out.append(jnp.stack(bs))
    return out


# ----------------------------------------------------------------------
# Time-in-sublanes MRF kernel for wide-channel levels (C >= 128)
# ----------------------------------------------------------------------
#
# The ct kernel expresses each conv tap as a LANE-shifted slice of the
# (C, L) tile — Mosaic materializes every shifted operand with VPU lane
# rotations, ~126 rotated copies per tile across the V1 chain. Measured:
# that rotation traffic holds L1 at ~67% MXU (264 ms vs its 176 ms dense
# floor at B=128). In (L, C) layout the tap shift is a SUBLANE offset —
# plain VMEM addressing, no rotation — and the matmul (L, C_in) @
# (C_in, C_out) fills the MXU whenever C >= 128. Narrow levels stay on
# the phase kernel (lanes would idle at C < 128); wide levels route here.

def _fused_mrf_tc_kernel(x_hbm, *refs, tile, halo, ks, dils, nb,
                         hoist=False, q8=False):
    """MRF fusion, time-in-sublanes. x_hbm: (B, T + 2*halo, C) in HBM;
    refs = [w1_b, b1_b, w2_b, b2_b] * nb + o_ref + x_scratch + sem with
    w: (n_dil, k, C_in, C_out) and b: (n_dil, C). o block: (1, tile, C).

    ``hoist``: compute the first-dilation conv1 input (lrelu(x0), identical
    across the nb blocks — every block's residual stream starts at x0) once
    instead of per block — an explicit CSE of 2 of the 18 lrelu+cast VPU
    sweeps per chain (L1's measured elementwise wall).

    ``q8``: int8-static serving form. refs become
    [wq1, inv1, b1i, m1, wq2, sw2, b2] * nb with wq (n_dil, k, C, C) s8
    (act scales folded into input-channel columns at pack time,
    :func:`pack_mrf_tc_int8_weights`) and per-lane (n_dil, 1, C) vectors.
    Unlike the banded ct/phase int8 forms this keeps DENSE conv FLOPs
    (no kcols/k inflation) at full M=N=128 MXU occupancy — tap shifts
    stay free sublane offsets on the s8 values."""
    n_per = 7 if q8 else 4
    o_ref = refs[n_per * nb]
    x_scratch = refs[n_per * nb + 1]
    sem = refs[n_per * nb + 2]
    b = pl.program_id(0)
    t = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + 2 * halo), :],
        x_scratch, sem)
    copy.start()
    copy.wait()

    cdt = x_scratch.dtype
    x0 = x_scratch[:]                          # (tile + 2*halo, C)
    x0f = x0.astype(jnp.float32)
    acc_out = None
    for blk in range(nb):
        k = ks[blk]
        half = (k - 1) // 2
        cur = x0f
        cur_len = tile + 2 * halo
        if q8:
            (wq1_ref, inv1_ref, b1i_ref, m1_ref,
             wq2_ref, sw2_ref, b2_ref) = refs[n_per * blk: n_per * blk + 7]
            for i, d in enumerate(dils[blk]):
                h1 = d * half
                L1 = cur_len - 2 * h1
                L2 = L1 - 2 * half
                q_in = _quantize_lrelu_static(cur, inv1_ref[i])
                acc = None
                for tap in range(k):
                    seg = q_in[tap * d: tap * d + L1]
                    c = jnp.dot(seg, wq1_ref[i, tap],
                                preferred_element_type=jnp.int32)
                    acc = c if acc is None else acc + c
                q_mid = _requant_lrelu_s32(acc, b1i_ref[i], m1_ref[i])
                acc2 = None
                for tap in range(k):
                    seg = q_mid[tap: tap + L2]
                    c = jnp.dot(seg, wq2_ref[i, tap],
                                preferred_element_type=jnp.int32)
                    acc2 = c if acc2 is None else acc2 + c
                a2 = acc2.astype(jnp.float32) * sw2_ref[i] + b2_ref[i]
                shrink = h1 + half
                cur = cur[shrink: shrink + L2] + a2
                cur_len = L2
        else:
            t00 = _lrelu(x0f).astype(cdt) if hoist else None
            w1_ref, b1_ref, w2_ref, b2_ref = refs[4 * blk: 4 * blk + 4]
            for i, d in enumerate(dils[blk]):
                h1 = d * half
                L1 = cur_len - 2 * h1
                L2 = L1 - 2 * half
                t_in = (t00 if (hoist and i == 0)
                        else _lrelu(cur).astype(cdt))
                acc = None
                for tap in range(k):
                    seg = t_in[tap * d: tap * d + L1]  # sublane slice: free
                    c = jnp.dot(seg, w1_ref[i, tap],
                                preferred_element_type=jnp.float32)
                    acc = c if acc is None else acc + c
                acc = acc + b1_ref[i][None, :]
                t2 = _lrelu(acc).astype(cdt)
                acc2 = None
                for tap in range(k):
                    seg = t2[tap: tap + L2]
                    c = jnp.dot(seg, w2_ref[i, tap],
                                preferred_element_type=jnp.float32)
                    acc2 = c if acc2 is None else acc2 + c
                acc2 = acc2 + b2_ref[i][None, :]
                shrink = h1 + half
                cur = cur[shrink: shrink + L2] + acc2
                cur_len = L2
        extra = (cur_len - tile) // 2
        tile_out = cur[extra: extra + tile]
        acc_out = tile_out if acc_out is None else acc_out + tile_out
    o_ref[0, :, :] = (acc_out * (1.0 / nb)).astype(o_ref.dtype)


def fused_mrf_tc(x, weights, kernel_sizes, dilations, tile=4096,
                 interpret=False, hoist=None, q8=False):
    """Fused MRF resblock group, (B, T, C) layout — the wide-level twin of
    :func:`fused_mrf_ct`. ``weights`` from :func:`pack_mrf_tc_weights`
    (or :func:`pack_mrf_tc_int8_weights` with ``q8=True`` — the int8-static
    serving form: dense conv FLOPs at the 2x s8 MXU rate with free sublane
    tap shifts, unlike the banded ct/phase int8 forms).
    Interior samples exact vs the per-conv reference; utterance edges
    collapse SAME padding across the chain like the other fused kernels.
    ``hoist`` (default: env DAFT_TC_HOIST, on) shares the first-dilation
    lrelu sweep across blocks — bit-identical output either way.

    Env defaults resolve HERE, outside jit, so every setting is a static
    jit arg with its own trace (an env read inside the traced body would
    be silently excluded from the cache key — flipping the var mid-process
    would hit the stale trace)."""
    if hoist is None:
        hoist = os.environ.get('DAFT_TC_HOIST', '1') != '0'
    return _fused_mrf_tc_jit(x, weights, kernel_sizes, dilations,
                             tile=tile, interpret=interpret,
                             hoist=bool(hoist), q8=q8)


@functools.partial(jax.jit, static_argnames=('kernel_sizes', 'dilations',
                                             'tile', 'interpret', 'hoist',
                                             'q8'))
def _fused_mrf_tc_jit(x, weights, kernel_sizes, dilations, tile=4096,
                      interpret=False, hoist=True, q8=False):
    B, T, C = x.shape
    nb = len(kernel_sizes)
    halo = max(resblock1_halo(k, d)
               for k, d in zip(kernel_sizes, dilations))
    if T % tile != 0:
        raise ValueError(f'T={T} not a multiple of tile={tile}')
    n_tiles = T // tile
    x_padded = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))

    kernel = functools.partial(
        _fused_mrf_tc_kernel, tile=tile, halo=halo,
        ks=tuple(kernel_sizes), dils=tuple(tuple(d) for d in dilations),
        nb=nb, hoist=bool(hoist), q8=bool(q8))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda b, t, _n=w.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x_padded, *weights)


def pack_mrf_tc_int8_weights(params, level, kernel_sizes, dilations,
                             act_scales, margin=1.1):
    """int8-static weights for :func:`fused_mrf_tc` (``q8=True``): per
    block [wq1, inv1, b1i, m1, wq2, sw2, b2].

    In tc layout the contraction is (L, C_in) @ (C_in, C_out), so the
    per-channel act scale folds into the weight's INPUT-CHANNEL axis
    (w[tap, ci, co] * s[ci]) — trivially commuting with the time shifts —
    and all per-lane vectors are (n_dil, 1, C). The conv1→conv2 boundary
    uses the fused s32-domain requant (:func:`_requant_lrelu_s32`).
    ``act_scales``: this level's [(s1, s2) per block] calibration entry
    from ``calibrate_act_scales`` with s shaped (n_dil, C)."""
    out = []
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        rb = params[f'resblock_{level}_{j}']
        s1_cal, s2_cal = act_scales[j]
        packed = {}
        for prefix, s_cal in (('convs1', s1_cal), ('convs2', s2_cal)):
            wqs, sws, invs, bs = [], [], [], []
            for i in range(len(dils)):
                w = jnp.transpose(rb[f'{prefix}_{i}']['w'],
                                  (2, 1, 0))                # (k, ci, co)
                s = jnp.maximum(jnp.asarray(s_cal[i], jnp.float32),
                                1e-30) * margin / 127.0     # (C,)
                wf = w.astype(jnp.float32) * s[None, :, None]
                wq, sw = quantize_rows(
                    jnp.transpose(wf, (2, 0, 1)))           # rows = co
                wqs.append(jnp.transpose(wq, (1, 2, 0)))    # (k, ci, co)
                sws.append(sw[:, 0, 0])                     # (C,)
                invs.append(1.0 / s)
                bs.append(rb[f'{prefix}_{i}']['b'].astype(jnp.float32))
            packed[prefix] = (jnp.stack(wqs), jnp.stack(sws)[:, None, :],
                              jnp.stack(invs)[:, None, :],
                              jnp.stack(bs)[:, None, :])
        wq1, sw1, inv1, b1 = packed['convs1']
        wq2, sw2, inv2, b2 = packed['convs2']
        b1i, m1 = _fuse_boundary_consts(sw1, b1, inv2)
        out += [wq1, inv1, b1i, m1, wq2, sw2, b2]
    return out


def pack_mrf_tc_weights(params, level, kernel_sizes, dilations):
    """Stack one level's resblock weights for :func:`fused_mrf_tc`:
    w as (n_dil, k, C_in, C_out) — torch (out, in, k) transposed so the
    contraction reads (L, C_in) @ (C_in, C_out) — and b as (n_dil, C)."""
    out = []
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        rb = params[f'resblock_{level}_{j}']
        for prefix in ('convs1', 'convs2'):
            ws, bs = [], []
            for i in range(len(dils)):
                w = rb[f'{prefix}_{i}']['w']              # (out, in, k)
                ws.append(jnp.transpose(w, (2, 1, 0)))    # (k, in, out)
                bs.append(rb[f'{prefix}_{i}']['b'])
            out.append(jnp.stack(ws))                     # (n_dil,k,in,out)
            out.append(jnp.stack(bs))                     # (n_dil, C)
    return out


# ----------------------------------------------------------------------
# Phase-major (space-to-depth) MRF kernel for narrow-channel levels
# ----------------------------------------------------------------------
#
# The C=32 tail level caps MXU row utilization at C_out/128 = 25%: each
# per-tap (or tap-merged) matmul has only 32 output rows. Folding p=4 time
# phases into channels lifts M to p*C = 128: x is laid out as
# X[r*C + c, q] = x[c, p*q + r], and a dilated conv becomes ONE banded
# matmul  Y = Wd @ S  where S stacks W = span(δ) lane-shifted copies of X
# (the "phase stream") and Wd[(r*C+co), (r + d*tap)*C + ci] = w[co, ci, tap].
# FLOPs grow by (p + d(k-1))/(p*k) but run at 4x the M-bound rate — a
# 1.75x net on the level's V1 conv mix — and the shift-copy traffic drops
# from Σk=126 to ΣW=92 copies per chain.

def to_phase(x, p):
    """(B, C, T) → (B, p*C, T//p) with row r*C+c, col q = x[c, p*q + r]."""
    B, C, T = x.shape
    return x.reshape(B, C, T // p, p).transpose(0, 3, 1, 2) \
            .reshape(B, p * C, T // p)


def from_phase(y, p):
    """Inverse of to_phase."""
    B, PC, Q = y.shape
    C = PC // p
    return y.reshape(B, p, C, Q).transpose(0, 2, 3, 1).reshape(B, C, Q * p)


def _phase_conv_spec(k, d, p):
    """Static geometry of one dilated conv in phase-p layout.

    ``used``: the column C-blocks of the banded matrix that any output
    row actually reads (row r's taps sit at blocks r + d*t) — for d > p
    the dilation gaps leave (and for p-alignment edges all convs leave)
    all-zero blocks that the compact staging mode neither stages nor
    multiplies (~27% of staged blocks + dot K across the V1 chain).

    ``runs``: the ``used`` list grouped into maximal (slot, shift u,
    phase-row rp, length) copy runs — consecutive jj with no phase-row
    wraparound read consecutive C-blocks of the tile at the same lane
    shift, so one staging write covers the whole run (d <= p convs
    collapse from kcols single-block writes to ~kcols/p full-width
    writes; the per-write fixed cost was ~a third of the int8 kernels'
    staging share)."""
    half = (k - 1) // 2
    dmin = (-(d * half)) // p          # floor; ≤ 0
    dmax = (p - 1 + d * half) // p
    j0 = -d * half - p * dmin          # ∈ [0, p): row offset into the stream
    used = tuple(sorted({r + d * t for r in range(p) for t in range(k)}))
    return dict(half=half, dmin=dmin, dmax=dmax, W=dmax - dmin + 1, j0=j0,
                kcols=p + d * (k - 1), used=used,
                runs=_stage_runs_of(used, j0, p))


def _stage_runs_of(used, j0, p):
    """Group a sorted ``used`` block list into maximal (slot, shift u,
    phase-row rp, length) copy runs: consecutive block indices at the
    same lane shift u read consecutive phase rows, so one staging write
    covers the run."""
    runs = []
    i = 0
    while i < len(used):
        u, rp = divmod(j0 + used[i], p)
        ln = 1
        while (i + ln < len(used) and used[i + ln] == used[i] + ln
               and rp + ln < p):
            ln += 1
        runs.append((i, u, rp, ln))
        i += ln
    return tuple(runs)


def phase_chain_halo(kernel_sizes, dilations, p):
    """Per-side halo in phase columns for the fused chain, 128-aligned."""
    worst = 0
    for k, dils in zip(kernel_sizes, dilations):
        left = right = 0
        for d in dils:
            s1 = _phase_conv_spec(k, d, p)
            s2 = _phase_conv_spec(k, 1, p)
            left += -s1['dmin'] - s2['dmin']
            right += s1['dmax'] + s2['dmax']
        worst = max(worst, left, right)
    return -(-worst // 128) * 128


def pack_mrf_phase_weights(params, level, kernel_sizes, dilations, p,
                           torch_layout=True):
    """One upsample level's resblock weights → banded phase-p matrices.

    Returns the flat [Wd1_0, b1_0, Wd2_0, b2_0, ...] list per (block,
    dilation) pair with Wd: (p*C, (p + d(k-1))*C) and b: (p*C, 1) — the
    bias tiled across phases.
    """
    out = []
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        rb = params[f'resblock_{level}_{j}']
        for i, d in enumerate(dils):
            for prefix, dd in (('convs1', d), ('convs2', 1)):
                w = rb[f'{prefix}_{i}']['w']
                if not torch_layout:
                    raise ValueError('phase packer expects torch (out,in,k)')
                C_out, C_in, kk = w.shape
                # band for phase r=0: taps at column blocks dd*tap of
                # dd*(kk-1)+1 blocks (zero-interleaved for dilation)
                taps = jnp.transpose(w, (2, 0, 1))        # (k, out, in)
                if dd > 1:
                    z = jnp.zeros((kk, dd - 1, C_out, C_in), taps.dtype)
                    taps = jnp.concatenate([taps[:, None], z], axis=1)
                    taps = taps.reshape(kk * dd, C_out, C_in)
                    taps = taps[:dd * (kk - 1) + 1]
                band = jnp.transpose(taps, (1, 0, 2)).reshape(
                    C_out, (dd * (kk - 1) + 1) * C_in)
                # row block r = band shifted right by r*C_in columns
                rows = [jnp.pad(band, ((0, 0), (r * C_in,
                                                (p - 1 - r) * C_in)))
                        for r in range(p)]
                Wd = jnp.concatenate(rows, axis=0)        # (p*C, kcols*C)
                b = rb[f'{prefix}_{i}']['b']
                out.append(Wd)
                out.append(jnp.tile(b, p)[:, None])
    return out


def pack_post_phase_weights(w, b, p):
    """conv_post weights (torch (C_out, C_in, k), d=1) → banded phase-p
    matrix (p*C_out, kcols*C_in) + bias (p*C_out, 1), same construction as
    :func:`pack_mrf_phase_weights`, for the fused conv_post epilogue."""
    C_out, C_in, k = w.shape
    taps = jnp.transpose(w, (2, 0, 1))                   # (k, out, in)
    band = jnp.transpose(taps, (1, 0, 2)).reshape(C_out, k * C_in)
    rows = [jnp.pad(band, ((0, 0), (r * C_in, (p - 1 - r) * C_in)))
            for r in range(p)]
    Wd = jnp.concatenate(rows, axis=0)                   # (p*C_out, kcols*C)
    return Wd, jnp.tile(b, p)[:, None]


def _ups_phase_entries(k, stride, padding, p_in):
    """Static geometry of a phase-layout transposed conv (see
    :func:`conv_transpose1d_phase`): the (r, j, a, delta) contribution
    table plus its column-shift range."""
    if k - 2 * padding != stride:
        raise ValueError('phase transposed conv requires k - 2*padding == '
                         f'stride (got k={k}, padding={padding}, '
                         f'stride={stride})')
    po = stride * p_in
    entries = []
    for r in range(po):
        for j in range(k):
            if (r + padding - j) % stride != 0:
                continue
            e = (r + padding - j) // stride
            entries.append((r, j, e % p_in, e // p_in))
    dmin = min(d for *_, d in entries)
    dmax = max(d for *_, d in entries)
    return entries, dmin, dmax


def ups_used_blocks(k, stride, padding, p_in):
    """The C_in-column blocks of the fused-upsample banded matrix that any
    entry actually writes — transposed-conv geometry leaves the rest
    all-zero (e.g. the V1 L3 upsample uses 4 of 6), so compact staging
    skips them. Block index = (d - dmin)*p_in + a, matching the
    :func:`pack_ups_phase_weights` column order."""
    entries, dmin, _ = _ups_phase_entries(k, stride, padding, p_in)
    return tuple(sorted({(d - dmin) * p_in + a for _, _, a, d in entries}))


def pack_ups_phase_weights(w, b, stride, padding, p_in, dtype=None):
    """ConvTranspose1d weights (torch (C_in, C_out, k)) → the banded
    phase matrix (po*C_out, W*p_in*C_in) + bias (po*C_out, 1) + static
    (W, dmin) for the fused upsample prologue / XLA phase upsample."""
    C_in, C_out, k = w.shape
    entries, dmin, dmax = _ups_phase_entries(k, stride, padding, p_in)
    W = dmax - dmin + 1
    po = stride * p_in
    dt = dtype or w.dtype
    Wb = jnp.zeros((po * C_out, W * p_in * C_in), dt)
    wt = jnp.swapaxes(w, 0, 1).astype(dt)          # (C_out, C_in, k)
    for r, j, a, d in entries:
        blk = (d - dmin) * p_in + a
        Wb = Wb.at[r * C_out:(r + 1) * C_out,
                   blk * C_in:(blk + 1) * C_in].set(wt[:, :, j])
    return Wb, jnp.tile(b, po)[:, None].astype(jnp.float32), W, dmin


def _phase_chain_geometry(kernel_sizes, dilations, p, tile, halo):
    """Static per-block (off, cur_len) after the fused chain."""
    geo = []
    for k, dils in zip(kernel_sizes, dilations):
        off, cur_len = 0, tile + 2 * halo
        for d in dils:
            s1 = _phase_conv_spec(k, d, p)
            s2 = _phase_conv_spec(k, 1, p)
            off += -s1['dmin'] - s2['dmin']
            cur_len -= (s1['W'] - 1) + (s2['W'] - 1)
        geo.append((off, cur_len))
    return geo


def phase_post_feasible(kernel_sizes, dilations, p, post_k, tile):
    """True when the chain halo leaves enough margin to run the conv_post
    epilogue (lrelu → conv_post → tanh) inside the fused kernel."""
    halo = phase_chain_halo(kernel_sizes, dilations, p)
    sp = _phase_conv_spec(post_k, 1, p)
    for off, cur_len in _phase_chain_geometry(kernel_sizes, dilations, p,
                                              tile, halo):
        start = halo + sp['dmin'] - off
        if start < 0 or start + tile + sp['W'] - 1 > cur_len:
            return False
    return True


def _stage_compact(val, spec, C, L_out, stack_ref, base=0):
    """Stage the ``spec['used']`` C-blocks of a phase tile through
    ``stack_ref`` as run-merged writes (spec['runs']: consecutive used
    blocks at one lane shift collapse into a single multi-block copy)
    and return the gathered operand. Bytes staged = used blocks only;
    write count ≈ used/p for the gap-free d <= p convs. ``base``: extra
    static lane offset into ``val`` (the fused-ups prologue reads its
    shifts at ups_base)."""
    for (m, u, rp, ln) in spec['runs']:
        stack_ref[m * C:(m + ln) * C, 0:L_out] = \
            val[rp * C:(rp + ln) * C, base + u:base + u + L_out]
    return stack_ref[0:len(spec['used']) * C, 0:L_out]


def _phase_conv(t_in, wd_ref, b_ref, spec, C, p, L_out, stack_ref,
                compact=False):
    """One dilated conv as a single banded matmul in phase-p layout.

    t_in: (p*C, len) activations (compute dtype). Builds the phase stream
    by staging W lane-shifted copies of t_in through ``stack_ref`` (Mosaic
    cannot concatenate lane-rotated values directly), then one
    (p*C, kcols*C) @ (kcols*C, L_out) matmul. ``compact``: stage/contract
    only the structurally-used C-blocks against a column-gathered weight
    (exact zeros removed from the f32 accumulation — equal up to MXU
    partial-sum regrouping, ~1e-7 rel).
    """
    pc = p * C
    if compact:
        operand = _stage_compact(t_in, spec, C, L_out, stack_ref)
        acc = jnp.dot(wd_ref[:], operand,
                      preferred_element_type=jnp.float32)
        return acc + b_ref[:]
    for u in range(spec['W']):
        stack_ref[u * pc:(u + 1) * pc, 0:L_out] = t_in[:, u:u + L_out]
    row0 = spec['j0'] * C
    operand = stack_ref[row0:row0 + spec['kcols'] * C, 0:L_out]
    acc = jnp.dot(wd_ref[:], operand, preferred_element_type=jnp.float32)
    return acc + b_ref[:]


def _phase_dot_q8(q, wd_ref, spec, C, p, L_out, stack8_ref, compact=False):
    """Stage the W int8 lane shifts of a pre-quantized phase tile and run
    the banded s8 x s8 -> s32 matmul (no dequant).

    ``compact``: stage only the ``spec['used']`` C-blocks (run-merged
    writes, see :func:`_stage_compact`) and contract the column-gathered
    weight against them — skips the all-zero band blocks (weights must be
    packed with the same gather). Bit-identical: the removed blocks
    contribute exact integer zeros to the s32 accumulator."""
    pc = p * C
    if compact:
        operand = _stage_compact(q, spec, C, L_out, stack8_ref)
        return jnp.dot(wd_ref[:], operand,
                       preferred_element_type=jnp.int32)
    for u in range(spec['W']):
        stack8_ref[u * pc:(u + 1) * pc, 0:L_out] = q[:, u:u + L_out]
    row0 = spec['j0'] * C
    operand = stack8_ref[row0:row0 + spec['kcols'] * C, 0:L_out]
    return jnp.dot(wd_ref[:], operand, preferred_element_type=jnp.int32)


def _phase_conv_q8(t_in, wd_ref, sw_ref, b_ref, spec, C, p, L_out,
                   stack8_ref, inv_s_ref=None, compact=False):
    """int8 variant of :func:`_phase_conv`: quantize the f32 activation
    tile (per-tile dynamic scale, or static per-channel rows via
    ``inv_s_ref`` with the scales pre-folded into the weight columns),
    stage the W lane shifts as int8, one s8 x s8 -> s32 banded matmul,
    dequantize with the row scale (× act scale when dynamic) and add the
    bias in f32. ``compact`` stays bit-identical even with the dynamic
    per-tile scale — the amax is taken on ``t_in`` before staging."""
    if inv_s_ref is None:
        q, s_x = _quantize_dynamic(t_in)
        scale = sw_ref[:] * s_x
    else:
        q = _quantize_static(t_in, inv_s_ref[:])
        scale = sw_ref[:]
    acc = _phase_dot_q8(q, wd_ref, spec, C, p, L_out, stack8_ref,
                        compact=compact)
    return acc.astype(jnp.float32) * scale + b_ref[:]


def _fused_mrf_phase_kernel(x_hbm, *refs, tile, halo, ks, dils, nb, p, C,
                            post_k=0, ups_w=0, ups_base=0, halo_in=0,
                            q8=False, q8s=False, q8f=False, split=1,
                            compact=False, ups_spec=None, ups_cin=0):
    """Phase-p MRF fusion. x_hbm: (B, p*C, Tq + 2*halo) phase layout in
    HBM; refs = per-(block, dilation) [Wd1, b1, Wd2, b2] ...
    [+ Wd_post, b_post when post_k] [+ Wb_ups, b_ups when ups_w] +
    o_ref + x_scratch + sem + stack_ref.

    With ``post_k`` set, the generator tail (lrelu → conv_post → tanh) runs
    as an epilogue on the accumulated tile before the HBM write — the
    output shrinks from (p*C, tile) to (p*C_out, tile), removing the whole
    post-chain's HBM round trip (conv_post's FLOPs are negligible but its
    XLA chain cost ~140 ms of the 909 ms B=128 vocoder).

    With ``ups_w`` set, x_hbm is the PRE-upsample activation (same row
    count, phase-p_in layout, padded by ``halo_in``) and the level's
    lrelu + transposed-conv upsample run as a prologue: one banded
    (p*C, ups_w * p_in*C_in) matmul over ``ups_w`` staged shifts — the
    XLA phase upsamples cost ~52 ms each at B=128 and an extra HBM round
    trip; here they ride the tile already in VMEM."""
    n_w = ((7 if q8f else (8 if q8s else (6 if q8 else 4)))
           * sum(len(d) for d in dils))
    n_post = 2 if post_k else 0
    n_ups = (3 if q8 else 2) if ups_w else 0
    base = n_w + n_post + n_ups
    o_ref = refs[base]
    x_scratch = refs[base + 1]
    sem = refs[base + 2]
    # in q8 mode the bf16 stack only feeds the conv_post epilogue — it is
    # not allocated at all when post_k == 0 (dead VMEM otherwise).
    # ``split`` halves get independent stacks so their compute DAGs share
    # no scratch (lets the scheduler overlap half A's MXU phase with half
    # B's VPU phase — the chain otherwise alternates strictly).
    has_bf16_stack = (not q8) or bool(post_k)
    idx = base + 3
    stack_refs = stack8_refs = None
    if has_bf16_stack:
        stack_refs = refs[idx: idx + split]
        idx += split
    if q8:
        stack8_refs = refs[idx: idx + split]
        idx += split
    stack_ref = stack_refs[0] if stack_refs else None
    stack8_ref = stack8_refs[0] if stack8_refs else None
    b = pl.program_id(0)
    t = pl.program_id(1)

    hin = halo_in if ups_w else halo
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(t * tile, tile + 2 * hin)],
        x_scratch, sem)
    copy.start()
    copy.wait()

    # with the epilogue, accumulate an extended window so conv_post's
    # receptive field is fed by real neighbor data from the halo
    sp = _phase_conv_spec(post_k, 1, p) if post_k else None
    ext = (sp['W'] - 1) if post_k else 0
    a0 = sp['dmin'] if post_k else 0         # window start vs tile start

    cdt = x_scratch.dtype
    if ups_w:
        # prologue: lrelu + transposed-conv upsample as a banded matmul
        pic = x_scratch.shape[0]             # p_in * C_in == p * C rows
        L0 = tile + 2 * halo
        xin_f = _lrelu(x_scratch[:].astype(jnp.float32))
        if q8:
            wb_ups, sw_ups, b_ups = refs[n_w + n_post:n_w + n_post + 3]
            qx, sx = _quantize_dynamic(xin_f)
            if ups_spec is not None:
                operand = _stage_compact(qx, ups_spec, ups_cin, L0,
                                         stack8_ref, base=ups_base)
            else:
                for u in range(ups_w):
                    stack8_ref[u * pic:(u + 1) * pic, 0:L0] = \
                        qx[:, ups_base + u: ups_base + u + L0]
                operand = stack8_ref[0:ups_w * pic, 0:L0]
            x0 = (jnp.dot(wb_ups[:], operand,
                          preferred_element_type=jnp.int32)
                  .astype(jnp.float32) * (sw_ups[:] * sx) + b_ups[:])
        else:
            wb_ups, b_ups = refs[n_w + n_post:n_w + n_post + 2]
            xin = xin_f.astype(cdt)
            if ups_spec is not None:
                operand = _stage_compact(xin, ups_spec, ups_cin, L0,
                                         stack_ref, base=ups_base)
            else:
                for u in range(ups_w):
                    stack_ref[u * pic:(u + 1) * pic, 0:L0] = \
                        xin[:, ups_base + u: ups_base + u + L0]
                operand = stack_ref[0:ups_w * pic, 0:L0]
            x0 = (jnp.dot(wb_ups[:], operand,
                          preferred_element_type=jnp.float32)
                  + b_ups[:]).astype(cdt)
    else:
        x0 = x_scratch[:]                    # (p*C, tile + 2*halo)

    def run_chain(x0w, w_out, stk, stk8):
        """Full MRF chain (+ post epilogue) on a window of ``w_out``
        output columns; x0w: (p*C, w_out + 2*halo)."""
        acc_out = None
        ref_idx = 0
        for blk in range(nb):
            k = ks[blk]
            cur = x0w.astype(jnp.float32)
            cur_len = w_out + 2 * halo
            off = 0                          # col 0 of cur in halo'd coords
            for d in dils[blk]:
                s1 = _phase_conv_spec(k, d, p)
                s2 = _phase_conv_spec(k, 1, p)
                L1 = cur_len - (s1['W'] - 1)
                L2 = L1 - (s2['W'] - 1)
                if q8f:
                    (wd1, inv1, b1i, m1,
                     wd2, sw2, b2) = refs[ref_idx:ref_idx + 7]
                    ref_idx += 7
                    q_in = _quantize_lrelu_static(cur, inv1[:])
                    acc1 = _phase_dot_q8(q_in, wd1, s1, C, p, L1, stk8,
                                         compact=compact)
                    q_mid = _requant_lrelu_s32(acc1, b1i[:], m1[:])
                    a2 = (_phase_dot_q8(q_mid, wd2, s2, C, p, L2, stk8,
                                        compact=compact)
                          .astype(jnp.float32) * sw2[:] + b2[:])
                elif q8s:
                    (wd1, sw1, inv1, b1,
                     wd2, sw2, inv2, b2) = refs[ref_idx:ref_idx + 8]
                    ref_idx += 8
                    a1 = _phase_conv_q8(_lrelu(cur), wd1, sw1, b1, s1, C,
                                        p, L1, stk8, inv_s_ref=inv1,
                                        compact=compact)
                    a2 = _phase_conv_q8(_lrelu(a1), wd2, sw2, b2, s2, C,
                                        p, L2, stk8, inv_s_ref=inv2,
                                        compact=compact)
                elif q8:
                    wd1, sw1, b1, wd2, sw2, b2 = refs[ref_idx:ref_idx + 6]
                    ref_idx += 6
                    a1 = _phase_conv_q8(_lrelu(cur), wd1, sw1, b1, s1, C,
                                        p, L1, stk8, compact=compact)
                    a2 = _phase_conv_q8(_lrelu(a1), wd2, sw2, b2, s2, C,
                                        p, L2, stk8, compact=compact)
                else:
                    wd1, b1, wd2, b2 = refs[ref_idx:ref_idx + 4]
                    ref_idx += 4
                    t_in = _lrelu(cur).astype(cdt)
                    a1 = _phase_conv(t_in, wd1, b1, s1, C, p, L1, stk,
                                     compact=compact)
                    t2 = _lrelu(a1).astype(cdt)
                    a2 = _phase_conv(t2, wd2, b2, s2, C, p, L2, stk,
                                     compact=compact)
                shift = -s1['dmin'] - s2['dmin']
                cur = cur[:, shift:shift + L2] + a2
                cur_len = L2
                off += shift
            start = halo + a0 - off
            win = cur[:, start: start + w_out + ext]
            acc_out = win if acc_out is None else acc_out + win
        acc_out = acc_out * (1.0 / nb)
        if post_k:
            wd_post, b_post = refs[n_w:n_w + 2]
            t_in = _lrelu(acc_out).astype(cdt)
            # d=1 ⇒ used == range(kcols): the column gather is the
            # identity, so compact staging works against the ungathered
            # post weights (it only batches the writes into runs)
            y = _phase_conv(t_in, wd_post, b_post, sp, C, p, w_out, stk,
                            compact=compact)
            return jnp.tanh(y)
        return acc_out

    if split == 1:
        o_ref[0, :, :] = run_chain(x0, tile, stack_ref,
                                   stack8_ref).astype(o_ref.dtype)
    else:
        h = tile // split
        for si in range(split):
            y = run_chain(x0[:, si * h: si * h + h + 2 * halo], h,
                          stack_refs[si] if stack_refs else None,
                          stack8_refs[si] if stack8_refs else None)
            o_ref[0, :, si * h:(si + 1) * h] = y.astype(o_ref.dtype)


def fused_mrf_phase(x, weights, kernel_sizes, dilations, p, tile=2048,
                    in_phase=False, out_phase=False, post_weights=None,
                    post_k=0, ups_weights=None, ups_w=0, ups_dmin=0,
                    int8_chain=False, act_scales=None, int8_fused=True,
                    split=1, compact=None, ups_used=(), ups_p_in=0,
                    interpret=False):
    """Fused MRF resblock group in phase-p layout.

    x: (B, C, T) standard layout, or (B, p*C, T/p) when ``in_phase`` (the
    producer — e.g. a polyphase upsample — already emitted phase layout,
    so no relayout happens here; the explicit to/from_phase transposes
    cost ~7 ms device at B=8 C=32 T=262144, as much as the kernel win).
    ``out_phase`` keeps the output in phase layout for a phase-aware
    consumer. ``weights`` from :func:`pack_mrf_phase_weights`. Interior
    samples are exact; utterance edges collapse SAME padding across the
    chain like the other fused kernels.

    ``post_weights`` = (Wd_post, b_post) from
    :func:`pack_post_phase_weights` (with ``post_k`` the conv_post kernel
    size) runs the generator tail (lrelu → conv_post → tanh) as an
    in-kernel epilogue; the output is then (B, p*C_out, Tq) in phase
    layout (``out_phase`` controls the final relayout as usual). Callers
    must check :func:`phase_post_feasible` first.

    ``ups_weights`` = (Wb, b) from :func:`pack_ups_phase_weights` (with
    the static ``ups_w``/``ups_dmin`` it returns) makes ``x`` the
    PRE-upsample activation (phase-p_in, same p*C row count) and fuses
    lrelu + the level's transposed-conv upsample as a kernel prologue.

    ``int8_chain`` quantizes the chain convs to int8 (per-output-row
    weight scales, per-tile dynamic activation scales): the banded
    matmuls run s8 x s8 -> s32 on the MXU at 2x the bf16 rate. Residual
    adds, biases, lrelu, and the ups/post prologue/epilogue stay in
    f32/bf16. Expect ~1e-2 relative error on the level output (the
    fast-path quality budget, not the parity budget).

    ``compact`` (default: env DAFT_PHASE_COMPACT, on) stages only the
    structurally-used column C-blocks of each banded operand and
    contracts column-gathered weights against them — the dilation gaps
    (d > p) and p-alignment edges otherwise leave ~27% of staged blocks
    all-zero across the V1 chain. Bit-identical on the int8 paths (s32
    adds of exact zeros); on the bf16 path the MXU regroups partial sums
    (~1e-7 rel). The env default resolves HERE, outside jit, so the
    setting is part of the jit cache key (an env read inside the traced
    body would silently pin the first value seen).
    """
    if compact is None:
        compact = os.environ.get('DAFT_PHASE_COMPACT', '1') != '0'
    return _fused_mrf_phase_jit(
        x, weights, kernel_sizes, dilations, p, tile=tile,
        in_phase=in_phase, out_phase=out_phase, post_weights=post_weights,
        post_k=post_k, ups_weights=ups_weights, ups_w=ups_w,
        ups_dmin=ups_dmin, int8_chain=int8_chain, act_scales=act_scales,
        int8_fused=int8_fused, split=split, compact=bool(compact),
        ups_used=tuple(ups_used), ups_p_in=ups_p_in, interpret=interpret)


@functools.partial(jax.jit, static_argnames=('kernel_sizes', 'dilations',
                                             'p', 'tile', 'in_phase',
                                             'out_phase', 'post_k',
                                             'ups_w', 'ups_dmin',
                                             'int8_chain', 'int8_fused',
                                             'split', 'compact',
                                             'ups_used', 'ups_p_in',
                                             'interpret'))
def _fused_mrf_phase_jit(x, weights, kernel_sizes, dilations, p, tile=2048,
                         in_phase=False, out_phase=False, post_weights=None,
                         post_k=0, ups_weights=None, ups_w=0, ups_dmin=0,
                         int8_chain=False, act_scales=None, int8_fused=True,
                         split=1, compact=True, ups_used=(), ups_p_in=0,
                         interpret=False):
    if in_phase:
        B, PC, Tq = x.shape
        C = PC // p
        xp = x
    else:
        B, C, T = x.shape
        xp = to_phase(x, p)
        Tq = T // p
    nb = len(kernel_sizes)
    if Tq % tile != 0:
        raise ValueError(f'T/p={Tq} not a multiple of tile={tile}')
    halo = phase_chain_halo(kernel_sizes, dilations, p)

    max_w = max(_phase_conv_spec(k, d, p)['W']
                for k, ds in zip(kernel_sizes, dilations) for d in ds)
    chain_max_w = max_w

    q8s = int8_chain and act_scales is not None
    q8f = q8s and int8_fused
    # compact staging applies to every chain mode: the banded matrices
    # keep only their structurally-used column blocks (the gather mirrors
    # the run-merged compact staging in _stage_compact). Bit-identical on
    # the int8 paths; ~1e-7 MXU partial-sum regrouping on bf16.
    kd = [(k, d) for k, ds in zip(kernel_sizes, dilations) for d in ds]

    def _gather(wd, spec):
        if not compact:
            return wd
        cols = [wd[:, jj * C:(jj + 1) * C] for jj in spec['used']]
        return jnp.concatenate(cols, axis=1)

    def _pair_spec(pair):
        """Spec of the ``pair``-th conv in pack order (conv1, conv2 per
        (block, dilation))."""
        k_j, d_j = kd[pair // 2]
        return _phase_conv_spec(k_j, d_j if pair % 2 == 0 else 1, p)

    if q8f:
        # fused boundary (see _requant_lrelu_s32): per dilation
        # [wd1q, inv1, b1_i32, mult1, wd2q, sw2, b2]
        qw = []
        for j in range(0, len(weights), 4):
            wd1, b1, wd2, b2 = weights[j:j + 4]
            wd1f, inv1 = fold_act_scales_band(wd1, act_scales[j // 2],
                                              C, p)
            wq1, sw1 = quantize_rows(wd1f)
            wd2f, inv2 = fold_act_scales_band(wd2, act_scales[j // 2 + 1],
                                              C, p)
            wq2, sw2 = quantize_rows(wd2f)
            b1i, mult1 = _fuse_boundary_consts(sw1, b1, inv2)
            qw += [_gather(wq1, _pair_spec(j // 2)),
                   inv1, b1i, mult1,
                   _gather(wq2, _pair_spec(j // 2 + 1)),
                   sw2, b2.astype(jnp.float32)]
        weights = qw
    elif int8_chain:
        qw = []
        for i in range(0, len(weights), 2):
            wd = weights[i]
            if q8s:
                wd, inv_s = fold_act_scales_band(wd, act_scales[i // 2],
                                                 C, p)
            wq, sw = quantize_rows(wd)
            qw += [_gather(wq, _pair_spec(i // 2)), sw]
            if q8s:
                qw.append(inv_s)
            qw.append(weights[i + 1].astype(jnp.float32))
        weights = qw
    else:
        weights = [_gather(w, _pair_spec(i // 2)) if i % 2 == 0 else w
                   for i, w in enumerate(weights)]

    if post_k:
        if not phase_post_feasible(kernel_sizes, dilations, p, post_k, tile):
            raise ValueError('chain halo too small for conv_post epilogue')
        wd_post, b_post = post_weights
        weights = list(weights) + [wd_post.astype(x.dtype),
                                   b_post.astype(jnp.float32)]
        c_rows = wd_post.shape[0]            # p * C_out
        max_w = max(max_w, _phase_conv_spec(post_k, 1, p)['W'])
    else:
        c_rows = p * C

    halo_in = halo
    ups_base = 0
    ups_spec, ups_cin = None, 0
    if ups_w:
        wb_ups, b_ups = ups_weights
        if wb_ups.shape[0] != p * C:
            raise ValueError('fused upsample requires p_out*C_out == '
                             f'p_in*C_in rows (got {wb_ups.shape[0]} vs '
                             f'{p * C})')
        ups_dmax = ups_dmin + ups_w - 1
        halo_in = -(-max(halo - ups_dmin, halo + ups_dmax) // 128) * 128
        ups_base = halo_in - halo + ups_dmin
        if compact and ups_used and ups_p_in:
            # gather the used C_in column blocks of the ups banded matrix
            # (transposed-conv geometry leaves the rest all-zero) and
            # stage only those, run-merged — same construction as the
            # chain convs with p → p_in, j0 → 0
            ups_cin = (p * C) // ups_p_in
            wb_ups = jnp.concatenate(
                [wb_ups[:, jj * ups_cin:(jj + 1) * ups_cin]
                 for jj in ups_used], axis=1)
            ups_spec = dict(used=tuple(ups_used),
                            runs=_stage_runs_of(tuple(ups_used), 0,
                                                ups_p_in))
        if int8_chain:
            wbq, sw_ups = quantize_rows(wb_ups)
            weights = list(weights) + [wbq, sw_ups,
                                       b_ups.astype(jnp.float32)]
            chain_max_w = max(chain_max_w, ups_w)
        else:
            weights = list(weights) + [wb_ups.astype(x.dtype),
                                       b_ups.astype(jnp.float32)]
        max_w = max(max_w, ups_w)

    xp = jnp.pad(xp, ((0, 0), (0, 0), (halo_in, halo_in)))
    n_tiles = Tq // tile
    if tile % split != 0:
        raise ValueError(f'tile={tile} not divisible by split={split}')

    kernel = functools.partial(
        _fused_mrf_phase_kernel, tile=tile, halo=halo,
        ks=tuple(kernel_sizes), dils=tuple(tuple(d) for d in dilations),
        nb=nb, p=p, C=C, post_k=post_k, ups_w=ups_w, ups_base=ups_base,
        halo_in=halo_in, q8=int8_chain, q8s=q8s and not q8f, q8f=q8f,
        split=split, compact=compact, ups_spec=ups_spec, ups_cin=ups_cin)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda b, t, _n=w.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))

    # split halves get independent stacks (full width: the ups prologue
    # stages into stack[0] at tile+2*halo columns)
    bf16_rows = ((_phase_conv_spec(post_k, 1, p)['W'] if int8_chain
                  else max_w) * p * C)
    scratch = [
        pltpu.VMEM((p * C, tile + 2 * halo_in), x.dtype),
        pltpu.SemaphoreType.DMA,
    ]
    if not int8_chain or post_k:
        # in int8_chain mode the bf16 stack only feeds the conv_post
        # epilogue — sized to the post spec's W
        scratch += [pltpu.VMEM((bf16_rows, tile + 2 * halo), x.dtype)
                    for _ in range(split)]
    if int8_chain:
        scratch += [pltpu.VMEM((chain_max_w * p * C, tile + 2 * halo),
                               jnp.int8) for _ in range(split)]

    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_rows, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c_rows, Tq), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xp, *weights)
    return out if out_phase else from_phase(out, p)


def phase_conv1d(x_p, w, b, p, dilation=1):
    """SAME-padded Conv1d on a phase-p input, staying in phase layout.

    x_p: (B, p*C_in, Q); w: (C_out, C_in, k) torch layout. One banded
    matmul (XLA dot) per the same construction as the fused kernel —
    used for conv_post when the tail chain runs phase-native.
    """
    B, PC, Q = x_p.shape
    C_out, C_in, k = w.shape
    assert PC == p * C_in, (PC, p, C_in)
    spec = _phase_conv_spec(k, dilation, p)
    xpad = jnp.pad(x_p, ((0, 0), (0, 0), (-spec['dmin'], spec['dmax'])))
    taps = jnp.transpose(w, (2, 0, 1))            # (k, out, in)
    if dilation > 1:
        z = jnp.zeros((k, dilation - 1, C_out, C_in), taps.dtype)
        taps = jnp.concatenate([taps[:, None], z], axis=1)
        taps = taps.reshape(k * dilation, C_out, C_in)
        taps = taps[:dilation * (k - 1) + 1]
    band = jnp.transpose(taps, (1, 0, 2)).reshape(
        C_out, (dilation * (k - 1) + 1) * C_in)
    rows = [jnp.pad(band, ((0, 0), (r * C_in, (p - 1 - r) * C_in)))
            for r in range(p)]
    Wd = jnp.concatenate(rows, axis=0).astype(x_p.dtype)
    # contract against the virtual phase stream one shifted slice at a
    # time — a materialized W-fold stacked operand would cost W× the
    # input in HBM writes+reads (≈6 GB per call at B=128 on the tail)
    row0 = spec['j0'] * C_in
    K = spec['kcols'] * C_in
    y = None
    for u in range(spec['W']):
        lo = max(row0, u * PC)
        hi = min(row0 + K, (u + 1) * PC)
        if lo >= hi:
            continue
        xs = xpad[:, lo - u * PC: hi - u * PC, u:u + Q]
        part = jnp.einsum('oc,bcq->boq', Wd[:, lo - row0:hi - row0], xs)
        y = part if y is None else y + part
    return y + jnp.tile(b, p)[None, :, None].astype(y.dtype)


def conv_transpose1d_phase(x_p, w, b, stride, padding, p_in):
    """torch ConvTranspose1d consuming phase-``p_in`` input and emitting
    phase-``stride*p_in`` output — no interleave transposes anywhere.

    x_p: (B, p_in*C_in, U) with x_p[a*C_in+ci, u] = x[ci, p_in*u + a];
    w: (C_in, C_out, k) torch layout. Output (B, p_out*C_out, U) with the
    same column count (p_out = stride*p_in): one stacked-shift einsum.
    Implicit transposed-conv zero padding is exact (matches the
    input-dilated form bit-for-bit up to summation order).
    """
    B, PC, U = x_p.shape
    C_in, C_out, k = w.shape
    assert PC == p_in * C_in
    po = stride * p_in
    Wb, bias, W, dmin = pack_ups_phase_weights(w, b, stride, padding, p_in,
                                               dtype=x_p.dtype)
    dmax = dmin + W - 1
    xpad = jnp.pad(x_p, ((0, 0), (0, 0), (-dmin, dmax)))
    # sum of einsums over shifted slices (see phase_conv1d): avoids
    # materializing the (B, W*p_in*C_in, U) stacked operand in HBM
    pic = p_in * C_in
    y = None
    for u in range(W):
        xs = xpad[:, :, u:u + U]
        part = jnp.einsum('oc,bcq->boq',
                          Wb[:, u * pic:(u + 1) * pic], xs)
        y = part if y is None else y + part
    return y + bias[None, :, :].astype(y.dtype)


def resblock1_reference(x, w1, b1, w2, b2, kernel_size, dilations):
    """Pure-JAX reference (shifted matmuls, zero-padded) for testing."""
    B, T, C = x.shape
    half = (kernel_size - 1) // 2

    def conv(t_in, w, bias, d):
        h = d * half
        xp = jnp.pad(t_in, ((0, 0), (h, h), (0, 0)))
        acc = None
        for tap in range(kernel_size):
            seg = jax.lax.dynamic_slice_in_dim(xp, tap * d, T, axis=1)
            c = jnp.einsum('btc,cd->btd', seg, w[tap],
                           preferred_element_type=jnp.float32)
            acc = c if acc is None else acc + c
        return acc + bias[None, None, :]

    cur = x
    for i, d in enumerate(dilations):
        t = _lrelu(cur)
        t = conv(t, w1[i], b1[i], d)
        t = _lrelu(t)
        t = conv(t, w2[i], b2[i], 1)
        cur = cur + t
    return cur


def pack_resblock_weights(rb_params, n_dil, torch_layout=True):
    """{'convs1_i': {'w','b'}, 'convs2_i': ...} → stacked (n_dil,k,C,C)/(n_dil,C).

    torch kernels are (out, in, k); the matmul form needs (k, in, out).
    """
    def stack(prefix):
        ws, bs = [], []
        for i in range(n_dil):
            w = rb_params[f'{prefix}_{i}']['w']
            if torch_layout:
                w = jnp.transpose(w, (2, 1, 0))       # (k, in, out)
            ws.append(w)
            bs.append(rb_params[f'{prefix}_{i}']['b'])
        return jnp.stack(ws), jnp.stack(bs)

    w1, b1 = stack('convs1')
    w2, b2 = stack('convs2')
    return w1, b1, w2, b2


# ----------------------------------------------------------------------
# Phase-tc MRF kernel: narrow levels, time in sublanes, phases in lanes
# ----------------------------------------------------------------------
#
# The banded phase form reaches full M=128 MXU rows but must STAGE every
# lane-shifted operand through VMEM scratch (Mosaic cannot concatenate
# lane-rotated values) — measured ~34% of the narrow-level int8 kernels'
# runtime even after compact run-merged staging. The phase-tc form keeps
# the p phases x C channels in the 128 LANES and time in SUBLANES, so a
# dilated conv becomes |S| dense (L, 128) @ (128, 128) s8 dots over free
# sublane shifts with ZERO staging:
#
#     y[q, r*C+co] = sum_s  X[q+s, :] @ M_s[:, r*C+co],
#     M_s[a*C+ci, r*C+co] = sum_{t: r + d*(t-half) = p*s + a} w[co, ci, t]
#
# FLOPs grow to sum_s p per conv (V1 mix: 2.92x dense vs the banded
# compact form's 2.14x — the alignment is fixed by conv semantics, so S
# cannot be reduced), but the eliminated staging wins on hardware:
# measured (bench_ptc_probe, B=8) L3 4.57 vs 5.40 ms, L2 5.51 vs 6.14 —
# and the kernels compile ~5x faster (27 s vs 133 s via the tunnel).
# Serving-tier only: int8-static with the fused s32 boundary; the other
# tiers keep the banded kernels.
#
# Layout chaining (the reason this fuses end-to-end with zero relayouts):
# level L1 (tc kernel) emits (B, T1, 128); the L2 upsample consumes it as
# phase-tc p_in=1 and emits (B, T1, 2*64); L3 emits (B, T1, 4*32); the
# fused conv_post epilogue emits (B, T1, 4*1) whose row-major reshape IS
# the waveform.

def _ptc_spec(k, d, p):
    """Shift table of one dilated conv in phase-tc layout (see module
    comment). Empty shifts inside the span (dilation gaps) are skipped —
    compact by construction."""
    half = (k - 1) // 2
    ent = {}
    for r in range(p):
        for t in range(k):
            s_, a = divmod(r + d * (t - half), p)
            ent.setdefault(s_, []).append((a, r, t))
    shifts = tuple(sorted(ent))
    return dict(shifts=shifts, smin=shifts[0], smax=shifts[-1],
                span=shifts[-1] - shifts[0], entries=ent)


def _ptc_band(w, d, p, s_cal, margin=1.1):
    """torch (C_out, C_in, k) -> (S, p*C_in, p*C_out) f32 shift matrices
    with the static per-channel act scales folded into the input rows
    (``s_cal=None``: no fold — the dynamic-scale form); also returns the
    kernel-side activation multiplier (1, p*C_in)."""
    C_out, C_in, k = w.shape
    spec = _ptc_spec(k, d, p)
    if s_cal is None:
        s = jnp.ones((C_in,), jnp.float32)
    else:
        s = jnp.maximum(jnp.asarray(s_cal, jnp.float32),
                        1e-30) * margin / 127.0           # (C_in,)
    wf = jnp.transpose(w, (1, 0, 2)).astype(jnp.float32) \
        * s[:, None, None]                                # (ci, co, k)
    M = jnp.zeros((len(spec['shifts']), p * C_in, p * C_out), jnp.float32)
    for si, s_ in enumerate(spec['shifts']):
        for (a, r, t) in spec['entries'][s_]:
            M = M.at[si, a * C_in:(a + 1) * C_in,
                     r * C_out:(r + 1) * C_out].add(wf[:, :, t])
    inv = jnp.tile(1.0 / s, p)[None, :]
    return M, inv, spec


def _ptc_quant(M):
    """Joint per-output-column s8 quantization across the shift matrices
    (they accumulate into one s32 sum, so they must share scales)."""
    amax = jnp.max(jnp.abs(M), axis=(0, 1))
    sw = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.round(M / sw[None, None, :]).astype(jnp.int8)
    return q, sw[None, :].astype(jnp.float32)


def pack_mrf_ptc_weights(params, level, kernel_sizes, dilations, p,
                         act_scales=None, margin=1.1):
    """One level's resblocks -> phase-tc int8 weights.

    With ``act_scales`` (the level's [(s1, s2) per block] calibration
    entry): static form — per (block, dilation) [W1 (S1,128,128) s8,
    inv1, b1i, m1, W2 (S2,128,128) s8, sw2, b2] with (1, 128) row vectors
    and the conv1->conv2 boundary folded into the integer domain
    (:func:`_requant_lrelu_s32`). Without: dynamic form — per
    (block, dilation) [W1, sw1, b1, W2, sw2, b2]; the kernel quantizes
    activations with a per-tile dynamic scale."""
    out = []
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        rb = params[f'resblock_{level}_{j}']
        s1_cal, s2_cal = act_scales[j] if act_scales is not None \
            else (None, None)
        for i, d in enumerate(dils):
            w1 = rb[f'convs1_{i}']['w']
            b1 = rb[f'convs1_{i}']['b']
            w2 = rb[f'convs2_{i}']['w']
            b2 = rb[f'convs2_{i}']['b']
            b1t = jnp.tile(b1, p)[None, :].astype(jnp.float32)
            b2t = jnp.tile(b2, p)[None, :].astype(jnp.float32)
            if act_scales is None:
                M1, _, _ = _ptc_band(w1, d, p, None, margin)
                M2, _, _ = _ptc_band(w2, 1, p, None, margin)
                q1, sw1 = _ptc_quant(M1)
                q2, sw2 = _ptc_quant(M2)
                out += [q1, sw1, b1t, q2, sw2, b2t]
                continue
            M1, inv1, _ = _ptc_band(w1, d, p, s1_cal[i], margin)
            M2, inv2, _ = _ptc_band(w2, 1, p, s2_cal[i], margin)
            q1, sw1 = _ptc_quant(M1)
            q2, sw2 = _ptc_quant(M2)
            b1i, m1 = _fuse_boundary_consts(sw1, b1t, inv2)
            out += [q1, inv1, b1i, m1, q2, sw2, b2t]
    return out


def pack_mrf_ptc_f_weights(params, level, kernel_sizes, dilations, p,
                           dtype=jnp.bfloat16):
    """One level's resblocks -> phase-tc FLOAT weights (the bf16 serving
    tier's form of :func:`pack_mrf_ptc_weights`): per (block, dilation)
    [W1 (S1, p*C, p*C) ``dtype``, b1 (1, p*C) f32, W2, b2] — the same
    shift matrices as the int8 packer, unquantized."""
    out = []
    for j, (k, dils_) in enumerate(zip(kernel_sizes, dilations)):
        rb = params[f'resblock_{level}_{j}']
        for i, d in enumerate(dils_):
            M1, _, _ = _ptc_band(rb[f'convs1_{i}']['w'], d, p, None)
            M2, _, _ = _ptc_band(rb[f'convs2_{i}']['w'], 1, p, None)
            out += [M1.astype(dtype),
                    jnp.tile(rb[f'convs1_{i}']['b'],
                             p)[None, :].astype(jnp.float32),
                    M2.astype(dtype),
                    jnp.tile(rb[f'convs2_{i}']['b'],
                             p)[None, :].astype(jnp.float32)]
    return out


def pack_ups_ptc_f_weights(w, b, stride, padding, p_in,
                           dtype=jnp.bfloat16):
    """Float form of :func:`pack_ups_ptc_weights`:
    (U (S, p_in*C_in, po*C_out) ``dtype``, bias (1, po*C_out) f32,
    shifts tuple) — the bf16 tier's fused-ups prologue weights."""
    C_in, C_out, k = w.shape
    entries, dmin, dmax = _ups_phase_entries(k, stride, padding, p_in)
    po = stride * p_in
    shifts = tuple(sorted({d for *_, d in entries}))
    sidx = {s_: i for i, s_ in enumerate(shifts)}
    U = jnp.zeros((len(shifts), p_in * C_in, po * C_out), jnp.float32)
    wf = w.astype(jnp.float32)
    for (r, j, a, d) in entries:
        U = U.at[sidx[d], a * C_in:(a + 1) * C_in,
                 r * C_out:(r + 1) * C_out].add(wf[:, :, j])
    bias = jnp.tile(b, po)[None, :].astype(jnp.float32)
    return U.astype(dtype), bias, shifts


def pack_ups_ptc_weights(w, b, stride, padding, p_in):
    """ConvTranspose1d (torch (C_in, C_out, k)) -> phase-tc prologue
    weights: (Uq (S, p_in*C_in, po*C_out) s8, sw (1, po*C_out),
    bias (1, po*C_out), shifts tuple). The activation uses a dynamic
    per-tile scale (no calibration entry exists for the ups input),
    matching the banded kernels' fused-ups int8 semantics."""
    C_in, C_out, k = w.shape
    entries, dmin, dmax = _ups_phase_entries(k, stride, padding, p_in)
    po = stride * p_in
    shifts = tuple(sorted({d for *_, d in entries}))
    sidx = {s_: i for i, s_ in enumerate(shifts)}
    U = jnp.zeros((len(shifts), p_in * C_in, po * C_out), jnp.float32)
    wf = w.astype(jnp.float32)
    for (r, j, a, d) in entries:
        U = U.at[sidx[d], a * C_in:(a + 1) * C_in,
                 r * C_out:(r + 1) * C_out].add(wf[:, :, j])
    Uq, sw = _ptc_quant(U)
    bias = jnp.tile(b, po)[None, :].astype(jnp.float32)
    return Uq, sw, bias, shifts


def pack_post_ptc_weights(w, b, p, dtype=jnp.float32):
    """conv_post (torch (C_out, C_in, k), d=1) -> phase-tc epilogue
    weights (P (S, p*C_in, p*C_out) in ``dtype``, bias (1, p*C_out) f32,
    post_k). The epilogue runs on the f32 accumulator at full precision
    (its FLOPs are negligible)."""
    C_out, C_in, k = w.shape
    spec = _ptc_spec(k, 1, p)
    P = jnp.zeros((len(spec['shifts']), p * C_in, p * C_out), jnp.float32)
    wf = jnp.transpose(w, (1, 0, 2)).astype(jnp.float32)
    for si, s_ in enumerate(spec['shifts']):
        for (a, r, t) in spec['entries'][s_]:
            P = P.at[si, a * C_in:(a + 1) * C_in,
                     r * C_out:(r + 1) * C_out].add(wf[:, :, t])
    return P.astype(dtype), jnp.tile(b, p)[None, :].astype(jnp.float32), k


def ptc_chain_halo(kernel_sizes, dilations, p):
    """Per-side halo in phase-tc rows for the fused chain, 64-aligned."""
    worst = 0
    for k, dils in zip(kernel_sizes, dilations):
        tot = sum(_ptc_spec(k, d, p)['span'] + _ptc_spec(k, 1, p)['span']
                  for d in dils)
        worst = max(worst, tot)
    return -(-worst // 64) * 64


def _ptc_chain_geometry(kernel_sizes, dilations, p, tile, halo):
    """Static per-block (off, cur_len) after the fused chain."""
    geo = []
    for k, dils in zip(kernel_sizes, dilations):
        off, cur_len = 0, tile + 2 * halo
        for d in dils:
            sp1 = _ptc_spec(k, d, p)
            sp2 = _ptc_spec(k, 1, p)
            off += -sp1['smin'] - sp2['smin']
            cur_len -= sp1['span'] + sp2['span']
        geo.append((off, cur_len))
    return geo


def ptc_post_feasible(kernel_sizes, dilations, p, post_k, tile):
    """True when the chain halo leaves enough margin for the conv_post
    epilogue window."""
    halo = ptc_chain_halo(kernel_sizes, dilations, p)
    sp = _ptc_spec(post_k, 1, p)
    for off, cur_len in _ptc_chain_geometry(kernel_sizes, dilations, p,
                                            tile, halo):
        start = halo + sp['smin'] - off
        if start < 0 or start + tile + sp['span'] > cur_len:
            return False
    return True


def _fused_mrf_ptc_kernel(x_hbm, *refs, tile, halo, ks, dils, p,
                          post_k=0, ups_shifts=(), ups_base=0, halo_in=0,
                          dyn=False, fdot=False):
    """Phase-tc MRF fusion (int8-static, per-tile dynamic scales with
    ``dyn``, or unquantized bf16/f32 dots with ``fdot``). x_hbm:
    (B, rows + 2*halo_in, p_in*C_in) in HBM; refs = per-(block, dilation)
    7 (static) / 6 (dyn) / 4 (fdot) chain refs [+ P, b_post when post_k]
    [+ Uq, sw_u, b_u — or U, b_u under fdot — when ups_shifts] + o_ref +
    x_scratch + sem. No staging scratch: every tap shift is a sublane
    slice."""
    n_w = (4 if fdot else 6 if dyn else 7) * sum(len(d) for d in dils)
    n_post = 2 if post_k else 0
    n_ups = (2 if fdot else 3) if ups_shifts else 0
    base = n_w + n_post + n_ups
    o_ref = refs[base]
    x_scratch = refs[base + 1]
    sem = refs[base + 2]
    b = pl.program_id(0)
    t = pl.program_id(1)

    hin = halo_in if ups_shifts else halo
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + 2 * hin), :], x_scratch, sem)
    copy.start()
    copy.wait()

    sp_post = _ptc_spec(post_k, 1, p) if post_k else None
    ext = sp_post['span'] if post_k else 0
    a0 = sp_post['smin'] if post_k else 0

    if ups_shifts:
        L0 = tile + 2 * halo
        xin_f = _lrelu(x_scratch[:].astype(jnp.float32))
        usmin = ups_shifts[0]
        if fdot:
            U, b_u = refs[n_w + n_post:n_w + n_post + 2]
            ux = xin_f.astype(U.dtype)
            acc = None
            for si, s_ in enumerate(ups_shifts):
                seg = ux[ups_base + (s_ - usmin):
                         ups_base + (s_ - usmin) + L0]
                c = jnp.dot(seg, U[si],
                            preferred_element_type=jnp.float32)
                acc = c if acc is None else acc + c
            x0 = acc + b_u[:]
        else:
            Uq, sw_u, b_u = refs[n_w + n_post:n_w + n_post + 3]
            qx, sx = _quantize_dynamic(xin_f)
            acc = None
            for si, s_ in enumerate(ups_shifts):
                seg = qx[ups_base + (s_ - usmin):
                         ups_base + (s_ - usmin) + L0]
                c = jnp.dot(seg, Uq[si],
                            preferred_element_type=jnp.int32)
                acc = c if acc is None else acc + c
            x0 = acc.astype(jnp.float32) * (sw_u[:] * sx) + b_u[:]
    else:
        x0 = x_scratch[:].astype(jnp.float32)     # (tile + 2*halo, p*C)

    def conv_band(q_in, W_ref, sp, L_out, pref):
        acc = None
        for si, s_ in enumerate(sp['shifts']):
            seg = q_in[s_ - sp['smin']: s_ - sp['smin'] + L_out]
            c = jnp.dot(seg, W_ref[si], preferred_element_type=pref)
            acc = c if acc is None else acc + c
        return acc

    def conv_q8(q_in, W_ref, sp, L_out):
        return conv_band(q_in, W_ref, sp, L_out, jnp.int32)

    acc_out = None
    ref_idx = 0
    for blk, k in enumerate(ks):
        cur = x0
        cur_len = tile + 2 * halo
        off = 0
        for d in dils[blk]:
            sp1 = _ptc_spec(k, d, p)
            sp2 = _ptc_spec(k, 1, p)
            L1 = cur_len - sp1['span']
            L2 = L1 - sp2['span']
            if fdot:
                W1, b1, W2, b2 = refs[ref_idx:ref_idx + 4]
                ref_idx += 4
                a_in = _lrelu(cur).astype(W1.dtype)
                acc1 = conv_band(a_in, W1, sp1, L1, jnp.float32)
                a1 = acc1 + b1[:]
                a_mid = _lrelu(a1).astype(W2.dtype)
                acc2 = conv_band(a_mid, W2, sp2, L2, jnp.float32)
                a2 = acc2 + b2[:]
            elif dyn:
                W1, sw1, b1, W2, sw2, b2 = refs[ref_idx:ref_idx + 6]
                ref_idx += 6
                q_in, sx1 = _quantize_dynamic(_lrelu(cur))
                acc1 = conv_q8(q_in, W1, sp1, L1)
                a1 = acc1.astype(jnp.float32) * (sw1[:] * sx1) + b1[:]
                q_mid, sx2 = _quantize_dynamic(_lrelu(a1))
                acc2 = conv_q8(q_mid, W2, sp2, L2)
                a2 = acc2.astype(jnp.float32) * (sw2[:] * sx2) + b2[:]
            else:
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
        start = halo + a0 - off
        win = cur[start: start + tile + ext]
        acc_out = win if acc_out is None else acc_out + win
    acc_out = acc_out * (1.0 / len(ks))
    if post_k:
        P, b_post = refs[n_w:n_w + 2]
        t_in = _lrelu(acc_out).astype(P.dtype)
        y = None
        for si, s_ in enumerate(sp_post['shifts']):
            seg = t_in[s_ - sp_post['smin']: s_ - sp_post['smin'] + tile]
            c = jnp.dot(seg, P[si], preferred_element_type=jnp.float32)
            y = c if y is None else y + c
        o_ref[0, :, :] = jnp.tanh(y + b_post[:]).astype(o_ref.dtype)
    else:
        o_ref[0, :, :] = acc_out.astype(o_ref.dtype)


def fused_mrf_ptc(x, weights, kernel_sizes, dilations, p, tile=8192,
                  post_weights=None, post_k=0, ups_weights=None,
                  ups_shifts=(), dyn=False, fdot=False, interpret=False):
    """Fused MRF resblock group in phase-tc layout — the int8-static
    serving kernel for the narrow (C*p == 128) levels; ``fdot`` runs the
    same form with unquantized bf16/f32 dots (weights from
    :func:`pack_mrf_ptc_f_weights` / :func:`pack_ups_ptc_f_weights`) for
    the bf16 serving tier.

    x: (B, rows, 128). Without ``ups_weights``, rows = T/p and the lanes
    hold this level's p phases x C channels. With ``ups_weights`` =
    (Uq, sw, bias) + static ``ups_shifts`` from
    :func:`pack_ups_ptc_weights`, x is the PRE-upsample activation
    (phase-tc p_in with p_in*C_in == 128 lanes, same row count) and
    lrelu + the transposed-conv upsample run as an in-kernel prologue.
    ``post_weights`` = (P, bias) + static ``post_k`` from
    :func:`pack_post_ptc_weights` fuses lrelu -> conv_post -> tanh as the
    epilogue; the output is then (B, rows, p*C_out_post) whose row-major
    reshape is the waveform. ``weights`` from
    :func:`pack_mrf_ptc_weights`. Matches the banded int8-static kernel
    to f32-epilogue ULP (the s32 dot sums are exact integers; the f32
    dequant/bias epilogues may FMA differently between the two compiled
    graphs — observed rel ~2e-5 on the full chain, and bit-identical at
    the bench_ptc_probe config); utterance edges collapse SAME padding
    across the chain like every fused kernel here.
    """
    return _fused_mrf_ptc_jit(x, weights, kernel_sizes, dilations, p,
                              tile=tile, post_weights=post_weights,
                              post_k=post_k, ups_weights=ups_weights,
                              ups_shifts=tuple(ups_shifts), dyn=bool(dyn),
                              fdot=bool(fdot), interpret=interpret)


@functools.partial(jax.jit, static_argnames=('kernel_sizes', 'dilations',
                                             'p', 'tile', 'post_k',
                                             'ups_shifts', 'dyn', 'fdot',
                                             'interpret'))
def _fused_mrf_ptc_jit(x, weights, kernel_sizes, dilations, p, tile=8192,
                       post_weights=None, post_k=0, ups_weights=None,
                       ups_shifts=(), dyn=False, fdot=False,
                       interpret=False):
    B, rows, lanes = x.shape
    halo = ptc_chain_halo(kernel_sizes, dilations, p)
    if rows % tile != 0:
        raise ValueError(f'rows={rows} not a multiple of tile={tile}')
    weights = list(weights)

    if post_weights is not None:
        P, b_post = post_weights
        if not ptc_post_feasible(kernel_sizes, dilations, p, post_k, tile):
            raise ValueError('chain halo too small for conv_post epilogue')
        weights += [P, b_post]
        c_rows = P.shape[2]
    else:
        post_k = 0
        c_rows = lanes

    halo_in = halo
    ups_base = 0
    if ups_weights is None:
        ups_shifts = ()
    else:
        usmin, usmax = ups_shifts[0], ups_shifts[-1]
        halo_in = -(-max(halo - usmin, halo + usmax) // 64) * 64
        ups_base = halo_in - halo + usmin
        weights += list(ups_weights)   # (Uq, sw, b) int8 / (U, b) fdot

    xpad = jnp.pad(x, ((0, 0), (halo_in, halo_in), (0, 0)))
    kernel = functools.partial(
        _fused_mrf_ptc_kernel, tile=tile, halo=halo,
        ks=tuple(kernel_sizes), dils=tuple(tuple(d) for d in dilations),
        p=p, post_k=post_k, ups_shifts=tuple(ups_shifts),
        ups_base=ups_base, halo_in=halo_in, dyn=dyn, fdot=fdot)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda b, t, _n=w.ndim: (0,) * _n),
            memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(B, rows // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c_rows), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, c_rows), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo_in, lanes), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xpad, *weights)
