"""Fused self-attention Pallas kernel (whole-row, in-VMEM, TPU).

The FFT-block attention (reference: src/daft_exprt/model.py:153-193 uses
torch.nn.MultiheadAttention) operates on short sequences (frame buckets
T <= 2048, d_head 64), so per (batch, head) the ENTIRE (T, T) score matrix
fits in VMEM — no streaming flash decomposition needed. The XLA path
materializes logits/softmax/dropout-mask as (B, h, T, T) HBM tensors
several times in forward and stores them for backward; this kernel does
logits -> mask -> softmax -> dropout -> @V in one VMEM pass per query
block, generates the dropout mask with the on-core PRNG
(pltpu.prng_random_bits — dropout-mask generation measured as ~60% of a
train step under the default threefry path), and the custom VJP recomputes
everything in VMEM instead of storing any (T, T) residual.

HBM traffic per (b, h): read q,k,v + write o (+ the same again in bwd) —
vs ~10 full (T, T) f32 round trips for the XLA lowering.

Numerics match the XLA path in modules.MultiHeadSelfAttention: f32 logits
(q pre-scaled by sm_scale), key-side -1e9 masking, f32 softmax, weights
cast to the value dtype for the PV matmul.

Dropout bits are a deterministic function of (seed, b, h, q-block), so the
backward pass regenerates the identical mask, and finite-difference checks
of the VJP are exact (scripts/bench_attention.py --check).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_attention']


def _q_block(T):
    """Largest q-block that divides T with (bq, T) f32 logits <= 2 MB —
    bounds VMEM for logits + random bits + backward intermediates across
    every length/frame bucket (64..2048)."""
    for bq in (512, 384, 256, 192, 128, 96, 64):
        if T % bq == 0 and bq * T * 4 <= 2 * 1024 * 1024:
            return bq
    return T


def _scores(q_ref, k_ref, length, sm_scale, bq, T):
    """(bq, T) f32 masked logits for the current q block."""
    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 1)
    return jnp.where(col < length, s, -1e9)


def _softmax(s):
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _keep_mask(scal_ref, b, h, qi, shape, drop_thr):
    """Regenerable dropout keep-mask: uint32 stream >= threshold.

    Mosaic's prng_seed takes at most 2 seed words, so (b, h, qi) is
    folded into one distinct int32 per grid cell."""
    cell = (b * pl.num_programs(1) + h) * pl.num_programs(2) + qi
    pltpu.prng_seed(scal_ref[0], cell)
    bits = pltpu.prng_random_bits(shape)
    return jax.lax.bitcast_convert_type(bits, jnp.uint32) >= \
        jnp.uint32(drop_thr)


def _fwd_kernel(scal_ref, q_ref, k_ref, v_ref, o_ref, *,
                sm_scale, drop_thr, keep_scale, bq, T):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    p = _softmax(_scores(q_ref, k_ref, scal_ref[1 + b], sm_scale, bq, T))
    if drop_thr:
        keep = _keep_mask(scal_ref, b, h, qi, (bq, T), drop_thr)
        p = jnp.where(keep, p * keep_scale, 0.0)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                    preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(scal_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *,
                sm_scale, drop_thr, keep_scale, bq, T):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    p = _softmax(_scores(q_ref, k_ref, scal_ref[1 + b], sm_scale, bq, T))
    do = do_ref[0, 0].astype(jnp.float32)
    if drop_thr:
        keep = _keep_mask(scal_ref, b, h, qi, (bq, T), drop_thr)
        pd = jnp.where(keep, p * keep_scale, 0.0)
    else:
        pd = p
    # o = cast_bf16(pd) @ v ; the cast is identity for grads
    pd_cast = pd.astype(v_ref.dtype)
    dv = jax.lax.dot_general(pd_cast, do_ref[0, 0], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # (T, D)
    dpd = jax.lax.dot_general(do, v_ref[0, 0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (bq, T)
    if drop_thr:
        dp = jnp.where(keep, dpd * keep_scale, 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))         # (bq, T)
    ds_cast = ds.astype(q_ref.dtype)
    dq = jax.lax.dot(ds_cast, k_ref[0, 0],
                     preferred_element_type=jnp.float32) * sm_scale
    dk = jax.lax.dot_general(ds_cast, q_ref[0, 0], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    # dk/dv accumulate across the (innermost) q-block grid dimension; the
    # output block index ignores qi so the block stays resident in VMEM
    @pl.when(qi == 0)
    def _init():
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(qi > 0)
    def _acc():
        dk_ref[0, 0] += dk.astype(dk_ref.dtype)
        dv_ref[0, 0] += dv.astype(dv_ref.dtype)


def _scalars(lengths, seed):
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return jnp.concatenate([seed, lengths.astype(jnp.int32)])


def _specs(B, H, T, D, bq):
    # index maps receive the scalar-prefetch ref as a trailing argument
    q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, qi, *_: (b, h, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, T, D), lambda b, h, qi, *_: (b, h, 0, 0))
    return q_spec, kv_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, lengths, seed=0, dropout_p=0.0,
                    interpret=False):
    """softmax(q @ k^T, key-masked) [dropout] @ v, fused on-chip.

    q, k, v: (B, H, T, D); q already scaled by D**-0.5 (matching
    modules.MultiHeadSelfAttention). lengths: (B,) valid key counts.
    seed: int32 scalar (traced ok) — dropout bits are a pure function of
    (seed, b, h, q_block). dropout_p: static python float.
    """
    out, _ = _fused_attention_fwd(q, k, v, lengths, seed, dropout_p,
                                  interpret)
    return out


def _thr(dropout_p):
    if not dropout_p:
        return 0, 1.0
    thr = int(round(dropout_p * 4294967296.0))
    keep = 1.0 - thr / 4294967296.0
    return thr, 1.0 / keep


def _fused_attention_fwd(q, k, v, lengths, seed, dropout_p, interpret):
    B, H, T, D = q.shape
    bq = _q_block(T)
    drop_thr, keep_scale = _thr(dropout_p)
    q_spec, kv_spec = _specs(B, H, T, D, bq)
    kernel = functools.partial(_fwd_kernel, sm_scale=1.0,
                               drop_thr=drop_thr, keep_scale=keep_scale,
                               bq=bq, T=T)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, T // bq),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(_scalars(lengths, seed), q, k, v)
    return out, (q, k, v, lengths, seed)


def _fused_attention_bwd(dropout_p, interpret, res, do):
    q, k, v, lengths, seed = res
    B, H, T, D = q.shape
    bq = _q_block(T)
    drop_thr, keep_scale = _thr(dropout_p)
    q_spec, kv_spec = _specs(B, H, T, D, bq)
    kv_out_spec = pl.BlockSpec((1, 1, T, D),
                               lambda b, h, qi, *_: (b, h, 0, 0))
    kernel = functools.partial(_bwd_kernel, sm_scale=1.0,
                               drop_thr=drop_thr, keep_scale=keep_scale,
                               bq=bq, T=T)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, T // bq),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=[q_spec, kv_out_spec, kv_out_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        interpret=interpret,
    )(_scalars(lengths, seed), q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None, None


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
