"""Probe: int8 MXU matmul feasibility in Pallas on this TPU.

Checks, in order of risk:
  1. plain int8 x int8 -> int32 dot compiles
  2. lane-shifted slices of an int8 VALUE feed the MXU (the op the fused
     phase/ct vocoder kernels need for tap shifts)
  3. in-kernel f32 -> int8 quantization (round + cast) cost

CAVEAT (measured 2026-08): the reported T(FL)OP/s here is NOT the MXU
rate — slicing a big VMEM value per rep measures the materialized-copy
cost, so all variants read ~7 T/s while the real fused kernels sustain
~123 T/s effective. Use this probe only for does-it-compile answers; rate
comparisons belong in scripts/bench_phase_kernel.py (real kernel
structure), where int8 measures ~6% (phase, C=32) to ~14% (ct, C=128)
faster than bf16 — far from the 2x TOPS ratio.

Run on the real chip:  python scripts/bench_int8_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, L = 128, 128, 2048
REPS = 64          # matmuls per kernel invocation (amortize dispatch)
W = 4              # shifted-slice count for probe 2


def _mm_kernel_bf16(x_ref, w_ref, o_ref):
    acc = jnp.zeros((M, L), jnp.float32)
    for r in range(REPS):
        acc += jnp.dot(w_ref[:], x_ref[:, r:r + L],
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc


def _mm_kernel_int8(x_ref, w_ref, o_ref):
    acc = jnp.zeros((M, L), jnp.int32)
    for r in range(REPS):
        acc += jnp.dot(w_ref[:], x_ref[:, r:r + L],
                       preferred_element_type=jnp.int32)
    o_ref[:] = acc


def _mm_kernel_int8_shift(x_ref, w_ref, o_ref):
    # one quantize + W lane-shifted slices of the int8 VALUE per rep
    acc = jnp.zeros((M, L), jnp.int32)
    xv = x_ref[:]
    for r in range(REPS // W):
        for u in range(W):
            acc += jnp.dot(w_ref[:], xv[:, r * W + u: r * W + u + L],
                           preferred_element_type=jnp.int32)
    o_ref[:] = acc


def _mm_kernel_int8_quant(x_ref, w_ref, o_ref):
    # f32 input; quantize once then REPS int8 dots
    acc = jnp.zeros((M, L), jnp.int32)
    xv = x_ref[:]
    amax = jnp.maximum(jnp.max(jnp.abs(xv)), 1e-30)
    q = jnp.round(xv * (127.0 / amax)).astype(jnp.int8)
    for r in range(REPS):
        acc += jnp.dot(w_ref[:], q[:, r:r + L],
                       preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * (amax / 127.0))


def run(name, kernel, x, w, out_dtype):
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, L), out_dtype),
    )
    f = jax.jit(functools.partial(f))
    try:
        r = f(x, w)
        s0 = float(jnp.sum(jnp.abs(r.astype(jnp.float32))))  # sync
    except Exception as e:
        print(f'{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}')
        return None
    n_iter = 50
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(x, w) for _ in range(n_iter)]
        tot = float(sum(jnp.sum(jnp.abs(o.astype(jnp.float32)))
                        for o in outs[-1:]))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    flops = 2 * M * K * L * REPS * n_iter
    print(f'{name:24s} {best*1e3/n_iter:8.3f} ms/call   '
          f'{flops/best/1e12:7.2f} T(FL)OP/s   checksum={s0:.3e}')
    return best


def main():
    dev = jax.devices()[0]
    print('device:', dev)
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(M, L + REPS), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 128, (M, L + REPS)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    xf = jnp.asarray(rng.randn(M, L + REPS), jnp.float32)

    run('bf16 dot', _mm_kernel_bf16, xb, wb, jnp.float32)
    run('int8 dot', _mm_kernel_int8, xi, wi, jnp.int32)
    run('int8 shifted-slice dot', _mm_kernel_int8_shift, xi, wi, jnp.int32)
    run('int8 quant+dot', _mm_kernel_int8_quant, xf, wi, jnp.float32)


if __name__ == '__main__':
    main()
