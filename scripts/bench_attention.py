"""Fused-attention kernel: on-device validation + microbenchmark.

--check validates what the CPU tests cannot (the in-kernel PRNG has no
interpret-mode lowering): dropout determinism in the seed, keep-rate,
expectation preservation, and a finite-difference probe of the custom VJP
(dropout bits are a pure function of (seed, b, h, q-block), so directional
derivatives through the fixed mask are well-defined).

Usage: python scripts/bench_attention.py [--check] [--frames 1024]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--heads', type=int, default=2)
    ap.add_argument('--frames', type=int, default=1024)
    ap.add_argument('--dhead', type=int, default=64)
    ap.add_argument('--dropout', type=float, default=0.1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.attention_kernels import fused_attention

    B, H, T, D = args.batch, args.heads, args.frames, args.dhead
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32)) * D ** -0.5
    k = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    lengths = jnp.asarray(
        rng.randint(max(1, T // 2), T + 1, size=(B,)), jnp.int32)
    print(f'device={jax.devices()[0]} B={B} H={H} T={T} D={D}', flush=True)

    def xla_path(q, k, v):
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                       preferred_element_type=jnp.float32)
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        s = jnp.where(mask[:, None, None, :], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v)

    if args.check:
        p_drop = args.dropout
        fused = jax.jit(functools.partial(fused_attention, dropout_p=0.0))
        o_ref = np.asarray(jax.jit(xla_path)(q, k, v))
        o_ker = np.asarray(fused(q, k, v, lengths, 0))
        err = np.abs(o_ref - o_ker).max()
        # on TPU both paths run f32 matmuls as default-precision MXU
        # (bf16-multiply) passes with different reduction orders — ~1e-4
        # max diff at T=1024 is expected numerics, not a kernel bug; the
        # math is proven bit-exact in interpret mode by the CPU tests
        tol = 1e-5 if jax.devices()[0].platform == 'cpu' else 1e-3
        print(f'no-dropout parity max err: {err:.2e} (tol {tol})', flush=True)
        assert err < tol

        fd = jax.jit(functools.partial(fused_attention, dropout_p=p_drop))
        o1 = np.asarray(fd(q, k, v, lengths, 123))
        o2 = np.asarray(fd(q, k, v, lengths, 123))
        o3 = np.asarray(fd(q, k, v, lengths, 124))
        assert (o1 == o2).all(), 'same seed must give identical outputs'
        assert (o1 != o3).any(), 'different seed must give different masks'
        print('dropout determinism in seed: ok', flush=True)

        # expectation preservation: average over seeds approaches the
        # no-dropout output
        acc = np.zeros_like(o_ker)
        n_seeds = 64
        for s in range(n_seeds):
            acc += np.asarray(fd(q, k, v, lengths, 1000 + s))
        rel = (np.abs(acc / n_seeds - o_ker).mean()
               / np.abs(o_ker).mean())
        print(f'E[dropout(o)] vs o rel err over {n_seeds} seeds: '
              f'{rel:.3f}', flush=True)
        assert rel < 0.15

        # dropout-VJP validation at a small shape (a big-shape FD probe is
        # swamped by f32 reduction noise: loss ~2e3, signal 2eps*g.u ~1e-4).
        # The mask is a pure function of (seed, b, h, q-block) and the
        # SHAPES, not the values: q=0 makes the softmax uniform over valid
        # keys, so one-hot v columns read pd = keep*keep_scale/len out of
        # the kernel exactly. XLA autodiff with that extracted mask must
        # then match the kernel VJP — which also proves the BWD kernel
        # regenerates the identical mask.
        # Ts=768 -> bq=384: two q blocks, exercising per-block mask
        # regeneration and the dk/dv accumulation in the bwd kernel
        Bs, Hs, Ts, seed_s = 2, 2, 768, 11
        qs = jnp.asarray(rng.randn(Bs, Hs, Ts, D).astype(np.float32)) \
            * D ** -0.5
        ks = jnp.asarray(rng.randn(Bs, Hs, Ts, D).astype(np.float32))
        vs = jnp.asarray(rng.randn(Bs, Hs, Ts, D).astype(np.float32))
        ls = jnp.asarray([Ts, Ts * 2 // 3][:Bs], jnp.int32)
        fds = jax.jit(functools.partial(fused_attention, dropout_p=p_drop))

        pd = np.zeros((Bs, Hs, Ts, Ts), np.float32)
        q0 = jnp.zeros_like(qs)
        for g_ in range(Ts // D):
            v_onehot = np.zeros((Ts, D), np.float32)
            for kk in range(g_ * D, (g_ + 1) * D):
                v_onehot[kk, kk % D] = 1.0
            v_b = jnp.broadcast_to(jnp.asarray(v_onehot),
                                   (Bs, Hs, Ts, D))
            o_g = np.asarray(fds(q0, ks, v_b, ls, seed_s))
            pd[..., g_ * D:(g_ + 1) * D] = o_g
        keep = jnp.asarray(pd > 0)
        keep_rate = float(jnp.mean(keep[0, 0, :, :int(ls[0])]))
        print(f'extracted keep rate {keep_rate:.3f} '
              f'(expect ~{1 - p_drop:.2f})', flush=True)
        assert abs(keep_rate - (1 - p_drop)) < 0.02
        keep_scale = 1.0 / (1.0 - p_drop)

        def xla_masked(q_, k_, v_, l_, keep_):
            s = jnp.einsum('bhqd,bhkd->bhqk', q_, k_,
                           preferred_element_type=jnp.float32)
            m = jnp.arange(Ts)[None, :] < l_[:, None]
            s = jnp.where(m[:, None, None, :], s, -1e9)
            p = jax.nn.softmax(s, axis=-1)
            p = jnp.where(keep_, p * keep_scale, 0.0)
            return jnp.einsum('bhqk,bhkd->bhqd', p.astype(v_.dtype), v_)

        g_ker = jax.jit(jax.grad(
            lambda q_, k_, v_: jnp.sum(
                fused_attention(q_, k_, v_, ls, seed_s, p_drop) ** 2),
            argnums=(0, 1, 2)))(qs, ks, vs)
        g_xla = jax.jit(jax.grad(
            lambda q_, k_, v_: jnp.sum(
                xla_masked(q_, k_, v_, ls, keep) ** 2),
            argnums=(0, 1, 2)))(qs, ks, vs)
        for name, a, b in zip('qkv', g_ker, g_xla):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(b).max()
            rel = np.abs(a - b).max() / denom
            cos = float(np.vdot(a, b)
                        / (np.linalg.norm(a) * np.linalg.norm(b)))
            print(f'd{name}: max rel err {rel:.2e} cosine {cos:.6f}',
                  flush=True)
            assert rel < 2e-3 and cos > 0.99999
        print('CHECK PASSED', flush=True)
        return

    # --- microbenchmark: fwd+bwd, XLA vs fused, bf16 ---
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

    def time_fn(name, f, *xs):
        float(f(*xs))
        for rep in range(3):
            t0 = time.perf_counter()
            accs = [f(*xs) for _ in range(10)]
            s = float(sum(accs))
            dt = (time.perf_counter() - t0) / 10
        print(f'{name:28s} {dt * 1e3:7.2f} ms', flush=True)

    @jax.jit
    def xla_fwdbwd(q, k, v):
        g = jax.grad(lambda q_: jnp.sum(xla_path(q_, k, v) ** 2))(q)
        return jnp.sum(jnp.abs(g).astype(jnp.float32))

    @jax.jit
    def fused_fwdbwd(q, k, v):
        f = functools.partial(fused_attention, dropout_p=args.dropout)
        g = jax.grad(lambda q_: jnp.sum(f(q_, k, v, lengths, 7) ** 2))(q)
        return jnp.sum(jnp.abs(g).astype(jnp.float32))

    @jax.jit
    def fused_fwdbwd_nodrop(q, k, v):
        g = jax.grad(lambda q_: jnp.sum(
            fused_attention(q_, k, v, lengths, 0, 0.0) ** 2))(q)
        return jnp.sum(jnp.abs(g).astype(jnp.float32))

    time_fn('xla fwd+bwd (no dropout)', xla_fwdbwd, qb, kb, vb)
    time_fn('fused fwd+bwd (no dropout)', fused_fwdbwd_nodrop, qb, kb, vb)
    time_fn(f'fused fwd+bwd (p={args.dropout})', fused_fwdbwd, qb, kb, vb)


if __name__ == '__main__':
    main()
