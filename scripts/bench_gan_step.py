"""Vocoder GAN fine-tuning step benchmark (MPD+MSD D-step + G-step).

Measures the two jitted optimization steps of the HiFi-GAN fine-tuning
pipeline (reference trains these in torch: src/daft_exprt/vocoder/
finetune_hifigan.py:215-243) at the reference's segment size.

Usage: python scripts/bench_gan_step.py [--dtype bfloat16] [--batch 16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from daft_exprt_tpu.vocoder_finetune import (
    make_gan_steps, generator_to_weight_norm, SEGMENT_SIZE)
from daft_exprt_tpu.models.hifigan import init_generator_params
from daft_exprt_tpu.models.discriminators import init_mpd_params, init_msd_params

ap = argparse.ArgumentParser()
ap.add_argument('--dtype', default='float32',
                choices=('float32', 'bfloat16'),
                help='mixed-precision conv compute for G and D')
ap.add_argument('--batch', type=int, default=16)
args = ap.parse_args()
B = args.batch
rng = np.random.RandomState(0)
mel = jnp.asarray(rng.randn(B, 80, SEGMENT_SIZE // 256).astype(np.float32))
y = jnp.asarray(0.1 * rng.randn(B, 1, SEGMENT_SIZE).astype(np.float32))
y_mel = jnp.asarray(rng.randn(B, 80, SEGMENT_SIZE // 256).astype(np.float32))

g = generator_to_weight_norm(init_generator_params(jax.random.PRNGKey(0)))
msd, sn = init_msd_params(jax.random.PRNGKey(1))
d = {"mpd": init_mpd_params(jax.random.PRNGKey(2)), "msd": msd}
d_step, g_step, (optim_g, optim_d), _ = make_gan_steps(
    compute_dtype=args.dtype)
g_opt = optim_g.init(g)
d_opt = optim_d.init(d)
print('device', jax.devices()[0], 'B', B, 'seg', SEGMENT_SIZE,
      'dtype', args.dtype, flush=True)

def one_iter(d, d_opt, sn, g, g_opt):
    d, d_opt, sn, d_loss = d_step(d, d_opt, sn, g, mel, y)
    g, g_opt, g_loss, mel_err = g_step(g, g_opt, d, sn, mel, y, y_mel)
    return d, d_opt, sn, g, g_opt, d_loss, g_loss

out = one_iter(d, d_opt, sn, g, g_opt)      # compile
d, d_opt, sn, g, g_opt = out[:5]
_ = float(out[5]) + float(out[6])           # sync

# chained dispatch, one fetch per rep (a per-step loss fetch charges the
# ~25 ms axon tunnel round-trip twice per iteration); 3 reps because the
# first timed loop of a fresh executable can absorb one-time server-side
# warm-up — trust the last
runs = 5
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(runs):
        out = one_iter(d, d_opt, sn, g, g_opt)
        d, d_opt, sn, g, g_opt = out[:5]
    d_loss, g_loss = float(out[5]), float(out[6])
    per = (time.perf_counter() - t0) / runs
    print('GAN D+G step rep%d: %.1f ms/it d_loss %.3f g_loss %.3f' %
          (rep, per * 1e3, d_loss, g_loss), flush=True)

if os.environ.get('GAN_PROFILE', '') == '1':
    # --- component attribution (VERDICT r4 #6): who owns the ~130 ms? ---
    # Each probe is an isolated jitted fwd(+bwd where the step needs it),
    # chained reps with one scalar fetch. d/g step totals above include
    # everything; the pieces below decompose them.
    from daft_exprt_tpu.models.discriminators import (
        mpd_forward, msd_forward)
    from daft_exprt_tpu.models.hifigan import generator_forward
    from daft_exprt_tpu.vocoder_finetune import (
        generator_from_weight_norm, make_loss_mel_fn)

    cdt = jnp.bfloat16 if args.dtype == 'bfloat16' else None
    loss_mel_fn = make_loss_mel_fn()

    def gen_fwd(gwn, mel):
        plain = generator_from_weight_norm(gwn)
        if cdt is not None:
            plain = jax.tree_util.tree_map(lambda x: x.astype(cdt), plain)
            mel = mel.astype(cdt)
        return generator_forward(plain, mel).astype(jnp.float32)

    y_hat0 = jax.jit(gen_fwd)(g, mel)

    probes = {
        'gen_fwd (d-step fake)': jax.jit(
            lambda gwn: jnp.sum(gen_fwd(gwn, mel))),
        'gen_fwd+bwd (g-step)': jax.jit(jax.grad(
            lambda gwn: jnp.sum(gen_fwd(gwn, mel) ** 2))),
        'mpd fwd+bwd(d)': jax.jit(jax.grad(
            lambda dp: sum(jnp.sum(o ** 2) for o in
                           mpd_forward(dp, y, y_hat0, dtype=cdt)[0] +
                           mpd_forward(dp, y, y_hat0, dtype=cdt)[1]))),
        'msd fwd+bwd(d)': jax.jit(jax.grad(
            lambda ms: sum(jnp.sum(o ** 2) for o in
                           msd_forward(ms, sn, y, y_hat0,
                                       update_sn=False, dtype=cdt)[0] +
                           msd_forward(ms, sn, y, y_hat0,
                                       update_sn=False, dtype=cdt)[1]))),
        'mel_loss fwd+bwd(y_hat)': jax.jit(jax.grad(
            lambda yh: jnp.mean(jnp.abs(loss_mel_fn(yh[:, 0, :]))))),
        'd_step only': None,
        'g_step only': None,
    }

    def timeit(fn, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(*a)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            ts.append((time.perf_counter() - t0) / 5)
        return min(ts) * 1e3

    print('--- profile ---', flush=True)
    for name, fn in probes.items():
        if name == 'd_step only':
            ms = timeit(lambda: d_step(d, d_opt, sn, g, mel, y)[3])
        elif name == 'g_step only':
            ms = timeit(lambda: g_step(g, g_opt, d, sn, mel, y, y_mel)[2])
        elif name.startswith('mpd'):
            ms = timeit(fn, d['mpd'])
        elif name.startswith('msd'):
            ms = timeit(fn, d['msd'])
        elif name.startswith('mel'):
            ms = timeit(fn, y_hat0)
        else:
            ms = timeit(fn, g)
        print(f'  {name}: {ms:.1f} ms', flush=True)
