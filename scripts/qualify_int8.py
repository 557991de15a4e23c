"""Qualify the int8 vocoder serving mode on *realistic* weights.

The round-2 int8 error figure (~12% waveform rel-L2 on the 4-level chain)
was measured on random N(0, 0.02) weights; trained, weight-norm-folded
HiFi-GAN kernels are much smoother. This script settles the quality
verdict (VERDICT r2 next-step #1):

1. briefly GAN-fine-tunes the full V1 generator on synthetic voiced audio
   (pulse trains through formant resonators — enough structure for the
   adversarial + mel losses to shape realistic weight statistics),
2. measures int8-vs-f32 full-chain waveform rel-L2 / max-abs and mel-L1
   on held-out mels, for both random-init and trained weights,
3. optionally compares activation-scale schemes (per-tile dynamic vs
   per-channel static calibration).

Usage:
  python scripts/qualify_int8.py --train_steps 300 --out /tmp/int8_qual
  python scripts/qualify_int8.py --weights /tmp/int8_qual/weights.npz  # reuse
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------
# synthetic voiced corpus (host-side, cheap)
# ----------------------------------------------------------------------

def synth_voice(rng, n, sr=22050):
    """Pulse train with drifting f0 through two formant resonators plus
    breath noise — crude but spectrally speech-shaped."""
    from scipy.signal import lfilter
    f0 = 90 + 120 * rng.rand()
    drift = np.cumsum(rng.randn(n) * 0.3)
    drift = drift - drift.mean()
    inst_f0 = np.clip(f0 * (1 + 0.003 * drift), 60, 400)
    phase = np.cumsum(inst_f0 / sr)
    sig = np.zeros(n)
    idx = np.searchsorted(phase, np.arange(1, int(phase[-1])))
    sig[np.clip(idx, 0, n - 1)] = 1.0
    out = np.zeros(n)
    for fc, bw, g in ((500 + 400 * rng.rand(), 80, 1.0),
                      (1400 + 800 * rng.rand(), 120, 0.6),
                      (2600 + 600 * rng.rand(), 180, 0.3)):
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * fc / sr
        out += g * lfilter([1.0], [1, -2 * r * np.cos(theta), r * r], sig)
    out += 0.01 * rng.randn(n)
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * np.arange(n) * 2.7 / sr))
    out *= env
    return (out / (np.abs(out).max() + 1e-9) * 0.6).astype(np.float32)


def build_corpus(rng, n_segments, segment):
    segs = np.stack([synth_voice(rng, segment) for _ in range(n_segments)])
    return segs[:, None, :]                                  # (N, 1, S)


# ----------------------------------------------------------------------
# brief GAN fine-tune → realistic weights
# ----------------------------------------------------------------------

def train_generator(steps, batch, seed=0, log_every=50):
    from daft_exprt_tpu.vocoder_finetune import (
        SEGMENT_SIZE, generator_from_weight_norm, generator_to_weight_norm,
        make_gan_steps)
    from daft_exprt_tpu.models.hifigan import init_generator_params
    from daft_exprt_tpu.models.discriminators import (
        init_mpd_params, init_msd_params)

    rng = np.random.RandomState(seed)
    n_segs = max(64, batch * 8)
    y_host = build_corpus(rng, n_segs, SEGMENT_SIZE)
    y_all = jnp.asarray(y_host)                              # device-resident

    d_step, g_step, (optim_g, optim_d), loss_mel_fn = make_gan_steps(
        compute_dtype='bfloat16')
    mel_fn = jax.jit(lambda y: loss_mel_fn(y[:, 0, :]))
    mel_all = mel_fn(y_all)                                  # (N, 80, S/256)

    g = generator_to_weight_norm(
        init_generator_params(jax.random.PRNGKey(seed)))
    msd, sn = init_msd_params(jax.random.PRNGKey(seed + 1))
    d = {'mpd': init_mpd_params(jax.random.PRNGKey(seed + 2)), 'msd': msd}
    g_opt = optim_g.init(g)
    d_opt = optim_d.init(d)

    t0 = time.time()
    for it in range(steps):
        sel = rng.randint(0, n_segs, size=batch)
        mel = mel_all[sel]
        y = y_all[sel]
        d, d_opt, sn, d_loss = d_step(d, d_opt, sn, g, mel, y)
        g, g_opt, g_loss, mel_l1 = g_step(g, g_opt, d, sn, mel, y, mel)
        if it % log_every == 0 or it == steps - 1:
            print(f'  it {it}: d_loss {float(d_loss):.3f} '
                  f'g_loss {float(g_loss):.3f} mel_l1 {float(mel_l1):.3f} '
                  f'({time.time() - t0:.0f}s)', flush=True)
    return generator_from_weight_norm(g)


# ----------------------------------------------------------------------
# evaluation
# ----------------------------------------------------------------------

def chain_outputs(params, mel, cal_mel=None, skip_bf16=False):
    """Returns dict name → wav for f32-XLA / bf16-pallas / int8-pallas
    (+ int8-static when ``cal_mel`` provides a calibration batch for the
    per-channel static activation scales)."""
    from daft_exprt_tpu.models.hifigan import (
        calibrate_act_scales, generator_forward)

    outs = {}

    f32 = jax.jit(lambda p, m: generator_forward(p, m, use_pallas=False))
    outs['f32_xla'] = np.asarray(f32(params, mel)).astype(np.float64)

    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    m16 = mel.astype(jnp.bfloat16)
    if not skip_bf16:
        bf16 = jax.jit(lambda p, m: generator_forward(
            p, m, use_pallas=True, int8=False))
        print('  compiling bf16 pallas chain...', flush=True)
        outs['bf16_pallas'] = np.asarray(
            bf16(p16, m16)).astype(np.float64)

    q8 = jax.jit(lambda p, m: generator_forward(
        p, m, use_pallas=True, int8=True))
    print('  compiling int8 pallas chain...', flush=True)
    outs['int8_pallas'] = np.asarray(q8(p16, m16)).astype(np.float64)

    if cal_mel is not None:
        scales = calibrate_act_scales(params, cal_mel)
        q8s = jax.jit(lambda p, m, s: generator_forward(
            p, m, use_pallas=True, int8=True, int8_act_scales=s))
        print('  compiling int8-static pallas chain...', flush=True)
        outs['int8_static_pallas'] = np.asarray(
            q8s(p16, m16, scales)).astype(np.float64)
    return outs


def report(outs, loss_mel_fn):
    ref = outs['f32_xla']
    # edge samples differ by fused-chain SAME-padding semantics — compare
    # the interior (receptive field ~ a few thousand samples)
    cut = 4096
    interior = (slice(None), slice(None), slice(cut, ref.shape[-1] - cut))
    r = ref[interior]
    rows = {}
    for name, w in outs.items():
        if name == 'f32_xla':
            continue
        x = w[interior]
        rel_l2 = float(np.linalg.norm(x - r) / (np.linalg.norm(r) + 1e-12))
        max_abs = float(np.abs(x - r).max())
        mel_r = np.asarray(loss_mel_fn(jnp.asarray(r[:, 0, :],
                                                   dtype=jnp.float32)))
        mel_x = np.asarray(loss_mel_fn(jnp.asarray(x[:, 0, :],
                                                   dtype=jnp.float32)))
        mel_l1 = float(np.mean(np.abs(mel_r - mel_x)))
        rows[name] = {'wav_rel_l2': rel_l2, 'wav_max_abs': max_abs,
                      'mel_l1': mel_l1}
        print(f'  {name}: wav rel-L2 {rel_l2:.4f}  max|Δ| {max_abs:.4f}  '
              f'mel-L1 {mel_l1:.4f}', flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--train_steps', type=int, default=300)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--eval_batch', type=int, default=4)
    ap.add_argument('--eval_frames', type=int, default=256)
    ap.add_argument('--weights', type=str, default='',
                    help='reuse saved trained weights (skip the GAN train)')
    ap.add_argument('--out', type=str, default='/tmp/int8_qual')
    ap.add_argument('--skip_random', action='store_true')
    ap.add_argument('--skip_bf16', action='store_true')
    args = ap.parse_args()

    from daft_exprt_tpu.models.hifigan import init_generator_params
    from daft_exprt_tpu.vocoder_finetune import make_loss_mel_fn
    from flax import traverse_util

    os.makedirs(args.out, exist_ok=True)
    loss_mel_fn = jax.jit(make_loss_mel_fn())
    print('device:', jax.devices()[0], flush=True)

    # held-out eval mels from fresh synthetic audio; a disjoint
    # calibration batch feeds the static act scales
    rng = np.random.RandomState(1234)
    seg = args.eval_frames * 256
    y_eval = jnp.asarray(build_corpus(rng, args.eval_batch, seg))
    mel_fn = jax.jit(lambda y: make_loss_mel_fn()(y[:, 0, :]))
    mel_eval = mel_fn(y_eval)
    y_cal = jnp.asarray(build_corpus(rng, args.eval_batch, seg))
    mel_cal = mel_fn(y_cal)
    print('eval mel', mel_eval.shape, flush=True)

    results = {}

    if not args.skip_random:
        print('=== random-init weights ===', flush=True)
        params_rand = init_generator_params(jax.random.PRNGKey(0))
        outs = chain_outputs(params_rand, mel_eval)
        results['random'] = report(outs, loss_mel_fn)

    if args.weights and os.path.isfile(args.weights):
        print(f'=== loading trained weights from {args.weights} ===',
              flush=True)
        flat = dict(np.load(args.weights))
        params = traverse_util.unflatten_dict(
            {tuple(k.split('/')): jnp.asarray(v) for k, v in flat.items()})
    else:
        print(f'=== GAN fine-tune ({args.train_steps} steps) ===',
              flush=True)
        params = train_generator(args.train_steps, args.batch)
        flat = {'/'.join(k): np.asarray(v) for k, v in
                traverse_util.flatten_dict(params).items()}
        np.savez(os.path.join(args.out, 'weights.npz'), **flat)
        print(f'weights saved to {args.out}/weights.npz', flush=True)

    print('=== trained weights ===', flush=True)
    outs = chain_outputs(params, mel_eval, cal_mel=mel_cal,
                         skip_bf16=args.skip_bf16)
    results['trained'] = report(outs, loss_mel_fn)

    with open(os.path.join(args.out, 'report.json'), 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
