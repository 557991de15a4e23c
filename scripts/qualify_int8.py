"""Qualify the int8 vocoder serving mode on *realistic* weights.

The round-2 int8 error figure (~12% waveform rel-L2 on the 4-level chain)
was measured on random N(0, 0.02) weights; trained, weight-norm-folded
HiFi-GAN kernels are much smoother. This script settles the quality
verdict (VERDICT r2 next-step #1):

1. briefly GAN-fine-tunes the full V1 generator on synthetic voiced audio
   (pulse trains through formant resonators — enough structure for the
   adversarial + mel losses to shape realistic weight statistics),
2. measures int8-vs-f32 full-chain waveform rel-L2 / max-abs, mel-L1 and
   a multi-resolution STFT distance (perceptual proxy) on held-out mels,
   for both random-init and trained weights,
3. compares activation-scale schemes (per-tile dynamic vs per-channel
   static calibration), including a calibration-MISMATCH sweep (static
   scales calibrated on quiet / noise corpora instead of matched speech)
   with per-quant-point saturation rates against the 1.1 fold margin,
4. records per-level error budgets (rel-L2 of the int8 chain vs the f32
   reference at each upsample-level boundary, via the generator _tap hook).

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
# perceptual proxy: multi-resolution STFT distance
# ----------------------------------------------------------------------

def _stft_mag(x, nfft, hop):
    """|STFT| of (N, S) via framed rfft, periodic hann."""
    win = np.hanning(nfft + 1)[:-1]
    n_frames = 1 + (x.shape[-1] - nfft) // hop
    idx = np.arange(nfft)[None, :] + hop * np.arange(n_frames)[:, None]
    return np.abs(np.fft.rfft(x[:, idx] * win, axis=-1))


def mrstft_distance(x, y):
    """Multi-resolution STFT distance between waveform batches (N, S):
    mean over {512, 1024, 2048}-pt resolutions of the spectral convergence
    ||X|-|Y||_F / |||Y||_F and the log-magnitude L1 (the standard
    parallel-WaveGAN auxiliary-loss pair, here as an offline metric)."""
    sc, lm = [], []
    for nfft in (512, 1024, 2048):
        X = _stft_mag(x, nfft, nfft // 4)
        Y = _stft_mag(y, nfft, nfft // 4)
        sc.append(np.linalg.norm(X - Y) / (np.linalg.norm(Y) + 1e-12))
        lm.append(np.mean(np.abs(np.log(X + 1e-7) - np.log(Y + 1e-7))))
    return float(np.mean(sc)), float(np.mean(lm))


# ----------------------------------------------------------------------
# static-scale diagnostics: saturation rates + per-level error budgets
# ----------------------------------------------------------------------

def saturation_report(params, mels, scales, margin=1.1):
    """Fraction of f32-reference activations that exceed the calibrated
    static range (cal_amax * margin) at every int8 quant point, i.e. the
    values the static int8 kernels would clip. Returns
    {level: {'mean': .., 'max': .., 'worst_point': 'rb{j}/d{ii}/conv{1|2}'}}.
    Mirrors the calibrate_act_scales traversal on EVAL mels."""
    from daft_exprt_tpu.models.hifigan import (
        DEFAULT_CONFIG, _conv1d, _conv_transpose1d, _lrelu)
    cfg = DEFAULT_CONFIG
    mels = jnp.asarray(mels, jnp.float32)
    x = _conv1d(mels, params['conv_pre']['w'], params['conv_pre']['b'])
    report = {}
    for i, (u, k) in enumerate(zip(cfg['upsample_rates'],
                                   cfg['upsample_kernel_sizes'])):
        x = _conv_transpose1d(_lrelu(x), params[f'ups_{i}']['w'],
                              params[f'ups_{i}']['b'], stride=u,
                              padding=(k - u) // 2)
        xs = None
        rates = {}
        for j, dils in enumerate(cfg['resblock_dilation_sizes']):
            rb = params[f'resblock_{i}_{j}']
            s1s, s2s = scales[i][j]
            cur = x
            for ii, d in enumerate(dils):
                t1 = _lrelu(cur)
                thr1 = (s1s[ii] * margin)[None, :, None]
                rates[f'rb{j}/d{ii}/conv1'] = float(
                    jnp.mean(jnp.abs(t1) > thr1))
                a = _conv1d(t1, rb[f'convs1_{ii}']['w'],
                            rb[f'convs1_{ii}']['b'], dilation=d)
                t2 = _lrelu(a)
                thr2 = (s2s[ii] * margin)[None, :, None]
                rates[f'rb{j}/d{ii}/conv2'] = float(
                    jnp.mean(jnp.abs(t2) > thr2))
                cur = cur + _conv1d(t2, rb[f'convs2_{ii}']['w'],
                                    rb[f'convs2_{ii}']['b'])
            xs = cur if xs is None else xs + cur
        x = xs / len(cfg['resblock_kernel_sizes'])
        worst = max(rates, key=rates.get)
        report[f'level_{i}'] = {
            'mean': float(np.mean(list(rates.values()))),
            'max': rates[worst], 'worst_point': worst}
    return report


def per_level_budget(params, mel, scales):
    """rel-L2 of the int8-static Pallas chain vs the f32 XLA reference at
    each upsample-level boundary (canonical (B, C, T) layout, interior
    samples). Runs with DAFT_FUSE_POST=0 so the last level's tap is the
    MRF output on both paths."""
    from daft_exprt_tpu.models.hifigan import generator_forward
    from daft_exprt_tpu.ops.vocoder_kernels import from_phase

    def canon(x, p, tc):
        # tc with p>1 is the phase-tc layout (B, Q, p*C): transpose to
        # phase then de-interleave
        if tc:
            x = jnp.swapaxes(x, 1, 2)
        if p > 1:
            x = from_phase(x, p)
        return x

    def make(**run_kwargs):
        def f(p, m, s):
            taps = {}

            def tap(i, x, pp, tc):
                taps[f'level_{i}'] = canon(x, pp, tc).astype(jnp.float32)

            kw = dict(run_kwargs)
            if s is not None:
                kw['int8_act_scales'] = s
            wav = generator_forward(p, m, _tap=tap, **kw)
            return wav, taps
        return jax.jit(f)

    prev = os.environ.get('DAFT_FUSE_POST')
    os.environ['DAFT_FUSE_POST'] = '0'
    try:
        _, t_ref = make(use_pallas=False)(params, mel, None)
        p16 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                     params)
        print('  compiling int8-static chain (unfused post) for the '
              'per-level taps...', flush=True)
        _, t_q8 = make(use_pallas=True, int8=True)(
            p16, mel.astype(jnp.bfloat16), scales)
    finally:
        if prev is None:
            os.environ.pop('DAFT_FUSE_POST', None)
        else:
            os.environ['DAFT_FUSE_POST'] = prev

    budget = {}
    for key in sorted(t_ref):
        r = np.asarray(t_ref[key], np.float64)
        q = np.asarray(t_q8[key], np.float64)
        cut = max(8, r.shape[-1] // 16)
        rr, qq = r[..., cut:-cut], q[..., cut:-cut]
        budget[key] = float(np.linalg.norm(qq - rr)
                            / (np.linalg.norm(rr) + 1e-12))
    return budget


# ----------------------------------------------------------------------
# evaluation
# ----------------------------------------------------------------------

_Q8S_FN = None


def q8_static_fn():
    """Shared jitted int8-static runner — one compile per process even
    when the calibration scales change (same shapes, traced args)."""
    global _Q8S_FN
    if _Q8S_FN is None:
        from daft_exprt_tpu.models.hifigan import generator_forward
        _Q8S_FN = jax.jit(lambda p, m, s: generator_forward(
            p, m, use_pallas=True, int8=True, int8_act_scales=s))
    return _Q8S_FN


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
        print('  compiling int8-static pallas chain...', flush=True)
        outs['int8_static_pallas'] = np.asarray(
            q8_static_fn()(p16, m16, scales)).astype(np.float64)
    return outs


def _interior(w):
    # edge samples differ by fused-chain SAME-padding semantics — compare
    # the interior (receptive field ~ a few thousand samples)
    cut = 4096
    return w[:, :, cut: w.shape[-1] - cut]


def _metrics(x, r, loss_mel_fn):
    rel_l2 = float(np.linalg.norm(x - r) / (np.linalg.norm(r) + 1e-12))
    max_abs = float(np.abs(x - r).max())
    mel_r = np.asarray(loss_mel_fn(jnp.asarray(r[:, 0, :],
                                               dtype=jnp.float32)))
    mel_x = np.asarray(loss_mel_fn(jnp.asarray(x[:, 0, :],
                                               dtype=jnp.float32)))
    mel_l1 = float(np.mean(np.abs(mel_r - mel_x)))
    sc, lmag = mrstft_distance(x[:, 0, :], r[:, 0, :])
    return {'wav_rel_l2': rel_l2, 'wav_max_abs': max_abs,
            'mel_l1': mel_l1, 'mrstft_sc': sc, 'mrstft_logmag_l1': lmag}


def _print_row(name, m):
    print(f'  {name}: wav rel-L2 {m["wav_rel_l2"]:.4f}  '
          f'max|Δ| {m["wav_max_abs"]:.4f}  mel-L1 {m["mel_l1"]:.4f}  '
          f'mrstft sc {m["mrstft_sc"]:.4f} '
          f'logmag-L1 {m["mrstft_logmag_l1"]:.4f}', flush=True)


def report(outs, loss_mel_fn):
    r = _interior(outs['f32_xla'])
    rows = {}
    for name, w in outs.items():
        if name == 'f32_xla':
            continue
        rows[name] = _metrics(_interior(w), r, loss_mel_fn)
        _print_row(name, rows[name])
    return rows


def mismatch_sweep(params, mel_eval, f32_ref, cal_sets, loss_mel_fn,
                   margin=1.1):
    """Calibration-robustness sweep: int8-static quality + saturation rates
    when the static act scales come from each corpus in ``cal_sets``
    (reusing the already-compiled q8 chain — scales are traced args)."""
    from daft_exprt_tpu.models.hifigan import calibrate_act_scales
    p16 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)
    m16 = mel_eval.astype(jnp.bfloat16)
    r = _interior(f32_ref)
    rows = {}
    for name, cal_mel in cal_sets.items():
        scales = calibrate_act_scales(params, cal_mel)
        wav = np.asarray(
            q8_static_fn()(p16, m16, scales)).astype(np.float64)
        m = _metrics(_interior(wav), r, loss_mel_fn)
        sat = saturation_report(params, mel_eval, scales, margin=margin)
        m['sat_mean'] = float(np.mean([v['mean'] for v in sat.values()]))
        m['sat_max'] = float(max(v['max'] for v in sat.values()))
        m['sat_worst_point'] = max(
            sat, key=lambda k: sat[k]['max']) + '/' + max(
            sat.values(), key=lambda v: v['max'])['worst_point']
        m['saturation_by_level'] = sat
        rows[f'cal_{name}'] = m
        _print_row(f'cal_{name}', m)
        print(f'    saturation: mean {m["sat_mean"]:.2e} '
              f'max {m["sat_max"]:.2e} at {m["sat_worst_point"]}',
              flush=True)
    return rows


# ----------------------------------------------------------------------
# gate: asserted thresholds → explicit pass/fail verdict in the artifact
# ----------------------------------------------------------------------

# Trained-weights serving-quality budgets (r4 measured: int8-static wav
# rel-L2 0.0064 / mel-L1 0.0075 / mrstft sc 0.0047; dynamic 0.0081 /
# 0.0079 / 0.0053 — thresholds leave ~1.5-2x headroom over measured, so
# a silent kernel/quantization regression trips the gate while run-to-run
# training noise does not).
GATE_THRESHOLDS = {
    'int8_static_pallas': {'wav_rel_l2': 0.010, 'mel_l1': 0.010,
                           'mrstft_sc': 0.010},
    'int8_pallas': {'wav_rel_l2': 0.013, 'mel_l1': 0.013,
                    'mrstft_sc': 0.013},
}
SAT_MATCHED_MAX = 1e-4        # matched-cal clipping rate (r4: 3.8e-6)
LEVEL_FINAL_MAX = 0.010       # last-level boundary rel-L2 (r4: 0.0075)
LEVEL_GROWTH_MAX = 3.0        # per-level error growth factor cap
NOISE_DETECT_MIN = 0.05       # the noise-cal row must stay detectably bad


def gate(results):
    """Asserted pass/fail over the recorded metrics. Returns
    (verdict, checks) where checks maps check-name → {'ok', 'value',
    'limit'}; any False ⇒ verdict 'fail'. The checks encode the r4
    VERDICT thresholds: trained-weights quality budgets per int8 tier,
    matched-calibration saturation, a monotone per-level error budget,
    and a liveness check that the calibration-mismatch detector still
    detects (a broken metric would otherwise green-light anything)."""
    checks = {}

    def add(name, value, limit, ok=None):
        checks[name] = {'value': value, 'limit': limit,
                        'ok': bool(value <= limit) if ok is None else ok}

    trained = results.get('trained', {})
    for tier, lims in GATE_THRESHOLDS.items():
        row = trained.get(tier)
        if row is None:
            continue
        for metric, lim in lims.items():
            add(f'trained/{tier}/{metric}', row[metric], lim)

    sweep = results.get('calibration_sweep', {})
    if 'cal_matched' in sweep:
        add('cal_matched/sat_max', sweep['cal_matched']['sat_max'],
            SAT_MATCHED_MAX)
    if 'cal_noise' in sweep:
        v = sweep['cal_noise']['wav_rel_l2']
        add('cal_noise/detector_alive', v, NOISE_DETECT_MIN,
            ok=v >= NOISE_DETECT_MIN)

    budget = results.get('per_level_rel_l2', {})
    if budget:
        keys = sorted(budget)
        add(f'per_level/{keys[-1]}', budget[keys[-1]], LEVEL_FINAL_MAX)
        for a, b in zip(keys, keys[1:]):
            if budget[a] > 1e-6:
                add(f'per_level/{b}_growth', budget[b] / budget[a],
                    LEVEL_GROWTH_MAX)

    verdict = 'pass' if all(c['ok'] for c in checks.values()) else 'fail'
    return verdict, checks


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
    ap.add_argument('--skip_diag', action='store_true',
                    help='skip the calibration-mismatch sweep and '
                         'per-level error budgets')
    args = ap.parse_args()

    # the eval batch (4) is below the ptc batch gate; force the ptc tail
    # so the artifact certifies the path large-batch serving actually runs
    # (the banded path carries its own r3/r4 qualification)
    os.environ.setdefault('DAFT_PTC_MIN_BATCH', '1')

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

    if not args.skip_diag:
        print('=== calibration-mismatch sweep (static scales) ===',
              flush=True)
        y_quiet = np.asarray(y_cal) * 0.25
        rng_n = np.random.RandomState(77)
        y_noise = (rng_n.randn(*np.asarray(y_cal).shape) * 0.1
                   ).astype(np.float32)
        cal_sets = {
            'matched': mel_cal,
            'quiet_0.25x': mel_fn(jnp.asarray(y_quiet)),
            'noise': mel_fn(jnp.asarray(y_noise)),
        }
        results['calibration_sweep'] = mismatch_sweep(
            params, mel_eval, outs['f32_xla'], cal_sets, loss_mel_fn)

        print('=== per-level error budget (matched static scales) ===',
              flush=True)
        from daft_exprt_tpu.models.hifigan import calibrate_act_scales
        budget = per_level_budget(params, mel_eval,
                                  calibrate_act_scales(params, mel_cal))
        for k, v in budget.items():
            print(f'  {k}: rel-L2 {v:.4f}', flush=True)
        results['per_level_rel_l2'] = budget

    verdict, checks = gate(results)
    results['gate'] = checks
    results['verdict'] = verdict
    print('=== gate ===', flush=True)
    for name, c in sorted(checks.items()):
        mark = 'ok  ' if c['ok'] else 'FAIL'
        print(f'  [{mark}] {name}: {c["value"]:.3e} vs {c["limit"]:.3e}',
              flush=True)
    print(f'verdict: {verdict}', flush=True)

    with open(os.path.join(args.out, 'report.json'), 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)
    if verdict != 'pass':
        sys.exit(1)


if __name__ == '__main__':
    main()
