"""On-TPU numerics gate: pallas-vs-XLA agreement on the real chip → JSON.

BENCH_r*.json records throughput only; a compiler/tunnel update could
silently break kernel numerics between rounds (the CPU-interpret tests
can't see that). This runs the agreement checks ON DEVICE and emits one
verdict artifact (VERDICT r2 next-step #4):

- vocoder f32: compiled pallas chain vs XLA, interior max-abs-err
- vocoder bf16 fast path (phase chain + fused ups/post) vs f32 XLA
- tc vs ct MRF kernel at the L1 shape, f32
- int8 chain vs bf16 chain (expected-band check, not parity)
- fused attention fwd/bwd vs XLA attention
- one train step: finite loss + grad-norm

Usage: python scripts/tpu_check.py [--out NUMERICS.json]
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


def check_vocoder(results):
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)

    params = init_generator_params(jax.random.PRNGKey(0))
    mel = jnp.asarray(np.random.RandomState(1).randn(2, 80, 128),
                      jnp.float32)
    ref = np.asarray(jax.jit(
        lambda p, m: generator_forward(p, m))(params, mel), np.float64)

    print('vocoder pallas-f32 (compiling ~4 min)...', flush=True)
    out = np.asarray(jax.jit(
        lambda p, m: generator_forward(p, m, use_pallas=True))(params, mel),
        np.float64)
    err = float(np.abs(out[:, :, 4096:-4096] - ref[:, :, 4096:-4096]).max())
    results['vocoder_pallas_f32_vs_xla'] = {
        'interior_max_abs_err': err, 'tol': 5e-4, 'pass': err < 5e-4}
    print(f'  f32 interior max err {err:.2e}', flush=True)

    print('vocoder pallas-bf16 fast path (compiling ~4 min)...', flush=True)
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    out16 = np.asarray(jax.jit(
        lambda p, m: generator_forward(p, m, use_pallas=True))(
        p16, mel.astype(jnp.bfloat16)), np.float64)
    err16 = float(np.abs(out16[:, :, 4096:-4096]
                         - ref[:, :, 4096:-4096]).max())
    rel16 = float(np.linalg.norm(out16 - ref) / np.linalg.norm(ref))
    results['vocoder_pallas_bf16_vs_xla_f32'] = {
        'interior_max_abs_err': err16, 'rel_l2': rel16, 'tol': 0.05,
        'pass': err16 < 0.05}
    print(f'  bf16 interior max err {err16:.2e} rel {rel16:.2e}',
          flush=True)

    print('vocoder int8 chain (compiling ~4 min)...', flush=True)
    outq = np.asarray(jax.jit(
        lambda p, m: generator_forward(p, m, use_pallas=True, int8=True))(
        p16, mel.astype(jnp.bfloat16)), np.float64)
    relq = float(np.linalg.norm(outq - out16) / (np.linalg.norm(out16)
                                                 + 1e-12))
    results['vocoder_int8_vs_bf16'] = {
        'rel_l2': relq, 'band': 0.25, 'pass': relq < 0.25}
    print(f'  int8 rel-L2 vs bf16 {relq:.3f}', flush=True)

    print('vocoder int8-static chain (compiling ~4 min)...', flush=True)
    from daft_exprt_tpu.models.hifigan import calibrate_act_scales
    scales = calibrate_act_scales(params, mel)
    outs = np.asarray(jax.jit(
        lambda p, m, s: generator_forward(p, m, use_pallas=True, int8=True,
                                          int8_act_scales=s))(
        p16, mel.astype(jnp.bfloat16), scales), np.float64)
    rels = float(np.linalg.norm(outs - out16) / (np.linalg.norm(out16)
                                                 + 1e-12))
    results['vocoder_int8_static_vs_bf16'] = {
        'rel_l2': rels, 'band': 0.25, 'pass': rels < 0.25}
    print(f'  int8-static rel-L2 vs bf16 {rels:.3f}', flush=True)


def check_tc_kernel(results):
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_ct, fused_mrf_tc, pack_mrf_tc_weights, pack_mrf_weights)
    rng = np.random.RandomState(2)
    C, T, B = 128, 16384, 2
    ks, dils = (3, 7, 11), ((1, 3, 5),) * 3
    params = {}
    for j, (k, d) in enumerate(zip(ks, dils)):
        rb = {}
        for i in range(len(d)):
            for pre in ('convs1', 'convs2'):
                rb[f'{pre}_{i}'] = {
                    'w': jnp.asarray(rng.randn(C, C, k).astype(np.float32)
                                     * 0.02),
                    'b': jnp.asarray(rng.randn(C).astype(np.float32) * .01)}
        params[f'resblock_0_{j}'] = rb
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    print('tc vs ct MRF kernel (compiling)...', flush=True)
    y_ct = np.asarray(jax.jit(lambda p, x: fused_mrf_ct(
        x, pack_mrf_weights(p, 0, ks, dils), ks, dils, tile=4096))(
        params, x), np.float64)
    y_tc = np.asarray(jax.jit(lambda p, x: fused_mrf_tc(
        jnp.swapaxes(x, 1, 2), pack_mrf_tc_weights(p, 0, ks, dils),
        ks, dils, tile=4096))(params, x), np.float64)
    err = float(np.abs(np.swapaxes(y_tc, 1, 2) - y_ct).max())
    results['mrf_tc_vs_ct_f32'] = {'max_abs_err': err, 'tol': 1e-4,
                                   'pass': err < 1e-4}
    print(f'  tc vs ct max err {err:.2e}', flush=True)


def check_attention(results):
    from daft_exprt_tpu.ops.attention_kernels import fused_attention
    rng = np.random.RandomState(3)
    B, H, T, D = 2, 4, 256, 32
    q = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32)) * D ** -0.5
    k = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    lengths = jnp.asarray([256, 192], jnp.int32)

    def xla_attn(q, k, v, lengths):
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k)
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        s = jnp.where(mask[:, None, None, :], s, -1e9)
        return jnp.einsum('bhqk,bhkd->bhqd', jax.nn.softmax(s, axis=-1), v)

    print('fused attention fwd/bwd (compiling)...', flush=True)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, lengths) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attn(q, k, v, lengths) ** 2)

    o_f = np.asarray(jax.jit(fused_attention, static_argnums=(4, 5))(
        q, k, v, lengths, 0, 0.0), np.float64)
    o_x = np.asarray(jax.jit(xla_attn)(q, k, v, lengths), np.float64)
    # padded-query rows are unspecified in the fused kernel — compare
    # valid rows only
    fwd_err = max(float(np.abs(o_f[b, :, :int(lengths[b])]
                               - o_x[b, :, :int(lengths[b])]).max())
                  for b in range(B))
    g_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(q, k, v)
    g_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    bwd_err = max(float(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64)).max())
                  for a, b in zip(g_f, g_x))
    # f32 on the MXU reassociates the reduction vs the einsum reference —
    # a few e-4 is precision noise, not kernel drift
    results['fused_attention_fwd'] = {'max_abs_err': fwd_err, 'tol': 1e-3,
                                      'pass': fwd_err < 1e-3}
    results['fused_attention_bwd'] = {'max_abs_err': bwd_err, 'tol': 5e-3,
                                      'pass': bwd_err < 5e-3}
    print(f'  attn fwd {fwd_err:.2e} bwd {bwd_err:.2e}', flush=True)


def check_compact(results):
    """Compiled (not interpret) compact-vs-full staging agreement at a
    gapped-band shape: bit-identity on the int8-static path (the removed
    blocks are exact integer zeros), rel-L2 band on bf16 (MXU partial-sum
    regrouping only). Guards exactly the class of change a staging/tile
    edit can break on the real compiler."""
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, pack_mrf_phase_weights)
    rng = np.random.RandomState(5)
    C, p, B, T = 32, 4, 1, 8192
    ks, dils = (3, 11), ((1, 5), (1, 5))      # d=5 > p: gapped bands
    params = {}
    for j, (k, d) in enumerate(zip(ks, dils)):
        params[f'resblock_0_{j}'] = {
            f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, k)
                                            .astype(np.float32) * .05),
                           'b': jnp.asarray(rng.randn(C)
                                            .astype(np.float32) * .01)}
            for pre in ('convs1', 'convs2') for i in range(len(d))}
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    w = pack_mrf_phase_weights(params, 0, ks, dils, p)
    scales = [jnp.asarray(0.3 + rng.rand(C).astype(np.float32))
              for _ in range(2 * sum(len(d) for d in dils))]
    print('compact-vs-full staging, compiled (compiling ~2x2 min)...',
          flush=True)
    outs = {}
    for flag in (False, True):
        outs[flag] = {
            'i8': np.asarray(fused_mrf_phase(
                x, w, ks, dils, p, tile=1024, int8_chain=True,
                act_scales=scales, int8_fused=True, compact=flag)),
            'bf': np.asarray(fused_mrf_phase(
                x, w, ks, dils, p, tile=1024, compact=flag), np.float64)}
    bit_ok = bool(np.array_equal(outs[False]['i8'], outs[True]['i8']))
    rel = float(np.linalg.norm(outs[True]['bf'] - outs[False]['bf'])
                / (np.linalg.norm(outs[False]['bf']) + 1e-30))
    results['compact_int8_bit_identity'] = {'equal': bit_ok, 'pass': bit_ok}
    results['compact_bf16_vs_full'] = {'rel_l2': rel, 'tol': 1e-5,
                                       'pass': rel < 1e-5}
    print(f'  int8 bit-identical: {bit_ok}; bf16 rel {rel:.2e}', flush=True)


def check_ptc(results):
    """Compiled phase-tc vs banded-compact int8-static chain agreement at
    the L3 shape. The s32 dot sums are exact integers, but BOTH packers
    quantize on-device through different op sequences (one-ulp scale
    differences flip int8 weights by ±1) and the f32 epilogues FMA
    differently — measured rel 3.6e-4 on the full 18-conv V1 chain. The
    band is set to 10% of the int8-vs-f32 serving budget (2e-3): real
    kernel breakage (a wrong tap/shift) lands at rel ~1."""
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, fused_mrf_ptc, pack_mrf_phase_weights,
        pack_mrf_ptc_weights, to_phase)
    rng = np.random.RandomState(6)
    C, p, B, T = 32, 4, 1, 32768
    ks = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    params = {}
    for j, (k, d) in enumerate(zip(ks, dils)):
        params[f'resblock_0_{j}'] = {
            f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, k)
                                            .astype(np.float32) * .05),
                           'b': jnp.asarray(rng.randn(C)
                                            .astype(np.float32) * .01)}
            for pre in ('convs1', 'convs2') for i in range(len(d))}
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    xp = to_phase(x, p)
    lvl = []
    for k, d in zip(ks, dils):
        lvl.append((np.stack([0.3 + rng.rand(C).astype(np.float32)
                              for _ in range(len(d))]),
                    np.stack([0.3 + rng.rand(C).astype(np.float32)
                              for _ in range(len(d))])))
    ph = [s[i] for s1, s2 in lvl for i in range(s1.shape[0])
          for s in (s1, s2)]
    print('ptc vs banded int8 chain, compiled (compiling ~2+1 min)...',
          flush=True)
    w_band = pack_mrf_phase_weights(params, 0, ks, dils, p)
    y_band = np.asarray(fused_mrf_phase(
        xp, w_band, ks, dils, p, tile=1024, in_phase=True, out_phase=True,
        int8_chain=True, act_scales=ph, int8_fused=True), np.float64)
    w_ptc = pack_mrf_ptc_weights(params, 0, ks, dils, p, lvl)
    y_ptc = np.asarray(fused_mrf_ptc(
        jnp.swapaxes(xp, 1, 2), w_ptc, ks, dils, p, tile=1024), np.float64)
    rel = float(np.linalg.norm(np.swapaxes(y_ptc, 1, 2) - y_band)
                / (np.linalg.norm(y_band) + 1e-30))
    results['ptc_vs_banded_int8'] = {'rel_l2': rel, 'tol': 2e-3,
                                     'pass': rel < 2e-3}
    print(f'  ptc vs banded rel {rel:.2e}', flush=True)

    # bf16 float-dot mode (the bf16 serving tier's narrow-level route):
    # same shift matrices, unquantized bf16 dots — band is the bf16
    # rounding envelope of an 18-conv chain, not a quantization budget
    from daft_exprt_tpu.ops.vocoder_kernels import pack_mrf_ptc_f_weights
    p16 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)
    w_band16 = pack_mrf_phase_weights(p16, 0, ks, dils, p)
    y_band16 = np.asarray(fused_mrf_phase(
        xp.astype(jnp.bfloat16), w_band16, ks, dils, p, tile=1024,
        in_phase=True, out_phase=True), np.float64)
    w_ptc16 = pack_mrf_ptc_f_weights(p16, 0, ks, dils, p)
    y_ptc16 = np.asarray(fused_mrf_ptc(
        jnp.swapaxes(xp, 1, 2).astype(jnp.bfloat16), w_ptc16, ks, dils,
        p, tile=1024, fdot=True), np.float64)
    rel16 = float(np.linalg.norm(np.swapaxes(y_ptc16, 1, 2) - y_band16)
                  / (np.linalg.norm(y_band16) + 1e-30))
    results['ptc_bf16_vs_banded_bf16'] = {'rel_l2': rel16, 'tol': 3e-2,
                                          'pass': rel16 < 3e-2}
    print(f'  ptc-bf16 vs banded-bf16 rel {rel16:.2e}', flush=True)


def check_train_step(results):
    print('train step (compiling)...', flush=True)
    import subprocess
    # run the existing train-step bench for 3 iterations in-process would
    # drag in the full data pipeline; instead run one jitted loss+grad on
    # the model directly
    from daft_exprt_tpu.hparams import HyperParams
    from daft_exprt_tpu.train import init_model_and_state
    SMALL = {'nb_blocks': 1, 'hidden_embed_dim': 32, 'attn_nb_heads': 2,
             'attn_dropout': 0.0, 'conv_kernel': 3, 'conv_channels': 32,
             'conv_dropout': 0.0}
    hp = HyperParams(
        verbose=False, training_files='x', validation_files='x',
        output_directory='/tmp/tpu_check', language='english',
        speakers=['spk'], phoneme_encoder=dict(SMALL),
        accent_encoder=dict(SMALL), frame_decoder=dict(SMALL),
        length_buckets=[32], frame_buckets=[128])
    model, params = init_model_and_state(hp)
    rng = np.random.RandomState(4)
    L, T = 32, 128
    batch = dict(
        symbols=rng.randint(7, 70, size=(2, L)),
        durations_float=np.abs(rng.rand(2, L)).astype(np.float32) * 0.05,
        durations_int=np.full((2, L), 4, np.int64),
        symbols_energy=rng.randn(2, L).astype(np.float32),
        symbols_pitch=rng.randn(2, L).astype(np.float32),
        input_lengths=np.array([L, L - 4]),
        frames_energy=rng.randn(2, T).astype(np.float32),
        frames_pitch=rng.randn(2, T).astype(np.float32),
        mel_specs=rng.randn(2, 80, T).astype(np.float32),
        output_lengths=np.array([T, T - 16]),
        speaker_ids=np.zeros((2,), np.int64),
        spk_embs=rng.randn(2, 192).astype(np.float32),
    )

    def loss_fn(p):
        out = model.apply({'params': p}, **batch, deterministic=True)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves
                   if x.dtype != jnp.int64 and x.dtype != jnp.int32) \
            / sum(x.size for x in leaves)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in jax.tree_util.tree_leaves(grads))))
    loss = float(loss)
    ok = bool(np.isfinite(loss) and np.isfinite(gnorm) and gnorm > 0)
    results['model_fwd_bwd_finite'] = {'loss': loss, 'grad_norm': gnorm,
                                       'pass': ok}
    print(f'  loss {loss:.4f} grad norm {gnorm:.4f}', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', type=str, default='NUMERICS.json')
    ap.add_argument('--skip', type=str, default='',
                    help='comma list: vocoder,tc,attention,train,compact,'
                         'ptc')
    args = ap.parse_args()
    skip = set(args.skip.split(',')) if args.skip else set()

    dev = jax.devices()[0]
    print('device:', dev, flush=True)
    # Stamp the exact source state the gate certifies: bench.py compares
    # this commit against HEAD's kernel-affecting history and flags a
    # stale gate in its own output (the r4 gate predated the shipped
    # kernels — this makes that unrepeatable).
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        commit = subprocess.run(['git', 'rev-parse', 'HEAD'], cwd=repo,
                                capture_output=True, text=True,
                                check=True).stdout.strip()
        dirty = bool(subprocess.run(['git', 'status', '--porcelain'],
                                    cwd=repo, capture_output=True,
                                    text=True).stdout.strip())
    except Exception:
        commit, dirty = None, None
    results = {'device': str(dev), 'timestamp': time.strftime('%F %T'),
               'commit': commit, 'dirty_tree': dirty}
    t0 = time.time()
    checks = {}
    # skipped checks keep their entries from an existing artifact so a
    # single re-run can refresh one check without repeating the ~20 min
    # of pallas compiles for the others
    if skip and os.path.isfile(args.out):
        with open(args.out) as f:
            checks.update(json.load(f).get('checks', {}))
    if 'tc' not in skip:
        check_tc_kernel(checks)
    if 'compact' not in skip:
        check_compact(checks)
    if 'ptc' not in skip:
        check_ptc(checks)
    if 'attention' not in skip:
        check_attention(checks)
    if 'train' not in skip:
        check_train_step(checks)
    if 'vocoder' not in skip:
        check_vocoder(checks)
    results['checks'] = checks
    results['elapsed_s'] = round(time.time() - t0, 1)
    results['all_pass'] = all(c.get('pass', False)
                              for c in checks.values())
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps({'all_pass': results['all_pass'],
                      'out': args.out}), flush=True)
    if not results['all_pass']:
        sys.exit(1)


if __name__ == '__main__':
    main()
