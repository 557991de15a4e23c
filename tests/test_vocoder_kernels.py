"""Fused Pallas resblock kernel: interpret-mode correctness on CPU."""
import os

import numpy as np
import pytest

from daft_exprt_tpu.ops.vocoder_kernels import (
    fused_resblock1, pack_resblock_weights, resblock1_halo,
    resblock1_reference,
)


def make_weights(rng, n_dil, k, C):
    import jax.numpy as jnp
    return (jnp.asarray(rng.randn(n_dil, k, C, C).astype(np.float32) * 0.02),
            jnp.asarray(rng.randn(n_dil, C).astype(np.float32) * 0.01),
            jnp.asarray(rng.randn(n_dil, k, C, C).astype(np.float32) * 0.02),
            jnp.asarray(rng.randn(n_dil, C).astype(np.float32) * 0.01))


@pytest.mark.parametrize('k,dils', [(3, (1, 3)), (11, (1, 3, 5))])
def test_fused_resblock_interior_exact(k, dils):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    B, T, C = 2, 1024, 128
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)
    w1, b1, w2, b2 = make_weights(rng, len(dils), k, C)
    out = np.asarray(fused_resblock1(x, w1, b1, w2, b2, k, dils, tile=512,
                                     interpret=True))
    ref = np.asarray(resblock1_reference(x, w1, b1, w2, b2, k, dils))
    h = resblock1_halo(k, dils)
    # interior samples (outside the edge receptive field) are exact
    assert np.abs(out[:, h:-h] - ref[:, h:-h]).max() < 1e-5
    # edges deviate only within the zero-padding semantics difference
    assert np.abs(out - ref).max() < 0.1


def test_pack_resblock_weights():
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    rb = {}
    for i in range(3):
        rb[f'convs1_{i}'] = {'w': jnp.asarray(rng.randn(64, 64, 3)
                                              .astype(np.float32)),
                             'b': jnp.zeros(64)}
        rb[f'convs2_{i}'] = {'w': jnp.asarray(rng.randn(64, 64, 3)
                                              .astype(np.float32)),
                             'b': jnp.zeros(64)}
    w1, b1, w2, b2 = pack_resblock_weights(rb, 3)
    assert w1.shape == (3, 3, 64, 64)
    # torch (out, in, k) -> (k, in, out)
    np.testing.assert_array_equal(np.asarray(w1[0][0]),
                                  np.asarray(rb['convs1_0']['w'][:, :, 0]).T)


def test_generator_pallas_path_matches_interpret():
    """Full generator with the pallas MRF path (interpret mode) vs the
    standard XLA path — interior-dominated agreement."""
    import jax
    from daft_exprt_tpu.models.hifigan import (
        _pallas_mrf, generator_forward, init_generator_params)
    cfg = {'sampling_rate': 22050, 'upsample_rates': [8, 2],
           'upsample_kernel_sizes': [16, 4], 'upsample_initial_channel': 32,
           'resblock': '1', 'resblock_kernel_sizes': [3],
           'resblock_dilation_sizes': [[1, 3]], 'model_in_dim': 80}
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    mel = rng.randn(1, 80, 64).astype(np.float32)
    ref = np.asarray(generator_forward(params, mel, cfg))

    # monkeypatch-free: call the pallas path with interpret mode by
    # re-implementing the loop through _pallas_mrf
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        _conv1d, _conv_transpose1d, _lrelu)
    x = _conv1d(jnp.asarray(mel), params['conv_pre']['w'],
                params['conv_pre']['b'])
    for i, (u, k) in enumerate(zip(cfg['upsample_rates'],
                                   cfg['upsample_kernel_sizes'])):
        x = _lrelu(x)
        x = _conv_transpose1d(x, params[f'ups_{i}']['w'],
                              params[f'ups_{i}']['b'], stride=u,
                              padding=(k - u) // 2)
        x = _pallas_mrf(params, x, i, cfg, 1, tile=256, interpret=True)
    x = _lrelu(x)
    x = _conv1d(x, params['conv_post']['w'], params['conv_post']['b'])
    out = np.asarray(jnp.tanh(x))
    assert out.shape == ref.shape
    # interior agreement (first/last 64 wav samples carry edge semantics)
    assert np.abs(out[:, :, 64:-64] - ref[:, :, 64:-64]).max() < 1e-4


@pytest.mark.parametrize('C', [32, 64, 128])
def test_fused_mrf_ct_interior_exact(C):
    """Channels-in-sublanes MRF kernel vs per-block reference, V1 config."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import fused_mrf_ct
    rng = np.random.RandomState(3)
    ks = (3, 7, 11)
    dils = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    B, T = 2, 1024
    x_ct = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    weights, ref_acc = [], None
    x_tc = jnp.swapaxes(x_ct, 1, 2)
    for k, d in zip(ks, dils):
        w1 = jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02)
        b1 = jnp.asarray(rng.randn(len(d), C).astype(np.float32) * .01)
        w2 = jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02)
        b2 = jnp.asarray(rng.randn(len(d), C).astype(np.float32) * .01)
        # ct kernel wants (n_dil, k, C_out, C_in) + (n_dil, C, 1); the
        # reference wants (n_dil, k, C_in, C_out) + (n_dil, C)
        weights += [w1, b1[:, :, None], w2, b2[:, :, None]]
        r = resblock1_reference(x_tc, jnp.swapaxes(w1, 2, 3), b1,
                                jnp.swapaxes(w2, 2, 3), b2, k, d)
        ref_acc = r if ref_acc is None else ref_acc + r
    ref = np.asarray(jnp.swapaxes(ref_acc / len(ks), 1, 2))
    out = np.asarray(fused_mrf_ct(x_ct, weights, ks, dils, tile=512,
                                  interpret=True))
    h = max(resblock1_halo(k, d) for k, d in zip(ks, dils))
    assert np.abs(out[:, :, h:-h] - ref[:, :, h:-h]).max() < 1e-5
    assert np.abs(out - ref).max() < 0.1


def test_fused_mrf_ct_bf16():
    """bf16 input path compiles in interpret mode and stays close to f32."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import fused_mrf_ct
    rng = np.random.RandomState(4)
    ks, dils = (3,), ((1, 2),)
    B, C, T = 1, 32, 512
    x = rng.randn(B, C, T).astype(np.float32) * 0.1
    w1 = rng.randn(2, 3, C, C).astype(np.float32) * 0.02
    b1 = rng.randn(2, C, 1).astype(np.float32) * 0.01
    w2 = rng.randn(2, 3, C, C).astype(np.float32) * 0.02
    b2 = rng.randn(2, C, 1).astype(np.float32) * 0.01
    weights = [jnp.asarray(a) for a in (w1, b1, w2, b2)]
    out32 = np.asarray(fused_mrf_ct(jnp.asarray(x), weights, ks, dils,
                                    tile=256, interpret=True))
    wb = [jnp.asarray(a).astype(jnp.bfloat16) for a in (w1, b1, w2, b2)]
    out16 = np.asarray(fused_mrf_ct(jnp.asarray(x).astype(jnp.bfloat16),
                                    wb, ks, dils, tile=256,
                                    interpret=True).astype(jnp.float32))
    assert np.abs(out16 - out32).max() < 0.05


def test_phase_roundtrip():
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import from_phase, to_phase
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 32, 64).astype(np.float32))
    y = to_phase(x, 4)
    assert y.shape == (2, 128, 16)
    # row r*C+c, col q == x[c, 4q+r]
    np.testing.assert_array_equal(np.asarray(y[1, 3 * 32 + 5, 7]),
                                  np.asarray(x[1, 5, 4 * 7 + 3]))
    np.testing.assert_array_equal(np.asarray(from_phase(y, 4)),
                                  np.asarray(x))


@pytest.mark.parametrize('p', [2, 4])
def test_fused_mrf_phase_matches_reference(p):
    """Phase-major banded kernel vs per-block reference, full V1 conv mix."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, pack_mrf_phase_weights, phase_chain_halo)
    rng = np.random.RandomState(7)
    ks = (3, 7, 11)
    dils = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    B, C, T = 2, 32, 4096
    x_ct = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    x_tc = jnp.swapaxes(x_ct, 1, 2)
    params = {}
    ref_acc = None
    for j, (k, d) in enumerate(zip(ks, dils)):
        rb, w1s, b1s, w2s, b2s = {}, [], [], [], []
        for i in range(len(d)):
            w1 = rng.randn(C, C, k).astype(np.float32) * 0.02
            b1 = rng.randn(C).astype(np.float32) * 0.01
            w2 = rng.randn(C, C, k).astype(np.float32) * 0.02
            b2 = rng.randn(C).astype(np.float32) * 0.01
            rb[f'convs1_{i}'] = {'w': jnp.asarray(w1), 'b': jnp.asarray(b1)}
            rb[f'convs2_{i}'] = {'w': jnp.asarray(w2), 'b': jnp.asarray(b2)}
            w1s.append(np.transpose(w1, (2, 1, 0)))
            w2s.append(np.transpose(w2, (2, 1, 0)))
            b1s.append(b1)
            b2s.append(b2)
        params[f'resblock_0_{j}'] = rb
        r = resblock1_reference(x_tc, jnp.asarray(np.stack(w1s)),
                                jnp.asarray(np.stack(b1s)),
                                jnp.asarray(np.stack(w2s)),
                                jnp.asarray(np.stack(b2s)), k, d)
        ref_acc = r if ref_acc is None else ref_acc + r
    ref = np.asarray(jnp.swapaxes(ref_acc / len(ks), 1, 2))
    weights = pack_mrf_phase_weights(params, 0, ks, dils, p)
    out = np.asarray(fused_mrf_phase(x_ct, weights, ks, dils, p, tile=512,
                                     interpret=True))
    h = phase_chain_halo(ks, dils, p) * p
    assert np.abs(out[:, :, h:-h] - ref[:, :, h:-h]).max() < 1e-5
    assert np.abs(out - ref).max() < 0.1


def test_fused_mrf_phase_bf16():
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, pack_mrf_phase_weights)
    rng = np.random.RandomState(8)
    ks, dils, p = (3,), ((1, 3),), 4
    B, C, T = 1, 32, 2048
    x = rng.randn(B, C, T).astype(np.float32) * 0.1
    params = {'resblock_0_0': {
        f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, 3)
                                        .astype(np.float32) * .02),
                       'b': jnp.asarray(rng.randn(C)
                                        .astype(np.float32) * .01)}
        for pre in ('convs1', 'convs2') for i in range(2)}}
    weights = pack_mrf_phase_weights(params, 0, ks, dils, p)
    out32 = np.asarray(fused_mrf_phase(jnp.asarray(x), weights, ks, dils, p,
                                       tile=256, interpret=True))
    wb = [w.astype(jnp.bfloat16) for w in weights]
    out16 = np.asarray(fused_mrf_phase(
        jnp.asarray(x).astype(jnp.bfloat16), wb, ks, dils, p, tile=256,
        interpret=True).astype(jnp.float32))
    assert np.abs(out16 - out32).max() < 0.05


@pytest.mark.parametrize('C', [32, 64])
def test_fused_mrf_ct_merged_taps(C):
    """merge_taps=True (stacked-K matmuls) matches the per-tap form."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import fused_mrf_ct
    rng = np.random.RandomState(5)
    ks = (3, 7)
    dils = ((1, 3, 5), (1, 3, 5))
    B, T = 2, 512
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    per_tap, merged = [], []
    for k, d in zip(ks, dils):
        w1 = jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02)
        b1 = jnp.asarray(rng.randn(len(d), C, 1).astype(np.float32) * .01)
        w2 = jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02)
        b2 = jnp.asarray(rng.randn(len(d), C, 1).astype(np.float32) * .01)
        per_tap += [w1, b1, w2, b2]
        m1 = jnp.transpose(w1, (0, 2, 1, 3)).reshape(len(d), C, k * C)
        m2 = jnp.transpose(w2, (0, 2, 1, 3)).reshape(len(d), C, k * C)
        merged += [m1, b1, m2, b2]
    a = np.asarray(fused_mrf_ct(x, per_tap, ks, dils, tile=256,
                                interpret=True))
    b = np.asarray(fused_mrf_ct(x, merged, ks, dils, tile=256,
                                merge_taps=True, interpret=True))
    assert np.abs(a - b).max() < 1e-5


def test_fused_mrf_phase_int8():
    """int8 chain (per-row weight scales, per-tile activation scales)
    tracks the f32 kernel within the quantized-serving error budget."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, pack_mrf_phase_weights)
    rng = np.random.RandomState(11)
    ks = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    B, C, T, p = 1, 32, 8192, 4
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    params = {}
    for j, (k, d) in enumerate(zip(ks, dils)):
        params[f'resblock_0_{j}'] = {
            f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, k)
                                            .astype(np.float32) * .05),
                           'b': jnp.asarray(rng.randn(C)
                                            .astype(np.float32) * .01)}
            for pre in ('convs1', 'convs2') for i in range(len(d))}
    weights = pack_mrf_phase_weights(params, 0, ks, dils, p)
    ref = np.asarray(fused_mrf_phase(x, weights, ks, dils, p, tile=512,
                                     interpret=True))
    q8 = np.asarray(fused_mrf_phase(x, weights, ks, dils, p, tile=512,
                                    int8_chain=True, interpret=True))
    rel = np.linalg.norm(q8 - ref) / np.linalg.norm(ref)
    # ~40 dB per conv accumulating over the 18-conv chain: expect a few %
    assert rel < 0.06, rel
    assert np.isfinite(q8).all()


def test_fused_mrf_ct_int8():
    """int8 per-tap ct kernel (wide levels) within the same budget."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import fused_mrf_ct
    rng = np.random.RandomState(12)
    ks = (3, 7)
    dils = ((1, 3, 5), (1, 3, 5))
    B, C, T = 2, 128, 2048
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    weights = []
    for k, d in zip(ks, dils):
        weights += [
            jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02),
            jnp.asarray(rng.randn(len(d), C, 1).astype(np.float32) * .01),
            jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02),
            jnp.asarray(rng.randn(len(d), C, 1).astype(np.float32) * .01)]
    ref = np.asarray(fused_mrf_ct(x, weights, ks, dils, tile=512,
                                  interpret=True))
    q8 = np.asarray(fused_mrf_ct(x, weights, ks, dils, tile=512,
                                 int8_chain=True, interpret=True))
    rel = np.linalg.norm(q8 - ref) / np.linalg.norm(ref)
    assert rel < 0.06, rel


def test_phase_compact_staging_matches():
    """Compact staging (skip the banded form's all-zero column blocks,
    run-merged writes) vs the full form, on every chain mode:
    bit-identical for int8-static-fused and dynamic int8 (the removed
    blocks contribute exact integer zeros to the s32 accumulator; the
    dynamic per-tile amax precedes staging), and ~1e-7 partial-sum
    regrouping on bf16/f32. ``compact`` is passed as an explicit static
    jit arg (not via env) so each setting genuinely retraces — an env
    flip would not re-key the jit cache."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, pack_mrf_phase_weights)
    rng = np.random.RandomState(21)
    C, p, B, T = 32, 4, 1, 4096
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

    def run(compact, **kw):
        return np.asarray(fused_mrf_phase(
            x, w, ks, dils, p, tile=512, compact=compact,
            interpret=True, **kw))

    q8f = {'int8_chain': True, 'act_scales': scales, 'int8_fused': True}
    assert np.array_equal(run(False, **q8f), run(True, **q8f))
    dyn = {'int8_chain': True}
    assert np.array_equal(run(False, **dyn), run(True, **dyn))
    full, comp = run(False), run(True)
    rel = (np.linalg.norm(comp - full)
           / (np.linalg.norm(full) + 1e-30))
    assert rel < 1e-6, rel
    assert np.isfinite(comp).all()


def test_fused_mrf_tc_int8_static():
    """tc-layout int8-static kernel (wide levels): dense FLOPs at the s8
    MXU rate with act scales folded into the input-channel weight axis —
    tracks the f32 tc kernel within the quantized-serving budget."""
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import _conv1d, _lrelu
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_tc, pack_mrf_tc_int8_weights, pack_mrf_tc_weights)
    rng = np.random.RandomState(13)
    ks = (3, 7)
    dils = ((1, 3, 5), (1, 3, 5))
    B, C, T = 1, 128, 2048
    x_ct = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    params = {}
    for j, (k, d) in enumerate(zip(ks, dils)):
        params[f'resblock_0_{j}'] = {
            f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, k)
                                            .astype(np.float32) * .02),
                           'b': jnp.asarray(rng.randn(C)
                                            .astype(np.float32) * .01)}
            for pre in ('convs1', 'convs2') for i in range(len(d))}
    # calibration-style per-conv input amax (exactly what
    # calibrate_act_scales records for this level)
    scales = []
    for j, (k, ds) in enumerate(zip(ks, dils)):
        rb = params[f'resblock_0_{j}']
        cur, s1s, s2s = x_ct, [], []
        for i, d in enumerate(ds):
            t1 = _lrelu(cur)
            s1s.append(jnp.max(jnp.abs(t1), axis=(0, 2)))
            a = _conv1d(t1, rb[f'convs1_{i}']['w'], rb[f'convs1_{i}']['b'],
                        dilation=d)
            t2 = _lrelu(a)
            s2s.append(jnp.max(jnp.abs(t2), axis=(0, 2)))
            cur = cur + _conv1d(t2, rb[f'convs2_{i}']['w'],
                                rb[f'convs2_{i}']['b'])
        scales.append((np.asarray(jnp.stack(s1s)),
                       np.asarray(jnp.stack(s2s))))

    x_tc = jnp.swapaxes(x_ct, 1, 2)
    w_f = pack_mrf_tc_weights(params, 0, ks, dils)
    ref = np.asarray(fused_mrf_tc(x_tc, w_f, ks, dils, tile=512,
                                  interpret=True))
    w_q = pack_mrf_tc_int8_weights(params, 0, ks, dils, scales)
    q8 = np.asarray(fused_mrf_tc(x_tc, w_q, ks, dils, tile=512,
                                 interpret=True, q8=True))
    rel = np.linalg.norm(q8 - ref) / np.linalg.norm(ref)
    assert rel < 0.06, rel
    assert np.isfinite(q8).all()


def test_generator_int8_path():
    """Full generator with int8 fused kernels: finite, close to the f32
    pallas path, and exercises every level's routing."""
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)
    import jax
    cfg = {'sampling_rate': 22050, 'upsample_rates': [8, 8, 2, 2],
           'upsample_kernel_sizes': [16, 16, 4, 4],
           'upsample_initial_channel': 128, 'resblock': '1',
           'resblock_kernel_sizes': [3, 7], 'model_in_dim': 80,
           'resblock_dilation_sizes': [[1, 3], [1, 3]]}
    params = init_generator_params(jax.random.PRNGKey(0), cfg, std=0.05)
    rng = np.random.RandomState(13)
    mel = jnp.asarray(rng.randn(1, 80, 256).astype(np.float32))
    ref = np.asarray(generator_forward(params, mel, cfg, use_pallas=True,
                                       interpret=True))
    q8 = np.asarray(generator_forward(params, mel, cfg, use_pallas=True,
                                      int8=True, interpret=True))
    assert np.isfinite(q8).all()
    rel = (np.linalg.norm(q8 - ref)
           / max(np.linalg.norm(ref), 1e-9))
    assert rel < 0.1, rel


def test_generator_int8_env_routing(monkeypatch):
    """DAFT_VOC_INT8=1 routes generator_forward to the int8 kernels (same
    result as the explicit int8=True argument)."""
    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)
    cfg = {'sampling_rate': 22050, 'upsample_rates': [8, 8, 2, 2],
           'upsample_kernel_sizes': [16, 16, 4, 4],
           'upsample_initial_channel': 256, 'resblock': '1',
           'resblock_kernel_sizes': [3], 'model_in_dim': 80,
           'resblock_dilation_sizes': [[1, 3]]}
    params = init_generator_params(jax.random.PRNGKey(0), cfg, std=0.05)
    mel = jnp.asarray(np.random.RandomState(14).randn(1, 80, 64)
                      .astype(np.float32))
    explicit = np.asarray(generator_forward(params, mel, cfg,
                                            use_pallas=True, int8=True,
                                            interpret=True))
    monkeypatch.setenv('DAFT_VOC_INT8', '1')
    via_env = np.asarray(generator_forward(params, mel, cfg,
                                           use_pallas=True,
                                           interpret=True))
    np.testing.assert_array_equal(explicit, via_env)
    monkeypatch.setenv('DAFT_VOC_INT8', '0')
    off = np.asarray(generator_forward(params, mel, cfg, use_pallas=True,
                                       interpret=True))
    assert np.abs(off - explicit).max() > 0   # int8 actually changes bits


@pytest.mark.parametrize('C', [128, 256])
def test_fused_mrf_tc_interior_exact(C):
    """Time-in-sublanes MRF kernel (wide levels) vs per-block reference."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import fused_mrf_tc
    rng = np.random.RandomState(5)
    ks = (3, 7, 11)
    dils = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    B, T = 2, 1024
    x_tc = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)
    weights, ref_acc = [], None
    for k, d in zip(ks, dils):
        w1 = jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02)
        b1 = jnp.asarray(rng.randn(len(d), C).astype(np.float32) * .01)
        w2 = jnp.asarray(rng.randn(len(d), k, C, C).astype(np.float32) * .02)
        b2 = jnp.asarray(rng.randn(len(d), C).astype(np.float32) * .01)
        weights += [w1, b1, w2, b2]           # (n_dil, k, C_in, C_out)
        r = resblock1_reference(x_tc, w1, b1, w2, b2, k, d)
        ref_acc = r if ref_acc is None else ref_acc + r
    ref = np.asarray(ref_acc / len(ks))
    out = np.asarray(fused_mrf_tc(x_tc, weights, ks, dils, tile=512,
                                  interpret=True))
    h = max(resblock1_halo(k, d) for k, d in zip(ks, dils))
    assert np.abs(out[:, h:-h, :] - ref[:, h:-h, :]).max() < 1e-5
    assert np.abs(out - ref).max() < 0.1
    # the first-dilation lrelu hoist (explicit cross-block CSE) is
    # bit-identical to the per-block form
    unhoisted = np.asarray(fused_mrf_tc(x_tc, weights, ks, dils, tile=512,
                                        interpret=True, hoist=False))
    assert np.array_equal(out, np.asarray(
        fused_mrf_tc(x_tc, weights, ks, dils, tile=512, interpret=True,
                     hoist=True)))
    assert np.abs(unhoisted - out).max() == 0.0


def test_pack_mrf_tc_weights_matches_manual():
    """pack_mrf_tc_weights transposes torch-layout kernels correctly:
    the packed kernel reproduces the ct kernel's output (transposed)."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_ct, fused_mrf_tc, pack_mrf_tc_weights, pack_mrf_weights)
    rng = np.random.RandomState(6)
    ks, dils = (3, 7), ((1, 3), (1, 3))
    B, C, T = 1, 128, 512
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
    x_ct = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    w_ct = pack_mrf_weights(params, 0, ks, dils)
    y_ct = np.asarray(fused_mrf_ct(x_ct, w_ct, ks, dils, tile=256,
                                   interpret=True))
    w_tc = pack_mrf_tc_weights(params, 0, ks, dils)
    y_tc = np.asarray(fused_mrf_tc(jnp.swapaxes(x_ct, 1, 2), w_tc, ks,
                                   dils, tile=256, interpret=True))
    assert np.abs(np.swapaxes(y_tc, 1, 2) - y_ct).max() < 1e-5


def test_int8_static_act_scales_phase_and_ct():
    """Static per-channel activation scales (calibrated, folded into the
    banded weight columns) track the dynamic-scale int8 path on both the
    phase kernels (narrow levels) and the ct kernel (wide levels)."""
    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        calibrate_act_scales, generator_forward, init_generator_params)

    rng = np.random.RandomState(7)
    for cfg in (
        {'sampling_rate': 22050, 'upsample_rates': [2, 2],
         'upsample_kernel_sizes': [4, 4], 'upsample_initial_channel': 128,
         'resblock': '1', 'resblock_kernel_sizes': [3, 7],
         'resblock_dilation_sizes': [[1, 3], [1, 3]],
         'model_in_dim': 80},                      # phase levels (64/32)
        {'sampling_rate': 22050, 'upsample_rates': [2],
         'upsample_kernel_sizes': [4], 'upsample_initial_channel': 256,
         'resblock': '1', 'resblock_kernel_sizes': [3],
         'resblock_dilation_sizes': [[1, 3]],
         'model_in_dim': 80},                      # ct level (C=128)
    ):
        params = init_generator_params(jax.random.PRNGKey(0), cfg)
        mel_cal = jnp.asarray(np.log(
            rng.rand(2, 80, 128).astype(np.float32) + 1e-5))
        mel = jnp.asarray(np.log(
            rng.rand(2, 80, 128).astype(np.float32) + 1e-5))
        ref = np.asarray(generator_forward(params, mel, cfg,
                                           use_pallas=False))
        scales = calibrate_act_scales(params, mel_cal, cfg)
        dyn = np.asarray(generator_forward(
            params, mel, cfg, use_pallas=True, int8=True, interpret=True))
        stat = np.asarray(generator_forward(
            params, mel, cfg, use_pallas=True, int8=True,
            int8_act_scales=scales, interpret=True))
        cut = 64
        sl = (slice(None), slice(None), slice(cut, -cut))
        r = ref[sl]
        rel_dyn = np.linalg.norm(dyn[sl] - r) / np.linalg.norm(r)
        rel_stat = np.linalg.norm(stat[sl] - r) / np.linalg.norm(r)
        assert np.isfinite(stat).all()
        # static calibration should be in the same error band as dynamic
        # (usually better: per-channel beats per-tile)
        assert rel_stat < max(2.0 * rel_dyn, 0.05), (rel_stat, rel_dyn)


def test_fused_mrf_phase_split_matches():
    """split=2 (independent half-windows) is bit-identical in bf16 and
    within dynamic-scale noise in int8."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, pack_mrf_phase_weights)
    rng = np.random.RandomState(9)
    C, p, B, T = 32, 4, 1, 4096
    ks, dils = (3, 7), ((1, 3), (1, 3))
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
    w = pack_mrf_phase_weights(params, 0, ks, dils, p)
    y1 = np.asarray(fused_mrf_phase(x, w, ks, dils, p, tile=512,
                                    interpret=True))
    y2 = np.asarray(fused_mrf_phase(x, w, ks, dils, p, tile=512, split=2,
                                    interpret=True))
    assert np.abs(y1 - y2).max() < 1e-6


def test_int8_fused_epilogue_matches_unfused():
    """The integer-domain boundary collapse (dequant → bias → lrelu →
    requant in one s32 sweep, vocoder_kernels._requant_lrelu_s32) must
    track the separate-sweep static path: the only difference is the s32
    bias rounding, ≤ 0.5*sw1 on the preactivation — far below the
    boundary's own s8 quantization step."""
    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        calibrate_act_scales, init_generator_params)
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_ct, fused_mrf_phase, pack_mrf_phase_weights,
        pack_mrf_weights)

    rng = np.random.RandomState(17)
    # phase kernel (narrow C=32, p=4)
    ks = (3, 7)
    dils = ((1, 3), (1, 3))
    B, C, T, p = 1, 32, 4096, 4
    x = jnp.asarray(rng.randn(B, C, T).astype(np.float32) * 0.1)
    params = {}
    for j, (k, d) in enumerate(zip(ks, dils)):
        params[f'resblock_0_{j}'] = {
            f'{pre}_{i}': {'w': jnp.asarray(rng.randn(C, C, k)
                                            .astype(np.float32) * .05),
                           'b': jnp.asarray(rng.randn(C)
                                            .astype(np.float32) * .01)}
            for pre in ('convs1', 'convs2') for i in range(len(d))}
    weights = pack_mrf_phase_weights(params, 0, ks, dils, p)
    # synthetic per-channel calibration amax per conv, pack order
    scales = [jnp.asarray(0.5 + rng.rand(C).astype(np.float32))
              for _ in range(2 * sum(len(d) for d in dils))]
    sep = np.asarray(fused_mrf_phase(x, weights, ks, dils, p, tile=512,
                                     int8_chain=True, act_scales=scales,
                                     int8_fused=False, interpret=True))
    fus = np.asarray(fused_mrf_phase(x, weights, ks, dils, p, tile=512,
                                     int8_chain=True, act_scales=scales,
                                     int8_fused=True, interpret=True))
    rel = np.linalg.norm(fus - sep) / max(np.linalg.norm(sep), 1e-9)
    assert rel < 0.02, rel

    # ct kernel (wide C=128, per-tap)
    ks2 = (3,)
    dils2 = ((1, 3),)
    C2 = 128
    x2 = jnp.asarray(rng.randn(1, C2, 1024).astype(np.float32) * 0.1)
    w2 = []
    for k, d in zip(ks2, dils2):
        w2 += [jnp.asarray(rng.randn(len(d), k, C2, C2)
                           .astype(np.float32) * .02),
               jnp.asarray(rng.randn(len(d), C2, 1)
                           .astype(np.float32) * .01),
               jnp.asarray(rng.randn(len(d), k, C2, C2)
                           .astype(np.float32) * .02),
               jnp.asarray(rng.randn(len(d), C2, 1)
                           .astype(np.float32) * .01)]
    scales2 = [jnp.asarray(0.5 + rng.rand(len(d), C2).astype(np.float32))
               for k, d in zip(ks2, dils2) for _ in (0, 1)]
    sep2 = np.asarray(fused_mrf_ct(x2, w2, ks2, dils2, tile=512,
                                   int8_chain=True, act_scales=scales2,
                                   int8_fused=False, interpret=True))
    fus2 = np.asarray(fused_mrf_ct(x2, w2, ks2, dils2, tile=512,
                                   int8_chain=True, act_scales=scales2,
                                   int8_fused=True, interpret=True))
    rel2 = np.linalg.norm(fus2 - sep2) / max(np.linalg.norm(sep2), 1e-9)
    assert rel2 < 0.02, rel2


def test_fused_mrf_ptc_matches_banded():
    """The phase-tc chain (time in sublanes, phases in lanes, zero
    staging) matches the banded int8-static-fused chain to f32-epilogue
    ULP: both quantize with the same per-(r, co) joint weight scales and
    static per-channel act scales, and the s32 dot sums are exact
    integers — but the f32 dequant/bias epilogues may compile to FMA in
    one graph and mul+add in the other, and those last-ulp differences
    can cross a requant rounding threshold deeper in the chain (observed
    max ~1e-3 on a 2-block chain, rel ~2e-5; the on-TPU probe config in
    scripts/bench_ptc_probe.py happens to compile bit-identically)."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_phase, fused_mrf_ptc, pack_mrf_phase_weights,
        pack_mrf_ptc_weights, to_phase)
    rng = np.random.RandomState(33)
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
    xp = to_phase(x, p)                        # (B, pC, Q)
    # level-entry act scales in both packers' formats
    s_flat = [0.3 + rng.rand(C).astype(np.float32)
              for _ in range(2 * sum(len(d) for d in dils))]
    lvl_scales = []
    it = iter(s_flat)
    for k, d in zip(ks, dils):
        s1 = np.stack([next(it) for _ in range(len(d))])
        s2 = np.stack([next(it) for _ in range(len(d))])
        # phase pack order is conv1, conv2 per dilation — interleave back
        lvl_scales.append((s1, s2))
    # rebuild the flat list in phase order from the level entries so both
    # packers consume identical values
    ph_scales = [s[i] for s1, s2 in lvl_scales
                 for i in range(s1.shape[0]) for s in (s1, s2)]

    w_band = pack_mrf_phase_weights(params, 0, ks, dils, p)
    y_band = np.asarray(fused_mrf_phase(
        xp, w_band, ks, dils, p, tile=512, in_phase=True, out_phase=True,
        int8_chain=True, act_scales=ph_scales, int8_fused=True,
        compact=True, interpret=True))         # (B, pC, Q)

    w_ptc = pack_mrf_ptc_weights(params, 0, ks, dils, p, lvl_scales)
    y_ptc = np.asarray(fused_mrf_ptc(
        jnp.swapaxes(xp, 1, 2), w_ptc, ks, dils, p, tile=512,
        interpret=True))                       # (B, Q, pC)
    yp = np.swapaxes(y_ptc, 1, 2)
    rel = (np.linalg.norm(yp - y_band)
           / (np.linalg.norm(y_band) + 1e-30))
    assert rel < 1e-4, rel
    assert np.isfinite(y_ptc).all()


def test_generator_ptc_int8_serving():
    """Full-generator int8-static serving with the ptc tail (ups
    prologue + conv_post epilogue) tracks the banded int8 path inside
    the quantized-serving band (the fused-ups dynamic per-tile scale
    sees a different halo window, so the paths are close but not
    bit-identical) and the f32 XLA reference inside the int8 budget."""
    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        calibrate_act_scales, generator_forward, init_generator_params)
    params = init_generator_params(jax.random.PRNGKey(5))
    mel = jnp.asarray(np.random.RandomState(6).randn(1, 80, 64)
                      .astype(np.float32))
    scales = calibrate_act_scales(params, mel)
    ref = np.asarray(generator_forward(params, mel, use_pallas=False),
                     np.float64)
    outs = {}
    os.environ['DAFT_PTC_MIN_BATCH'] = '1'   # B=1 test mel
    try:
        for flag in ('0', '1'):
            os.environ['DAFT_MRF_PTC'] = flag
            try:
                outs[flag] = np.asarray(generator_forward(
                    params, mel, use_pallas=True, int8=True,
                    int8_act_scales=scales, interpret=True), np.float64)
            finally:
                os.environ.pop('DAFT_MRF_PTC', None)
    finally:
        os.environ.pop('DAFT_PTC_MIN_BATCH', None)
    assert outs['1'].shape == ref.shape
    rel_paths = (np.linalg.norm(outs['1'] - outs['0'])
                 / (np.linalg.norm(outs['0']) + 1e-30))
    cut = 2048
    rel_ref = (np.linalg.norm(outs['1'][..., cut:-cut]
                              - ref[..., cut:-cut])
               / (np.linalg.norm(ref[..., cut:-cut]) + 1e-30))
    assert rel_paths < 0.05, rel_paths
    assert rel_ref < 0.08, rel_ref


def test_generator_ptc_int8_dynamic():
    """The dynamic-scale int8 tier (no calibration) also routes the
    narrow tail through the phase-tc kernel: tracks the banded dynamic
    path inside the quantized-serving band (per-tile amax windows differ
    between the forms' halo extents, so not bit-identical) and the f32
    reference inside the int8 budget."""
    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)
    params = init_generator_params(jax.random.PRNGKey(8))
    mel = jnp.asarray(np.random.RandomState(9).randn(1, 80, 64)
                      .astype(np.float32))
    ref = np.asarray(generator_forward(params, mel, use_pallas=False),
                     np.float64)
    outs = {}
    os.environ['DAFT_PTC_MIN_BATCH'] = '1'   # B=1 test mel
    try:
        for flag in ('0', '1'):
            os.environ['DAFT_MRF_PTC_DYN'] = flag
            try:
                outs[flag] = np.asarray(generator_forward(
                    params, mel, use_pallas=True, int8=True,
                    interpret=True), np.float64)
            finally:
                os.environ.pop('DAFT_MRF_PTC_DYN', None)
    finally:
        os.environ.pop('DAFT_PTC_MIN_BATCH', None)
    rel_paths = (np.linalg.norm(outs['1'] - outs['0'])
                 / (np.linalg.norm(outs['0']) + 1e-30))
    cut = 2048
    rel_ref = (np.linalg.norm(outs['1'][..., cut:-cut]
                              - ref[..., cut:-cut])
               / (np.linalg.norm(ref[..., cut:-cut]) + 1e-30))
    assert rel_paths < 0.08, rel_paths
    assert rel_ref < 0.10, rel_ref


def test_generator_ptc_bf16_serving():
    """The bf16 serving tier routes the narrow tail through the phase-tc
    kernel in float-dot mode (fdot: same zero-staging shift matrices,
    unquantized bf16 dots). Tracks the banded bf16 chain inside the bf16
    rounding band and the f32 XLA reference inside the bf16-tier
    budget."""
    import jax
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)
    params = init_generator_params(jax.random.PRNGKey(11))
    mel = jnp.asarray(np.random.RandomState(12).randn(1, 80, 64)
                      .astype(np.float32))
    ref = np.asarray(generator_forward(params, mel, use_pallas=False),
                     np.float64)
    p16 = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)
    m16 = mel.astype(jnp.bfloat16)
    outs = {}
    os.environ['DAFT_PTC_MIN_BATCH'] = '1'   # B=1 test mel
    try:
        for flag in ('0', '1'):
            os.environ['DAFT_MRF_PTC_BF16'] = flag
            try:
                outs[flag] = np.asarray(generator_forward(
                    p16, m16, use_pallas=True, interpret=True),
                    np.float64)
            finally:
                os.environ.pop('DAFT_MRF_PTC_BF16', None)
    finally:
        os.environ.pop('DAFT_PTC_MIN_BATCH', None)
    assert outs['1'].shape == ref.shape
    rel_paths = (np.linalg.norm(outs['1'] - outs['0'])
                 / (np.linalg.norm(outs['0']) + 1e-30))
    cut = 2048
    rel_ref = (np.linalg.norm(outs['1'][..., cut:-cut]
                              - ref[..., cut:-cut])
               / (np.linalg.norm(ref[..., cut:-cut]) + 1e-30))
    assert rel_paths < 0.03, rel_paths
    assert rel_ref < 0.05, rel_ref
