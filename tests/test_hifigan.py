"""HiFi-GAN generator parity vs the reference torch implementation
(reference: src/daft_exprt/vocoder/hifigan.py:125-184)."""
import jax
import numpy as np
import pytest
import torch

from daft_exprt_tpu.models.hifigan import (
    HiFiGanVocoder, convert_torch_generator, generator_forward,
    init_generator_params,
)

from tests.ref_loader import load_reference_module

SMALL_CONFIG = {
    'sampling_rate': 22050,
    'upsample_rates': [8, 2],
    'upsample_kernel_sizes': [16, 4],
    'upsample_initial_channel': 32,
    'resblock': '1',
    'resblock_kernel_sizes': [3, 7],
    'resblock_dilation_sizes': [[1, 3], [1, 3]],
    'model_in_dim': 80,
}


@pytest.fixture(scope='module')
def ref_hifigan():
    return load_reference_module('vocoder.hifigan')


def test_generator_parity_small(ref_hifigan):
    torch.manual_seed(0)
    tgen = ref_hifigan.HiFiGANGenerator(SMALL_CONFIG)
    tgen.eval()
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    params = convert_torch_generator(sd, SMALL_CONFIG)

    rng = np.random.RandomState(0)
    mel = rng.randn(1, 80, 23).astype(np.float32)
    with torch.no_grad():
        t_out = tgen(torch.FloatTensor(mel)).numpy()
    j_out = np.asarray(generator_forward(params, mel, SMALL_CONFIG))
    assert j_out.shape == t_out.shape
    assert np.max(np.abs(j_out - t_out)) < 1e-5


def test_generator_parity_after_weight_norm_removal(ref_hifigan):
    """Conversion must also work on inference checkpoints (weight norm
    already removed, plain .weight keys)."""
    torch.manual_seed(1)
    tgen = ref_hifigan.HiFiGANGenerator(SMALL_CONFIG)
    tgen.remove_weight_norm()
    tgen.eval()
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    params = convert_torch_generator(sd, SMALL_CONFIG)
    rng = np.random.RandomState(1)
    mel = rng.randn(2, 80, 17).astype(np.float32)
    with torch.no_grad():
        t_out = tgen(torch.FloatTensor(mel)).numpy()
    j_out = np.asarray(generator_forward(params, mel, SMALL_CONFIG))
    assert np.max(np.abs(j_out - t_out)) < 1e-5


def test_vocoder_wrapper(ref_hifigan):
    torch.manual_seed(2)
    tgen = ref_hifigan.HiFiGANGenerator(SMALL_CONFIG)
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    params = convert_torch_generator(sd, SMALL_CONFIG)
    voc = HiFiGanVocoder(params=params, config=SMALL_CONFIG)
    mel = np.random.RandomState(3).randn(80, 11).astype(np.float32)
    wav = voc.infer(mel)
    assert wav.shape == (11 * 16,)
    assert wav.dtype == np.float32
    assert np.abs(wav).max() <= 1.0


def test_init_generator_shapes():
    import jax
    params = init_generator_params(jax.random.PRNGKey(0), SMALL_CONFIG)
    mel = np.zeros((1, 80, 8), dtype=np.float32)
    out = np.asarray(generator_forward(params, mel, SMALL_CONFIG))
    assert out.shape == (1, 1, 8 * 16)


def test_conv_transpose_polyphase_matches_dilated():
    """Polyphase lowering == input-dilated lowering for both V1 levels."""
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        _conv_transpose1d, _conv_transpose1d_poly)
    rng = np.random.RandomState(7)
    for C_in, C_out, k, s in [(16, 8, 16, 8), (16, 8, 4, 2)]:
        p = (k - s) // 2
        x = jnp.asarray(rng.randn(2, C_in, 37).astype(np.float32))
        w = jnp.asarray(rng.randn(C_in, C_out, k).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C_out).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, jnp.flip(jnp.swapaxes(w, 0, 1), axis=-1),
            window_strides=(1,), padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=('NCH', 'OIH', 'NCH')) + b[None, :, None]
        out = _conv_transpose1d(x, w, b, stride=s, padding=p)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_conv_transpose1d_phase_matches_standard():
    """Phase-emitting transposed conv == standard, across phase depths."""
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import _conv_transpose1d
    from daft_exprt_tpu.ops.vocoder_kernels import (
        conv_transpose1d_phase, from_phase, to_phase)
    rng = np.random.RandomState(8)
    for s, k, pin in [(2, 4, 1), (2, 4, 2), (8, 16, 1), (4, 8, 2)]:
        C_in, C_out, U = 16, 24, 32
        w = jnp.asarray(rng.randn(C_in, C_out, k).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C_out).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.randn(1, C_in, U * pin).astype(np.float32))
        y_std = _conv_transpose1d(x, w, b, stride=s, padding=(k - s) // 2)
        xp = to_phase(x, pin) if pin > 1 else x
        y_p = conv_transpose1d_phase(xp, w, b, stride=s,
                                     padding=(k - s) // 2, p_in=pin)
        np.testing.assert_allclose(np.asarray(from_phase(y_p, s * pin)),
                                   np.asarray(y_std), atol=1e-4)


def test_phase_conv1d_exact():
    """SAME conv in phase layout is exact (incl. edges) vs standard."""
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import _conv1d
    from daft_exprt_tpu.ops.vocoder_kernels import (
        from_phase, phase_conv1d, to_phase)
    rng = np.random.RandomState(9)
    for p, k, d in [(4, 7, 1), (2, 3, 1), (4, 3, 3), (8, 11, 1)]:
        C_in, C_out, T = 16, 8, 64
        w = jnp.asarray(rng.randn(C_out, C_in, k).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C_out).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.randn(1, C_in, T).astype(np.float32))
        y_std = _conv1d(x, w, b, dilation=d)
        y_p = from_phase(phase_conv1d(to_phase(x, p), w, b, p, dilation=d),
                         p)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_std),
                                   atol=1e-4)


def test_generator_phase_chain_matches_xla():
    """Full phase-native tail chain (phase upsample -> phase MRF kernels
    -> phase conv_post) vs the standard XLA path, interpret mode."""
    import jax.numpy as jnp
    cfg = {'sampling_rate': 22050, 'upsample_rates': [2, 2],
           'upsample_kernel_sizes': [4, 4], 'upsample_initial_channel': 128,
           'resblock': '1', 'resblock_kernel_sizes': [3, 7],
           'resblock_dilation_sizes': [[1, 3, 5], [1, 3, 5]],
           'model_in_dim': 80}
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(10)
    mel = jnp.asarray(rng.randn(2, 80, 256).astype(np.float32))
    ref = np.asarray(generator_forward(params, mel, cfg))
    out = np.asarray(generator_forward(params, mel, cfg, use_pallas=True,
                                       interpret=True))
    assert out.shape == ref.shape
    # fused-chain edge semantics only differ inside the receptive field
    assert np.abs(out[:, :, 256:-256] - ref[:, :, 256:-256]).max() < 1e-4


def test_fused_conv_post_epilogue_engages_and_matches():
    """The conv_post epilogue (lrelu -> conv_post -> tanh fused into the
    last phase kernel) must actually engage for the V1 tail geometry and
    match the separate phase_conv1d tail exactly on interior samples."""
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import _pallas_mrf_phase
    from daft_exprt_tpu.ops.vocoder_kernels import (
        from_phase, phase_conv1d, to_phase)
    cfg = {'sampling_rate': 22050, 'upsample_rates': [2, 2],
           'upsample_kernel_sizes': [4, 4], 'upsample_initial_channel': 128,
           'resblock': '1', 'resblock_kernel_sizes': [3, 7, 11],
           'resblock_dilation_sizes': [[1, 3, 5]] * 3,
           'model_in_dim': 80}
    params = init_generator_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(4)
    p, C, Q = 4, 32, 512
    x_p = jnp.asarray(rng.randn(2, p * C, Q).astype(np.float32) * 0.3)
    level = 1
    y_post, applied = _pallas_mrf_phase(params, x_p, level, cfg, p,
                                        post=params['conv_post'],
                                        interpret=True)
    assert applied, 'conv_post epilogue did not engage for V1 geometry'
    assert y_post.shape == (2, p, Q)
    # reference: fused MRF without epilogue, then the separate tail
    y_mrf, applied2 = _pallas_mrf_phase(params, x_p, level, cfg, p,
                                        post=None, interpret=True)
    assert not applied2
    from daft_exprt_tpu.ops.vocoder_kernels import _lrelu
    ref = jnp.tanh(phase_conv1d(_lrelu(y_mrf), params['conv_post']['w'],
                                params['conv_post']['b'], p))
    a, b = np.asarray(from_phase(y_post, p)), np.asarray(from_phase(ref, p))
    # interiors exact (same arithmetic); edges see the kernel's halo
    # zero-padding vs phase_conv1d's SAME padding
    assert np.abs(a[:, :, 64:-64] - b[:, :, 64:-64]).max() < 1e-5


def test_fast_vocoder_wrapper_close_to_exact():
    """HiFiGanVocoder(fast=True) (bf16 + fused kernels, interpreted on
    CPU) stays close to the exact f32 wrapper."""
    cfg = {'sampling_rate': 22050, 'upsample_rates': [2, 2],
           'upsample_kernel_sizes': [4, 4], 'upsample_initial_channel': 128,
           'resblock': '1', 'resblock_kernel_sizes': [3],
           'resblock_dilation_sizes': [[1, 3]], 'model_in_dim': 80}
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    mel = np.random.RandomState(3).randn(80, 256).astype(np.float32)
    exact = HiFiGanVocoder(params=params, config=cfg, fast=False).infer(mel)
    fast = HiFiGanVocoder(params=params, config=cfg, fast=True).infer(mel)
    assert fast.shape == exact.shape
    assert np.abs(fast - exact).max() < 0.05
    assert np.abs(fast - exact).mean() < 5e-3
    # arbitrary (non-128-multiple) length: bucket-padded then cropped
    mel_odd = mel[:, :137]
    exact_odd = HiFiGanVocoder(params=params, config=cfg,
                               fast=False).infer(mel_odd)
    fast_odd = HiFiGanVocoder(params=params, config=cfg,
                              fast=True).infer(mel_odd)
    assert fast_odd.shape == exact_odd.shape == (137 * 4,)
    # interior matches; the crop boundary sees pad frames in its
    # receptive field
    assert np.abs(fast_odd[:-64] - exact_odd[:-64]).max() < 0.05


def test_download_default_checkpoint_gated_and_file_url(tmp_path,
                                                        monkeypatch):
    """Universal-checkpoint auto-download (reference:
    vocoder/hifigan.py:43-68): offline default raises a clean error;
    with DAFT_ALLOW_DOWNLOAD=1 a file:// source downloads, caches, and
    loads through HiFiGanVocoder with no checkpoint_path."""
    from daft_exprt_tpu.models.hifigan import (
        DEFAULT_CHECKPOINT_NAME, download_default_checkpoint)
    from tests.ref_loader import load_reference_module

    cache = tmp_path / 'cache'
    monkeypatch.setenv('DAFT_HIFIGAN_CACHE', str(cache))
    monkeypatch.delenv('DAFT_ALLOW_DOWNLOAD', raising=False)

    # offline default: clean, actionable error — no silent network access
    with pytest.raises(RuntimeError, match='DAFT_ALLOW_DOWNLOAD'):
        download_default_checkpoint()

    # build a real (tiny) generator checkpoint and serve it via file://
    ref_hifigan = load_reference_module('vocoder.hifigan')
    torch.manual_seed(0)
    tgen = ref_hifigan.HiFiGANGenerator(SMALL_CONFIG)
    src = tmp_path / 'generator.pth'
    torch.save({'generator': tgen.state_dict()}, str(src))
    monkeypatch.setenv('DAFT_ALLOW_DOWNLOAD', '1')
    monkeypatch.setenv('DAFT_HIFIGAN_URL', 'file://' + str(src))
    path = download_default_checkpoint()
    assert path == str(cache / DEFAULT_CHECKPOINT_NAME)
    assert (cache / DEFAULT_CHECKPOINT_NAME).is_file()

    # cached: a second call must not hit the URL again
    monkeypatch.setenv('DAFT_HIFIGAN_URL', 'file:///nonexistent')
    assert download_default_checkpoint() == path

    # end-to-end: no checkpoint_path → downloader → usable vocoder
    voc = HiFiGanVocoder(config=SMALL_CONFIG)
    mel = np.log(np.random.RandomState(0)
                 .rand(80, 32).astype(np.float32) + 1e-5)
    wav = voc.infer(mel)
    assert wav.shape == (32 * 16,)
    assert np.isfinite(wav).all()


def test_generator_tc_route_matches_xla():
    """A config with a wide (C>=128) level routes through the
    time-in-sublanes MRF kernel + tc-layout polyphase upsample; the
    tc→phase handoff (swapaxes into the chain) stays exact vs XLA."""
    import jax.numpy as jnp
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)
    cfg = {
        'sampling_rate': 22050,
        'upsample_rates': [8, 2],
        'upsample_kernel_sizes': [16, 4],
        'upsample_initial_channel': 256,      # level 0: C=128 → tc kernel
        'resblock': '1',
        'resblock_kernel_sizes': [3, 7],
        'resblock_dilation_sizes': [[1, 3], [1, 3]],
        'model_in_dim': 80,
    }
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(np.log(rng.rand(2, 80, 128).astype(np.float32)
                             + 1e-5))
    ref = np.asarray(generator_forward(params, mel, cfg, use_pallas=False))
    out = np.asarray(generator_forward(params, mel, cfg, use_pallas=True,
                                       interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out[:, :, 64:-64] - ref[:, :, 64:-64]).max() < 1e-4
    # kill switch falls back to the ct kernel and still matches
    import os as _os
    _os.environ['DAFT_MRF_TC'] = '0'
    try:
        out_ct = np.asarray(generator_forward(
            params, mel, cfg, use_pallas=True, interpret=True))
    finally:
        del _os.environ['DAFT_MRF_TC']
    assert np.abs(out_ct[:, :, 64:-64] - ref[:, :, 64:-64]).max() < 1e-4


def test_vocoder_int8_tier(monkeypatch):
    """fast='int8' wrapper tier runs the quantized chain (interpret on
    CPU) and stays within the serving-quality band of the exact path."""
    import jax
    from daft_exprt_tpu.models.hifigan import init_generator_params
    params = init_generator_params(jax.random.PRNGKey(0), SMALL_CONFIG)
    mel = np.log(np.random.RandomState(0)
                 .rand(80, 64).astype(np.float32) + 1e-5)
    exact = HiFiGanVocoder(params=params, config=SMALL_CONFIG,
                           fast=False).infer(mel)
    q8 = HiFiGanVocoder(params=params, config=SMALL_CONFIG,
                        fast='int8').infer(mel)
    assert q8.shape == exact.shape
    interior = slice(64, -64)
    rel = np.linalg.norm(q8[interior] - exact[interior]) \
        / (np.linalg.norm(exact[interior]) + 1e-12)
    assert rel < 0.25, rel
    # env spelling selects the same tier
    monkeypatch.setenv('DAFT_FAST_VOCODER', 'int8')
    voc = HiFiGanVocoder(params=params, config=SMALL_CONFIG)
    assert voc.fast
    q8b = voc.infer(mel)
    assert np.allclose(q8b, q8)


def test_vocoder_int8_static_calibration():
    """int8 tier with calibration mels routes through static act scales
    and stays close to the dynamic tier."""
    import jax
    from daft_exprt_tpu.models.hifigan import init_generator_params
    cfg = {
        'sampling_rate': 22050, 'upsample_rates': [2, 2],
        'upsample_kernel_sizes': [4, 4], 'upsample_initial_channel': 128,
        'resblock': '1', 'resblock_kernel_sizes': [3, 7],
        'resblock_dilation_sizes': [[1, 3], [1, 3]], 'model_in_dim': 80}
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    mel = np.log(rng.rand(80, 128).astype(np.float32) + 1e-5)
    cal = np.log(rng.rand(2, 80, 128).astype(np.float32) + 1e-5)
    exact = HiFiGanVocoder(params=params, config=cfg, fast=False).infer(mel)
    stat = HiFiGanVocoder(params=params, config=cfg, fast='int8',
                          int8_calibration_mels=cal).infer(mel)
    assert stat.shape == exact.shape
    sl = slice(64, -64)
    rel = np.linalg.norm(stat[sl] - exact[sl]) \
        / (np.linalg.norm(exact[sl]) + 1e-12)
    assert rel < 0.1, rel


def test_fast_tier_env_int8_upgrade(monkeypatch):
    """DAFT_VOC_INT8=1 upgrades fast=True to the int8 tier (the
    README-documented pre-tier spelling)."""
    import jax
    from daft_exprt_tpu.models.hifigan import init_generator_params
    # channels must be %32 for the int8 kernels to engage
    cfg = {'sampling_rate': 22050, 'upsample_rates': [2, 2],
           'upsample_kernel_sizes': [4, 4],
           'upsample_initial_channel': 128, 'resblock': '1',
           'resblock_kernel_sizes': [3],
           'resblock_dilation_sizes': [[1, 3]], 'model_in_dim': 80}
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    mel = np.log(np.random.RandomState(0)
                 .rand(80, 128).astype(np.float32) + 1e-5)
    explicit = HiFiGanVocoder(params=params, config=cfg,
                              fast='int8').infer(mel)
    monkeypatch.setenv('DAFT_VOC_INT8', '1')
    upgraded = HiFiGanVocoder(params=params, config=cfg,
                              fast=True).infer(mel)
    assert np.allclose(upgraded, explicit)
    # 'bf16' spelling stays full-precision even with the env set
    bf16 = HiFiGanVocoder(params=params, config=cfg,
                          fast='bf16').infer(mel)
    assert not np.allclose(bf16, explicit)
