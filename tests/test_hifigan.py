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
