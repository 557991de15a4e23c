"""Mel-spectrogram parity: our DFT-matmul extractor vs the torch.stft
pipeline of the reference (reference: src/daft_exprt/extract_features.py:345-379),
re-derived here directly with torch ops as ground truth."""
import numpy as np
import pytest
import torch

from daft_exprt_tpu.hparams import HyperParams
from daft_exprt_tpu.ops.mel import MelExtractor, frame_energy, mel_filterbank


def make_hparams(**kw):
    return HyperParams(verbose=False, training_files='x', validation_files='x',
                       output_directory='/tmp/dft_tests', language='english',
                       speakers=['spk'], **kw)


def torch_mel_reference(wav, hp):
    """torch.stft-based ground-truth mel (same math as the reference)."""
    wav_t = torch.FloatTensor(wav)
    pad = int((hp.filter_length - hp.hop_length) / 2)
    wav_t = torch.nn.functional.pad(
        wav_t.unsqueeze(0).unsqueeze(0), (pad, pad), mode='reflect').squeeze()
    fb = torch.from_numpy(mel_filterbank(
        hp.sampling_rate, hp.filter_length, hp.n_mel_channels,
        hp.mel_fmin, hp.mel_fmax)).float()
    window = torch.hann_window(hp.filter_length)
    spec = torch.stft(wav_t, hp.filter_length, hop_length=hp.hop_length,
                      win_length=hp.filter_length, window=window,
                      center=False, normalized=False, onesided=True,
                      return_complex=True)
    spec = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    mel = torch.matmul(fb, spec)
    mel = torch.log(torch.clamp(mel, min=hp.min_clipping))
    return mel.numpy()


@pytest.fixture(scope='module')
def hp():
    return make_hparams()


def test_mel_filterbank_shape_and_norm(hp):
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    assert fb.shape == (80, 513)
    # every filter is a normalized triangle: nonneg, single peak, nonzero
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak height ≈ 2 / bandwidth — check scale sanity
    assert fb.max() < 0.1


def test_mel_matches_torch_stft(hp):
    rng = np.random.RandomState(0)
    wav = (rng.randn(22050).astype(np.float32) * 0.1)
    ours = MelExtractor(hp)(wav)
    ref = torch_mel_reference(wav, hp)
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-3
    # typical error should be much tighter than the tolerance
    assert np.mean(np.abs(ours - ref)) < 1e-5


def test_mel_various_lengths(hp):
    ext = MelExtractor(hp)
    rng = np.random.RandomState(1)
    for n in [9000, 22050, 40011, 70000]:
        wav = rng.randn(n).astype(np.float32) * 0.05
        ours = ext(wav)
        ref = torch_mel_reference(wav, hp)
        assert ours.shape == ref.shape, n
        assert np.max(np.abs(ours - ref)) < 1e-3, n


def test_frame_energy(hp):
    rng = np.random.RandomState(2)
    mel = rng.randn(80, 100).astype(np.float32)
    ours = np.asarray(frame_energy(mel))
    ref = np.linalg.norm(np.exp(mel), axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_batched_extraction(hp):
    ext = MelExtractor(hp)
    rng = np.random.RandomState(3)
    wavs = [rng.randn(n).astype(np.float32) * 0.1 for n in [15000, 22050]]
    out = np.asarray(ext.batched(wavs))
    for i, wav in enumerate(wavs):
        ref = torch_mel_reference(wav, hp)
        t = ref.shape[1]
        assert np.max(np.abs(out[i, :, :t] - ref)) < 1e-3
