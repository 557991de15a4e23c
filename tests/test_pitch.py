"""Pitch tracker validation.

The on-device JAX tracker is checked for F0 accuracy on synthetic
glottal-pulse signals, and (when the bundled reference binary runs) for
agreement with the reference REAPER protocol
(reference: src/daft_exprt/extract_features.py:237-284; the binary emits a
per-sample int16 F0 track in Hz, -1 for unvoiced — verified empirically).
"""
import os

import numpy as np
import pytest
from scipy.signal import lfilter

from daft_exprt_tpu.frontend.pitch import extract_pitch, per_sample_f0_device
from daft_exprt_tpu.hparams import HyperParams

SR = 22050
REF_BINARY = '/root/reference/src/daft_exprt/bin/reaper/linux/reaper'


def make_hp():
    return HyperParams(verbose=False, training_files='x', validation_files='x',
                       output_directory='/tmp/dft_tests', language='english',
                       speakers=['spk'])


def glottal_signal(f0hz, dur=1.0, sr=SR):
    """Impulse train through vocal-tract-ish resonators (voice-like)."""
    n = int(sr * dur)
    sig = np.zeros(n)
    idx = np.arange(0, n, sr / f0hz).astype(int)
    sig[idx[idx < n]] = 1.0
    sig = lfilter([1.0], [1, -1.8 * np.cos(2 * np.pi * 500 / sr), 0.81], sig)
    sig = lfilter([1.0], [1, -1.9 * np.cos(2 * np.pi * 1500 / sr), 0.92], sig)
    return (sig / (np.abs(sig).max() * 1.2)).astype(np.float32)


@pytest.mark.parametrize('f0', [120, 220, 330])
def test_device_tracker_accuracy(f0):
    hp = make_hp()
    wav = glottal_signal(f0)
    track = per_sample_f0_device(wav, SR, hp)
    assert len(track) == len(wav)
    voiced = track[track > 0]
    assert len(voiced) > 0.7 * len(track), 'voiced region too small'
    med = np.median(voiced.astype(np.float64))
    assert abs(med - f0) / f0 < 0.03, f'median {med} vs {f0}'


def test_device_tracker_silence_unvoiced():
    hp = make_hp()
    wav = (np.random.RandomState(0).randn(SR) * 1e-4).astype(np.float32)
    track = per_sample_f0_device(wav, SR, hp)
    assert (track <= 0).mean() > 0.9


def test_extract_pitch_log_protocol():
    hp = make_hp()
    wav = glottal_signal(150)
    frames = extract_pitch(wav, SR, hp, method='device')
    # per-sample track decimated by hop → ~len(wav)/hop frames
    expected = len(wav) // hp.hop_length + (1 if len(wav) % hp.hop_length == 0
                                            else 1)
    assert abs(len(frames) - expected) <= 1
    voiced = frames[frames > 0]
    assert np.allclose(np.exp(np.median(voiced)), 150, rtol=0.05)
    assert (frames >= 0).all()


NATIVE_BINARY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native', 'pitch', 'build', 'daft-reaper')


@pytest.mark.skipif(not os.access(NATIVE_BINARY, os.X_OK),
                    reason='native binary not built (make -C native/pitch)')
@pytest.mark.parametrize('f0', [120, 220, 330])
def test_native_binary_accuracy(f0):
    """The C++ tracker (native/pitch) honors the binary protocol and tracks
    voice-like F0 within 3%."""
    from daft_exprt_tpu.frontend.pitch import per_sample_f0_native
    hp = make_hp()
    wav = glottal_signal(f0)
    track = per_sample_f0_native(wav, SR, hp, binary=NATIVE_BINARY)
    assert len(track) == len(wav)
    assert track.dtype == np.int16
    voiced = track[track > 0].astype(np.float64)
    assert len(voiced) > 0.7 * len(track)
    assert abs(np.median(voiced) - f0) / f0 < 0.03


@pytest.mark.skipif(not (os.access(NATIVE_BINARY, os.X_OK)
                         and os.access(REF_BINARY, os.X_OK)),
                    reason='binaries unavailable')
def test_native_binary_vs_reference():
    """Cross-check native tracker against the reference REAPER binary."""
    from daft_exprt_tpu.frontend.pitch import per_sample_f0_native
    hp = make_hp()
    wav = glottal_signal(180)
    ours = per_sample_f0_native(wav, SR, hp,
                                binary=NATIVE_BINARY).astype(np.float64)
    ref = per_sample_f0_native(wav, SR, hp,
                               binary=REF_BINARY).astype(np.float64)
    n = min(len(ours), len(ref))
    ours, ref = ours[:n], ref[:n]
    both = (ours > 0) & (ref > 0)
    assert ((ours > 0) == (ref > 0)).mean() > 0.9
    rel = np.abs(ours[both] - ref[both]) / ref[both]
    assert np.median(rel) < 0.03


@pytest.mark.skipif(not os.access(REF_BINARY, os.X_OK),
                    reason='reference binary unavailable')
@pytest.mark.parametrize('f0', [120, 220])
def test_against_reference_binary(f0):
    """Tolerance-based agreement with the reference tracker on voice-like
    signals: voicing decisions mostly agree, voiced F0 within 5%."""
    hp = make_hp()
    wav = glottal_signal(f0)
    ours = per_sample_f0_device(wav, SR, hp).astype(np.float64)

    from daft_exprt_tpu.frontend.pitch import per_sample_f0_native
    ref = per_sample_f0_native(wav, SR, hp, binary=REF_BINARY).astype(np.float64)

    n = min(len(ours), len(ref))
    ours, ref = ours[:n], ref[:n]
    both_voiced = (ours > 0) & (ref > 0)
    agreement = ((ours > 0) == (ref > 0)).mean()
    assert agreement > 0.9, f"voicing agreement {agreement}"
    rel = np.abs(ours[both_voiced] - ref[both_voiced]) / ref[both_voiced]
    assert np.median(rel) < 0.05


STYLE_BANK = '/root/reference/scripts/style_bank/english'


def _style_wavs(n=4):
    import glob
    return sorted(glob.glob(os.path.join(STYLE_BANK, '*.wav')))[:n]


@pytest.mark.skipif(not (os.access(REF_BINARY, os.X_OK) and _style_wavs()),
                    reason='reference binary or style-bank audio unavailable')
@pytest.mark.parametrize('tracker', ['native', 'device'])
def test_real_speech_parity_vs_reference(tracker):
    """Parity with the reference REAPER binary on REAL speech (the bundled
    style-bank wavs): per-file voicing agreement > 0.9 and median voiced-F0
    deviation < 2%. This is the bar that matters — the constant-uv-cost
    model passed every synthetic test while over-voicing real speech to
    0.49-0.78 agreement (fricatives/breaths have weak but nonzero NCCF)."""
    if tracker == 'native' and not os.access(NATIVE_BINARY, os.X_OK):
        pytest.skip('native binary not built')
    import warnings
    from daft_exprt_tpu.frontend.audio import load_wav
    from daft_exprt_tpu.frontend.pitch import per_sample_f0_native
    hp = make_hp()
    for path in _style_wavs():
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            wav, sr = load_wav(path, target_sr=hp.sampling_rate)
        wav = wav[:hp.sampling_rate * 3]
        ref = per_sample_f0_native(wav, sr, hp,
                                   binary=REF_BINARY).astype(np.float64)
        if tracker == 'native':
            ours = per_sample_f0_native(
                wav, sr, hp, binary=NATIVE_BINARY).astype(np.float64)
        else:
            ours = per_sample_f0_device(wav, sr, hp).astype(np.float64)
        n = min(len(ours), len(ref))
        o, r = ours[:n], ref[:n]
        agree = ((o > 0) == (r > 0)).mean()
        assert agree > 0.9, f'{os.path.basename(path)}: voicing {agree:.3f}'
        both = (o > 0) & (r > 0)
        rel = np.abs(o[both] - r[both]) / r[both]
        assert np.median(rel) < 0.02, \
            f'{os.path.basename(path)}: median F0 dev {np.median(rel):.4f}'


def test_low_energy_noise_unvoiced():
    """Quiet broadband noise (a breath/room-tone stand-in) must be called
    unvoiced even though max-NCCF over ~400 lags is well above zero."""
    hp = make_hp()
    rng = np.random.RandomState(7)
    voiced = glottal_signal(150, dur=0.6)
    noise = (0.02 * rng.randn(int(0.6 * SR))).astype(np.float32)
    wav = np.concatenate([voiced, noise, voiced])
    track = per_sample_f0_device(wav, SR, hp)
    third = len(voiced)
    assert (track[:third] > 0).mean() > 0.7
    assert (track[third:2 * third] <= 0).mean() > 0.8, \
        'noise segment over-voiced'
    assert (track[2 * third:] > 0).mean() > 0.7


def test_batched_frame_f0_matches_single():
    from daft_exprt_tpu.ops.pitch import PitchTracker
    from daft_exprt_tpu.hparams import HyperParams
    hp = HyperParams(verbose=False, training_files='x', validation_files='x',
                     output_directory='/tmp/pt', language='english',
                     speakers=['s'])
    tr = PitchTracker(hp)
    rng = np.random.RandomState(11)
    sr = hp.sampling_rate
    t = np.arange(int(0.5 * sr)) / sr
    wavs = np.stack([
        (0.5 * np.sin(2 * np.pi * 120 * t)).astype(np.float32),
        (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.01 * rng.randn(len(t))).astype(np.float32),
    ])
    batched = np.asarray(tr.batched_frame_f0(wavs))
    for i in range(2):
        single = tr.frame_f0(wavs[i])
        assert batched[i].shape == single.shape
        # identical pipeline, identical results
        np.testing.assert_allclose(batched[i], single, atol=1e-3)


def test_viterbi_envelope_matches_dense():
    """The O(S) lower-envelope Viterbi equals the dense O(S^2) version."""
    import jax.numpy as jnp
    from daft_exprt_tpu.ops.pitch import _viterbi, _viterbi_dense
    rng = np.random.RandomState(3)
    n_lags, F = 37, 60
    lags = np.arange(20, 20 + n_lags).astype(np.float64)
    log_lags = jnp.asarray(np.log(lags), jnp.float32)
    trans = jnp.asarray(np.abs(np.log(lags[:, None] / lags[None, :])),
                        jnp.float32)
    ncc = jnp.asarray(rng.uniform(-0.5, 1.0, (F, n_lags)).astype(np.float32))
    uv = jnp.float32(0.9)
    a = np.asarray(_viterbi(ncc, log_lags, uv, n_lags))
    # per-frame unvoiced local cost (the RAPT vo_bias + max-NCCF form)
    local_uv = jnp.asarray(
        rng.uniform(0.2, 1.0, (F,)).astype(np.float32))
    a2 = np.asarray(_viterbi(ncc, log_lags, uv, n_lags, local_uv=local_uv))
    b2 = np.asarray(_viterbi_dense(ncc, trans, uv, n_lags,
                                   local_uv=local_uv))
    np.testing.assert_array_equal(a2, b2)
    b = np.asarray(_viterbi_dense(ncc, trans, uv, n_lags))
    # optimal paths may differ only where costs tie exactly; with random
    # continuous scores they should be identical
    np.testing.assert_array_equal(a, b)
