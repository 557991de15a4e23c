"""Duration quantization parity vs the reference implementation
(reference: src/daft_exprt/extract_features.py:69-125)."""
import numpy as np
import pytest

from daft_exprt_tpu.frontend.duration import duration_to_integer
from daft_exprt_tpu.hparams import HyperParams

from tests.ref_loader import load_reference_module


def make_hp(**kw):
    return HyperParams(verbose=False, training_files='x', validation_files='x',
                       output_directory='/tmp/dft_tests', language='english',
                       speakers=['spk'], **kw)


@pytest.fixture(scope='module')
def ref_extract():
    return load_reference_module('extract_features')


def random_segmentation(rng, n_phones, min_dur=0.03, max_dur=0.4):
    durs = rng.uniform(min_dur, max_dur, size=n_phones)
    bounds = np.concatenate([[0.0], np.cumsum(durs)])
    return [[float(bounds[i]), float(bounds[i + 1])] for i in range(n_phones)]


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_matches_reference_random(ref_extract, seed):
    hp = make_hp()
    rng = np.random.RandomState(seed)
    n_phones = rng.randint(3, 40)
    segs = random_segmentation(rng, n_phones)
    ours = duration_to_integer([list(s) for s in segs], hp)
    ref = ref_extract.duration_to_integer([list(s) for s in segs], hp)
    assert ours == ref


@pytest.mark.parametrize('seed', [10, 11, 12])
def test_matches_reference_with_nb_samples(ref_extract, seed):
    hp = make_hp()
    rng = np.random.RandomState(seed)
    segs = random_segmentation(rng, rng.randint(5, 30))
    total = sum(e - b for b, e in segs)
    nb_samples = int(total * hp.sampling_rate) + rng.randint(0, 200)
    ours = duration_to_integer([list(s) for s in segs], hp,
                               nb_samples=nb_samples)
    ref = ref_extract.duration_to_integer([list(s) for s in segs], hp,
                                          nb_samples=nb_samples)
    assert ours == ref


def test_matches_reference_centered(ref_extract):
    hp = make_hp(centered=True)
    rng = np.random.RandomState(42)
    segs = random_segmentation(rng, 12)
    ours = duration_to_integer([list(s) for s in segs], hp)
    ref = ref_extract.duration_to_integer([list(s) for s in segs], hp)
    assert ours == ref


def test_zero_duration_raises():
    hp = make_hp()
    with pytest.raises(ValueError):
        duration_to_integer([[0.0, 0.5], [0.5, 0.5], [0.5, 1.0]], hp)


def test_total_frames_consistency(ref_extract):
    """Sum of int durations must equal the mel frame count for the audio."""
    hp = make_hp()
    rng = np.random.RandomState(7)
    segs = random_segmentation(rng, 20)
    total = sum(e - b for b, e in segs)
    nb_samples = int(total * hp.sampling_rate)
    ours = duration_to_integer([list(s) for s in segs], hp,
                               nb_samples=nb_samples)
    pad = (hp.filter_length - hp.hop_length) // 2
    nb_frames = 1 + (nb_samples + 2 * pad - hp.filter_length) // hp.hop_length
    assert sum(ours) == nb_frames
