"""Frontend pipeline tests: markers parity vs reference, TextGrid parsing,
end-to-end feature extraction, Griffin-Lim reconstruction."""
import os

import numpy as np
import pytest

from daft_exprt_tpu.frontend.duration import duration_to_integer
from daft_exprt_tpu.frontend.markers import update_markers
from daft_exprt_tpu.frontend.textgrid import read_textgrid
from daft_exprt_tpu.hparams import HyperParams

from tests.ref_loader import load_reference_module


def make_hp(**kw):
    kwargs = dict(training_files='x', validation_files='x',
                  output_directory='/tmp/dft_tests', language='english',
                  speakers=['spk'])
    kwargs.update(kw)
    return HyperParams(verbose=False, **kwargs)


# ----------------------------------------------------------------------
# update_markers parity
# ----------------------------------------------------------------------

def build_marker_lines(words_phones, sent_begin=0.37, phone_dur=0.08,
                       sil_after=None):
    """words_phones: [(word, [phones...])]; sil_after: set of word indices
    followed by a silence. Returns raw .markers lines."""
    sil_after = sil_after or set()
    lines = []
    t = sent_begin
    for w_idx, (word, phones) in enumerate(words_phones):
        for phone in phones:
            lines.append(f'{t:.3f}\t{t + phone_dur:.3f}\t{phone}\t{word}\t'
                         f'{w_idx * 2}\n')
            t += phone_dur
        if w_idx in sil_after:
            lines.append(f'{t:.3f}\t{t + 0.12:.3f}\tSIL\t<sil>\t'
                         f'{w_idx * 2 + 1}\n')
            t += 0.12
    return lines


CASES = [
    # simple sentence, whitespace boundaries
    ('hello world', [('hello', ['HH', 'AH0', 'L', 'OW1']),
                     ('world', ['W', 'ER1', 'L', 'D'])], set()),
    # punctuation boundary + end punctuation
    ('hello, world!', [('hello', ['HH', 'AH0', 'L', 'OW1']),
                       ('world', ['W', 'ER1', 'L', 'D'])], set()),
    # silence attached to a word boundary
    ('hello, world.', [('hello', ['HH', 'AH0', 'L', 'OW1']),
                       ('world', ['W', 'ER1', 'L', 'D'])], {0}),
    # apostrophe word split by the aligner: that's -> that + s
    ("that's it", [('that', ['DH', 'AE1', 'T']), ('s', ['S']),
                   ('it', ['IH1', 'T'])], set()),
    # trailing apostrophe: example' -> example
    ("an example'", [('an', ['AE1', 'N']),
                     ('example', ['IH0', 'G', 'Z', 'AE1', 'M'])], set()),
]


@pytest.fixture(scope='module')
def ref_extract():
    return load_reference_module('extract_features')


@pytest.mark.parametrize('case_idx', range(len(CASES)))
def test_update_markers_matches_reference(ref_extract, case_idx):
    sentence, words_phones, sil_after = CASES[case_idx]
    hp = make_hp()
    lines = build_marker_lines(words_phones, sil_after=sil_after)
    sent_begin = float(lines[0].split('\t')[0])
    n = len(lines)
    int_durations = list(range(3, 3 + n))

    import logging
    ours = update_markers('test', list(lines), sentence, sent_begin,
                          list(int_durations), hp)
    theirs = ref_extract.update_markers('test', list(lines), sentence,
                                        sent_begin, list(int_durations), hp,
                                        logging.getLogger('ref'))
    assert ours == theirs
    assert ours is not None
    assert ours[-1][3] == '~'                      # EOS appended
    symbols = [m[3] for m in ours]
    for s in symbols:
        assert s in hp.symbols, s


def test_update_markers_mismatch_returns_none(ref_extract):
    hp = make_hp()
    lines = build_marker_lines([('goodbye', ['G', 'UH1', 'D'])])
    import logging
    ours = update_markers('t', list(lines), 'hello', 0.37, [1, 2, 3], hp)
    theirs = ref_extract.update_markers('t', list(lines), 'hello', 0.37,
                                        [1, 2, 3], hp,
                                        logging.getLogger('ref'))
    assert ours is None and theirs is None


# ----------------------------------------------------------------------
# TextGrid parsing + markers conversion
# ----------------------------------------------------------------------

LONG_TEXTGRID = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.5
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.5
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = ""
        intervals [2]:
            xmin = 0.25
            xmax = 0.85
            text = "hello"
        intervals [3]:
            xmin = 0.85
            xmax = 1.30
            text = "world"
        intervals [4]:
            xmin = 1.30
            xmax = 1.5
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.5
        intervals: size = 6
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "sil"
        intervals [2]:
            xmin = 0.25
            xmax = 0.55
            text = "HH"
        intervals [3]:
            xmin = 0.55
            xmax = 0.85
            text = "OW1"
        intervals [4]:
            xmin = 0.85
            xmax = 1.10
            text = "W"
        intervals [5]:
            xmin = 1.10
            xmax = 1.30
            text = "D"
        intervals [6]:
            xmin = 1.30
            xmax = 1.5
            text = "sp"
'''


def test_read_textgrid_long(tmp_path):
    path = tmp_path / 'utt.TextGrid'
    path.write_text(LONG_TEXTGRID)
    tiers = read_textgrid(str(path))
    assert set(tiers) == {'words', 'phones'}
    assert len(tiers['words']) == 4
    assert tiers['words'][1] == (0.25, 0.85, 'hello')
    assert tiers['phones'][0][2] == 'sil'


def test_textgrid_to_markers(tmp_path):
    from daft_exprt_tpu.frontend.mfa import textgrid_to_markers
    path = tmp_path / 'utt.TextGrid'
    path.write_text(LONG_TEXTGRID)
    markers = textgrid_to_markers(str(path))
    # leading/tailing silences trimmed, 4 phones over 2 words remain
    assert [m[2] for m in markers] == ['HH', 'OW1', 'W', 'D']
    assert [m[3] for m in markers] == ['hello', 'hello', 'world', 'world']
    assert markers[0][0] == '0.250'


# ----------------------------------------------------------------------
# end-to-end feature extraction on a synthetic corpus
# ----------------------------------------------------------------------

def test_extract_features_end_to_end(tmp_path):
    from scipy.signal import lfilter

    from daft_exprt_tpu.frontend.extract_features import extract_features
    from daft_exprt_tpu.frontend.audio import save_wav

    sr = 22050
    dataset = tmp_path / 'dataset'
    features = tmp_path / 'features'
    spk = 'speaker_a'
    wavs_dir = dataset / spk / 'wavs'
    align_dir = dataset / spk / 'align'
    wavs_dir.mkdir(parents=True)
    align_dir.mkdir(parents=True)
    (features / spk).mkdir(parents=True)

    # 1.8s voice-like audio: leading silence + two 'words'
    n = int(1.8 * sr)
    sig = np.zeros(n)
    idx = np.arange(int(0.2 * sr), int(1.7 * sr), sr / 140).astype(int)
    sig[idx] = 1.0
    sig = lfilter([1.0], [1, -1.8 * np.cos(2 * np.pi * 500 / sr), 0.81], sig)
    sig = (sig / (np.abs(sig).max() * 1.3)).astype(np.float32)
    save_wav(str(wavs_dir / 'utt1.wav'), sig, sr)

    # markers: 'hello world' with a mid silence (times in seconds)
    phones = [(0.20, 0.45, 'HH', 'hello', '0'),
              (0.45, 0.70, 'OW1', 'hello', '0'),
              (0.70, 0.90, 'SIL', '<sil>', '1'),
              (0.90, 1.30, 'W', 'world', '2'),
              (1.30, 1.70, 'D', 'world', '2')]
    with open(align_dir / 'utt1.markers', 'w') as f:
        f.writelines(f'{b:.3f}\t{e:.3f}\t{p}\t{w}\t{wi}\n'
                     for b, e, p, w, wi in phones)
    (align_dir / 'utt1.lab').write_text('hello world')
    meta = 'utt1|hello world\n'
    (features / spk / 'metadata.csv').write_text(meta)
    (dataset / spk / 'metadata.csv').write_text(meta)

    hp = make_hp(speakers=[spk])
    extract_features(str(dataset), str(features), hp, n_jobs=1,
                     pitch_method='device')

    out = features / spk
    for ext in ('npy', 'markers', 'frames_nrg', 'symbols_nrg', 'frames_f0',
                'symbols_f0'):
        assert (out / f'utt1.{ext}').exists(), ext
    mel = np.load(out / 'utt1.npy')
    assert mel.shape[0] == 80
    with open(out / 'utt1.markers') as f:
        markers = [line.strip().split('\t') for line in f]
    # durations sum to mel frames; EOS + whitespace boundary present
    assert sum(int(m[2]) for m in markers) == mel.shape[1]
    assert markers[-1][3] == '~'
    assert any(m[3] == ' ' for m in markers)
    with open(out / 'utt1.frames_f0') as f:
        f0 = np.array([float(x) for x in f])
    assert len(f0) == mel.shape[1]
    voiced = f0[f0 > 0]
    assert np.isclose(np.exp(np.median(voiced)), 140, rtol=0.08)
    assert (out / 'config.json').exists()


# ----------------------------------------------------------------------
# Griffin-Lim
# ----------------------------------------------------------------------

def test_griffin_lim_roundtrip():
    from daft_exprt_tpu.frontend.griffin_lim import (
        griffin_lim_reconstruction_from_mel_spec,
    )
    from daft_exprt_tpu.ops.mel import MelExtractor
    hp = make_hp()
    sr = hp.sampling_rate
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = MelExtractor(hp)(wav)
    rec = griffin_lim_reconstruction_from_mel_spec(mel, hp, n_iters=30,
                                                   nnls_iters=20)
    assert np.isfinite(rec).all()
    spec = np.abs(np.fft.rfft(rec))
    freq = np.fft.rfftfreq(len(rec), 1 / sr)
    assert abs(freq[np.argmax(spec)] - 440) < 15
