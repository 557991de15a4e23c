"""Script-layer tests: prosody-file grammar, evaluation metrics,
augmentations, adaptation masking, CLI plumbing."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from daft_exprt_tpu.hparams import HyperParams  # noqa: E402


def make_hp(**kw):
    kwargs = dict(training_files='x', validation_files='x',
                  output_directory='/tmp/dft_tests', language='english',
                  speakers=['spk'])
    kwargs.update(kw)
    return HyperParams(verbose=False, **kwargs)


def test_parse_symbol_prosody_tuple_form(tmp_path):
    from scripts.synthesize import parse_symbol_prosody_file
    hp = make_hp()
    f = tmp_path / 'prosody.txt'
    f.write_text(
        "audio/sample1.wav|[('HH', 3, 5.1, 12.0), ('AH0', 5, 5.0, 13.2), "
        "('~', 0, 0.0, 0.0)]\n"
        "# a comment line\n"
        "[('W', 4, 4.9, 11.0), ('ER1', 6, 5.2, 14.0)]\n")
    sentences, names, prosody = parse_symbol_prosody_file(str(f), hp)
    assert len(sentences) == 2
    assert names[0] == 'sample1'
    assert names[1] == 'symbol_prosody_line1'
    assert prosody[0]['durations_frames'] == [3, 5, 0]
    assert prosody[1]['pitch'] == [4.9, 5.2]


def test_parse_symbol_prosody_array_form(tmp_path):
    from scripts.synthesize import parse_symbol_prosody_file
    hp = make_hp()
    f = tmp_path / 'prosody.txt'
    f.write_text("[['HH', 'AH0'], [3, 5], [5.1, 5.0], [12.0, 13.2]]\n")
    sentences, _, prosody = parse_symbol_prosody_file(str(f), hp)
    assert sentences[0] == ['HH', 'AH0']
    assert prosody[0]['energy'] == [12.0, 13.2]


def test_parse_symbol_prosody_rejects_unknown_symbol(tmp_path):
    from scripts.synthesize import parse_symbol_prosody_file
    hp = make_hp()
    f = tmp_path / 'prosody.txt'
    f.write_text("[('XX', 3, 5.1, 12.0)]\n")
    with pytest.raises(ValueError, match='XX'):
        parse_symbol_prosody_file(str(f), hp)


def test_word_error_rate():
    from scripts.evaluation.compute_wer_and_accent_metrics import (
        word_error_rate)
    assert word_error_rate('the cat sat', 'the cat sat') == 0.0
    assert word_error_rate('the cat sat', 'the cat') == pytest.approx(1 / 3)
    assert word_error_rate('the cat sat', 'the bat sat') == pytest.approx(1 / 3)
    assert word_error_rate('the cat', 'The, cat!') == 0.0   # normalization


def test_npvi():
    from scripts.evaluation.compute_wer_and_accent_metrics import npvi
    assert npvi([1.0, 1.0, 1.0]) == 0.0
    # alternating 1,2: |1|/1.5 = 0.666... -> 66.67
    assert npvi([1.0, 2.0, 1.0]) == pytest.approx(66.6667, rel=1e-3)
    assert npvi([5.0]) is None


def test_pitch_curve_correlation():
    from scripts.evaluation.compare_pitch_curves import (
        pitch_curve_correlation)
    t = np.linspace(0, 1, 50)
    a = 100 + 10 * np.sin(2 * np.pi * t)
    b = 120 + 12 * np.sin(2 * np.pi * np.linspace(0, 1, 70))
    r = pitch_curve_correlation(a, b)
    assert r > 0.99
    a_uv = a.copy()
    a_uv[::3] = 0.0   # unvoiced dropped, correlation survives
    assert pitch_curve_correlation(a_uv, b) > 0.9


def test_augmentations():
    from scripts.generate_augmentation_examples import (
        energy_scale_mel, pitch_shift_mel, time_stretch_mel)
    mel = np.arange(80 * 10, dtype=np.float32).reshape(80, 10)
    up = pitch_shift_mel(mel, 3)
    np.testing.assert_array_equal(up[3:], mel[:-3])
    down = pitch_shift_mel(mel, -3)
    np.testing.assert_array_equal(down[:-3], mel[3:])
    stretched = time_stretch_mel(mel, 1.5)
    assert stretched.shape == (80, 15)
    np.testing.assert_allclose(stretched[:, 0], mel[:, 0])
    scaled = energy_scale_mel(mel, 2.0)
    np.testing.assert_allclose(scaled, mel + np.log(2.0))


def test_adapt_freeze_mask():
    import jax
    from scripts.adapt_speaker import make_freeze_mask
    params = {'spk_projection': {'kernel': np.zeros(3)},
              'frame_decoder': {'block_0': {'w': np.zeros(2)}},
              'style_adapter': {'g': np.zeros(1)}}
    mask = make_freeze_mask(params, ['spk_projection', 'style_adapter'])
    assert mask['spk_projection']['kernel'] is True
    assert mask['style_adapter']['g'] is True
    assert mask['frame_decoder']['block_0']['w'] is False


def test_llm_benchmark_validation():
    from scripts.benchmarks.convert_prosody_with_llm import validate_output
    orig = [('HH', 3, 5.1, 12.0), ('AH0', 5, 0.0, 13.0)]
    ok, _ = validate_output(orig, [('HH', 4, 5.2, 12.5), ('AH0', 5, 0.0, 13.0)])
    assert ok
    ok, msg = validate_output(orig, [('HH', 4, 5.2, 12.5)])
    assert not ok and 'length' in msg
    ok, msg = validate_output(orig, [('XX', 4, 5.2, 12.5),
                                     ('AH0', 5, 0.0, 13.0)])
    assert not ok and 'symbol' in msg
    ok, msg = validate_output(orig, [('HH', 4, 5.2, 12.5),
                                     ('AH0', 5, 1.0, 13.0)])
    assert not ok and 'unvoiced' in msg


def test_compute_spk_stats(tmp_path):
    from scripts.compute_spk_stats_from_prosody import compute_stats
    hp = make_hp()
    f = tmp_path / 'prosody.txt'
    f.write_text("[('HH', 3, 5.0, 12.0), ('AH0', 5, 5.4, 14.0), "
                 "('~', 0, 0.0, 0.0)]\n")
    stats = compute_stats(str(f), hp)
    assert stats['pitch']['mean'] == pytest.approx(5.2)
    assert stats['energy']['mean'] == pytest.approx(13.0)


@pytest.mark.slow
def test_cli_help_surfaces():
    """Every CLI parses --help (import + argparse wiring sanity)."""
    scripts = ['training.py', 'synthesize.py', 'extract_symbol_prosody.py',
               'compute_spk_stats_from_prosody.py', 'train_pitch_predictor.py',
               'visualize_pitch_prediction.py', 'format_dataset.py',
               'precompute_ECAPA_spk_embeddings.py', 'hifigan_sanity_check.py',
               'verify_mel_spec.py', 'adapt_speaker.py', 'adapt_accent.py',
               'generate_augmentation_examples.py',
               'analyze_embedding_manifold.py', 'make_style_bank.py',
               'evaluation/compare_pitch_curves.py',
               'evaluation/compute_wer_and_accent_metrics.py',
               'benchmarks/convert_prosody_with_llm.py']
    for script in scripts:
        result = subprocess.run(
            [sys.executable, os.path.join(REPO, 'scripts', script),
             '--help'], capture_output=True, text=True, timeout=120)
        assert result.returncode == 0, f'{script}: {result.stderr[-400:]}'


def test_dtw_distance():
    """Cosine-metric DTW normalized by warping-path length (matching the
    reference's librosa.sequence.dtw(metric='cosine') usage)."""
    from scripts.evaluation.compute_wer_and_accent_metrics import (
        dtw_distance)
    a = np.array([[1.0, 0.0], [0.7, 0.7], [0.0, 1.0]])
    assert dtw_distance(a, a) < 1e-12
    # time-warped copy still aligns at ~zero cost
    b = np.array([[1.0, 0.0], [1.0, 0.0], [0.7, 0.7], [0.0, 1.0],
                  [0.0, 1.0]])
    assert dtw_distance(a, b) < 1e-12
    # anti-aligned directions cost ~2 per step
    c = np.array([[-1.0, 0.0], [-0.7, -0.7], [0.0, -1.0]])
    assert dtw_distance(a, c) > 0.5
    # scale-invariance of the cosine metric
    assert abs(dtw_distance(a, 100.0 * b)) < 1e-12


def test_evaluate_prosody_only(tmp_path):
    """End-to-end evaluate() without any gated model-zoo externals:
    prosody metrics + JSON report + histogram plots."""
    import argparse
    from daft_exprt_tpu.frontend.audio import save_wav
    from scripts.evaluation.compute_wer_and_accent_metrics import evaluate

    sr = 22050
    t = np.arange(sr) / sr
    rng = np.random.RandomState(0)
    lines = []
    for i, f0 in enumerate((150.0, 220.0)):
        wav = (0.3 * np.sin(2 * np.pi * f0 * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))
               + 0.01 * rng.randn(len(t))).astype(np.float32)
        p = tmp_path / f'gen{i}.wav'
        save_wav(str(p), wav, sr)
        lines.append(f'{p}|hello world')
    manifest = tmp_path / 'manifest.txt'
    manifest.write_text('\n'.join(lines))

    args = argparse.Namespace(
        manifest=str(manifest), output_dir=str(tmp_path / 'out'),
        checkpoint='', wer=False, accent_id=False, nisqa=False,
        nisqa_checkpoint='nisqa.tar', whisper_dtw=False, target_accent='',
        whisper_model='base', pitch_method='device')
    report = evaluate(args)
    assert report['n_utterances'] == 2
    assert report['pitch_std_semitones']['n'] == 2
    assert report['energy_npvi']['mean'] > 0
    assert (tmp_path / 'out' / 'evaluation_report.json').exists()
    assert (tmp_path / 'out' / 'hist_energy_npvi.png').exists()


def test_evaluate_with_checkpoint(tmp_path):
    """evaluate() end-to-end with a tiny native checkpoint: exercises the
    accent-embedding-cosine leg (reference:
    compute_wer_and_accent_metrics.py:923-953) and regression-guards the
    load_model_for_synthesis 4-tuple unpack (round-2 crash)."""
    import argparse
    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.frontend.audio import save_wav
    from daft_exprt_tpu.train import init_model_and_state
    from scripts.evaluation.compute_wer_and_accent_metrics import evaluate
    from tests.test_training import SMALL

    config = dict(
        language='english', speakers=['speaker_0'],
        phoneme_encoder=dict(SMALL), accent_encoder=dict(SMALL),
        frame_decoder=dict(SMALL),
        length_buckets=[16, 32], frame_buckets=[64, 128])
    hp = HyperParams(verbose=False, training_files='unused',
                     validation_files='unused',
                     output_directory=str(tmp_path / 'ckpt_out'), **config)
    _, params = init_model_and_state(hp)
    ck = str(tmp_path / 'tiny_ckpt')
    ckpt.save_checkpoint(ck, params, config_params=config)

    sr = hp.sampling_rate
    t = np.arange(sr) / sr
    rng = np.random.RandomState(0)
    lines = []
    for i, f0 in enumerate((150.0, 220.0)):
        wav = (0.3 * np.sin(2 * np.pi * f0 * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))
               + 0.01 * rng.randn(len(t))).astype(np.float32)
        gen = tmp_path / f'gen{i}.wav'
        ref = tmp_path / f'ref{i}.wav'
        save_wav(str(gen), wav, sr)
        save_wav(str(ref), wav[::-1].copy(), sr)
        lines.append(f'{gen}|hello world|{ref}')
    manifest = tmp_path / 'manifest.txt'
    manifest.write_text('\n'.join(lines))

    args = argparse.Namespace(
        manifest=str(manifest), output_dir=str(tmp_path / 'out'),
        checkpoint=ck, wer=False, accent_id=False, nisqa=False,
        nisqa_checkpoint='nisqa.tar', whisper_dtw=False, target_accent='',
        whisper_model='base', pitch_method='device')
    report = evaluate(args)
    assert report['n_utterances'] == 2
    assert report['accent_emb_cosine_dist'] is not None
    assert report['accent_emb_cosine_dist']['n'] == 2
    assert all(0.0 <= r['accent_emb_cosine_dist'] <= 2.0
               for r in report['per_utterance'])
    assert (tmp_path / 'out' / 'evaluation_report.json').exists()


def test_zero_argument_demo_with_style_bank(tmp_path):
    """One-command demo (reference: synthesize.py:656 default style bank):
    make_style_bank --features_dir builds the bank, then synthesize() runs
    with only checkpoint + output_dir — prosody, speaker embedding, and
    accent references all come from the bank."""
    import argparse
    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.frontend.audio import save_wav
    from daft_exprt_tpu.train import init_model_and_state
    from scripts.make_style_bank import bank_from_features
    from scripts.synthesize import synthesize
    from tests.synth_data import build_synthetic_dataset
    from tests.test_training import SMALL

    root = str(tmp_path / 'ds')
    _, _, features_root = build_synthetic_dataset(root, n_speakers=1,
                                                  files_per_speaker=4)
    # place source wavs next to the features so the bank picks them up
    sr = 22050
    t = np.arange(sr) / sr
    for i in range(4):
        save_wav(os.path.join(features_root, 'speaker_0',
                              f'utt_{i:03d}.wav'),
                 (0.3 * np.sin(2 * np.pi * (140 + 20 * i) * t))
                 .astype(np.float32), sr)

    bank = str(tmp_path / 'bank')
    bank_from_features(features_root, bank, nb_files=3, seed=0)
    assert os.path.isfile(os.path.join(bank, 'bank.prosody'))
    assert os.path.isfile(os.path.join(bank, 'spk_emb.npy'))
    assert os.path.isfile(os.path.join(bank, 'speaker_stats.json'))
    assert any(f.endswith('.wav') for f in os.listdir(bank))

    stats = {'spk 0': {'pitch': {'mean': 5.0, 'std': 0.2},
                       'energy': {'mean': 8.0, 'std': 5.0}}}
    config = dict(language='english', speakers=['speaker_0'],
                  phoneme_encoder=dict(SMALL), accent_encoder=dict(SMALL),
                  frame_decoder=dict(SMALL), length_buckets=[16, 32],
                  frame_buckets=[64, 128], stats=stats)
    hp = HyperParams(verbose=False, training_files='unused',
                     validation_files='unused',
                     output_directory=str(tmp_path / 'exp'), **config)
    _, params = init_model_and_state(hp)
    ck = str(tmp_path / 'demo_ckpt')
    ckpt.save_checkpoint(ck, params, config_params=config)

    args = argparse.Namespace(
        output_dir=str(tmp_path / 'out'), checkpoint=ck,
        symbol_prosody_file='', style_bank=bank, speaker_id=0,
        config_overrides='', use_griffin_lim=True, fast_vocoder=False,
        vocoder_checkpoint='', reduce_buzz=False, batch_size=4,
        real_time_factor=False, new_speaker_stats='',
        neutralize_prosody=False, alpha_dur=1.0, alpha_pitch=1.0,
        alpha_energy=1.0, spk_emb_audios_dir='', spk_emb_file='',
        accent_emb_audios_dir='', accent_emb_file='')
    preds = synthesize(args)
    assert len(preds) == 3
    wavs = [f for f in os.listdir(args.output_dir) if f.endswith('.wav')]
    assert len(wavs) == 3
    from daft_exprt_tpu.frontend.audio import load_wav
    w, _ = load_wav(os.path.join(args.output_dir, wavs[0]), target_sr=sr)
    assert np.isfinite(w).all() and len(w) > 1000


def test_synthesize_int8_calibrates_from_style_bank(tmp_path, monkeypatch):
    """--int8_vocoder assembles static-scale calibration mels from the
    style-bank reference audio (wired through load_hifigan_vocoder)."""
    import argparse
    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.frontend.audio import save_wav
    from daft_exprt_tpu.train import init_model_and_state
    import scripts.synthesize as syn
    from scripts.make_style_bank import bank_from_features
    from tests.synth_data import build_synthetic_dataset
    from tests.test_training import SMALL

    root = str(tmp_path / 'ds')
    _, _, features_root = build_synthetic_dataset(root, n_speakers=1,
                                                  files_per_speaker=3)
    sr = 22050
    t = np.arange(sr) / sr
    for i in range(3):
        save_wav(os.path.join(features_root, 'speaker_0',
                              f'utt_{i:03d}.wav'),
                 (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32), sr)
    bank = str(tmp_path / 'bank')
    bank_from_features(features_root, bank, nb_files=2, seed=0)

    stats = {'spk 0': {'pitch': {'mean': 5.0, 'std': 0.2},
                       'energy': {'mean': 8.0, 'std': 5.0}}}
    config = dict(language='english', speakers=['speaker_0'],
                  phoneme_encoder=dict(SMALL), accent_encoder=dict(SMALL),
                  frame_decoder=dict(SMALL), length_buckets=[16, 32],
                  frame_buckets=[64, 128], stats=stats)
    from daft_exprt_tpu.hparams import HyperParams
    hp = HyperParams(verbose=False, training_files='unused',
                     validation_files='unused',
                     output_directory=str(tmp_path / 'exp'), **config)
    _, params = init_model_and_state(hp)
    ck = str(tmp_path / 'ck')
    ckpt.save_checkpoint(ck, params, config_params=config)

    captured = {}

    def fake_loader(checkpoint_path=None, fast=None,
                    int8_calibration_mels=None, **kw):
        captured['fast'] = fast
        captured['cal'] = int8_calibration_mels
        raise RuntimeError('stop-after-capture')

    monkeypatch.setattr(
        'daft_exprt_tpu.models.hifigan.load_hifigan_vocoder', fake_loader)
    args = argparse.Namespace(
        output_dir=str(tmp_path / 'out'), checkpoint=ck,
        symbol_prosody_file='', style_bank=bank, speaker_id=0,
        config_overrides='', use_griffin_lim=False, fast_vocoder=False,
        int8_vocoder=True, vocoder_checkpoint='', reduce_buzz=False,
        batch_size=4, real_time_factor=False, new_speaker_stats='',
        neutralize_prosody=False, alpha_dur=1.0, alpha_pitch=1.0,
        alpha_energy=1.0, spk_emb_audios_dir='', spk_emb_file='',
        accent_emb_audios_dir='', accent_emb_file='')
    with pytest.raises(RuntimeError, match='stop-after-capture'):
        syn.synthesize(args)
    assert captured['fast'] == 'int8'
    assert captured['cal'] is not None
    assert captured['cal'].ndim == 3 and captured['cal'].shape[1] == 80


def test_zero_argument_demo_with_committed_bank(tmp_path):
    """The COMMITTED demo bank (scripts/style_bank/english, generated
    from the synthetic corpus — see its README) must drive the
    zero-argument synthesize flow on a fresh clone, matching the
    reference's bundled-bank out-of-box demo
    (reference: scripts/synthesize.py:656)."""
    import argparse
    from daft_exprt_tpu import checkpoint as ckpt
    from daft_exprt_tpu.train import init_model_and_state
    from scripts.synthesize import synthesize
    from tests.test_training import SMALL

    bank = os.path.join(REPO, 'scripts', 'style_bank', 'english')
    assert os.path.isfile(os.path.join(bank, 'bank.prosody')), \
        'committed demo bank missing'

    stats = {'spk 0': {'pitch': {'mean': 5.0, 'std': 0.2},
                       'energy': {'mean': 8.0, 'std': 5.0}}}
    config = dict(language='english', speakers=['speaker_0'],
                  phoneme_encoder=dict(SMALL), accent_encoder=dict(SMALL),
                  frame_decoder=dict(SMALL), length_buckets=[16, 32],
                  frame_buckets=[64, 128], stats=stats)
    hp = HyperParams(verbose=False, training_files='unused',
                     validation_files='unused',
                     output_directory=str(tmp_path / 'exp'), **config)
    _, params = init_model_and_state(hp)
    ck = str(tmp_path / 'demo_ckpt')
    ckpt.save_checkpoint(ck, params, config_params=config)

    args = argparse.Namespace(
        output_dir=str(tmp_path / 'out'), checkpoint=ck,
        symbol_prosody_file='', style_bank=bank, speaker_id=0,
        config_overrides='', use_griffin_lim=True, fast_vocoder=False,
        vocoder_checkpoint='', reduce_buzz=False, batch_size=4,
        real_time_factor=False, new_speaker_stats='',
        neutralize_prosody=False, alpha_dur=1.0, alpha_pitch=1.0,
        alpha_energy=1.0, spk_emb_audios_dir='', spk_emb_file='',
        accent_emb_audios_dir='', accent_emb_file='')
    preds = synthesize(args)
    assert len(preds) >= 1
    wavs = [f for f in os.listdir(args.output_dir) if f.endswith('.wav')]
    assert len(wavs) == len(preds)
