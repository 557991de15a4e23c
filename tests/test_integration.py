"""End-to-end integration: corpus → markers → features → sets/stats →
training → synthesis → vocoding, all on CPU with a tiny config.

This locks the full user workflow (the reference's pre_process / train /
synthesize chain, SURVEY.md §3) as a regression net.
"""
import json
import os

import numpy as np
import pytest
from scipy.signal import lfilter

from daft_exprt_tpu.hparams import HyperParams

SR = 22050

TG_TEMPLATE = '''File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.8
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.8
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.2
            text = ""
        intervals [2]:
            xmin = 0.2
            xmax = 0.7
            text = "hello"
        intervals [3]:
            xmin = 0.7
            xmax = 1.7
            text = "world"
        intervals [4]:
            xmin = 1.7
            xmax = 1.8
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.8
        intervals: size = 7
        intervals [1]:
            xmin = 0
            xmax = 0.2
            text = "sil"
        intervals [2]:
            xmin = 0.2
            xmax = 0.45
            text = "HH"
        intervals [3]:
            xmin = 0.45
            xmax = 0.7
            text = "OW1"
        intervals [4]:
            xmin = 0.7
            xmax = 1.1
            text = "W"
        intervals [5]:
            xmin = 1.1
            xmax = 1.4
            text = "ER1"
        intervals [6]:
            xmin = 1.4
            xmax = 1.7
            text = "D"
        intervals [7]:
            xmin = 1.7
            xmax = 1.8
            text = "sp"
'''

SMALL = {'nb_blocks': 1, 'hidden_embed_dim': 16, 'attn_nb_heads': 2,
         'attn_dropout': 0.1, 'conv_kernel': 3, 'conv_channels': 24,
         'conv_dropout': 0.1}


def _voice(f0, dur=1.8):
    n = int(dur * SR)
    sig = np.zeros(n)
    idx = np.arange(int(0.2 * SR), int(1.7 * SR), SR / f0).astype(int)
    sig[idx] = 1.0
    sig = lfilter([1.0], [1, -1.8 * np.cos(2 * np.pi * 500 / SR), 0.81], sig)
    return (sig / (np.abs(sig).max() * 1.3)).astype(np.float32)


@pytest.mark.slow
def test_full_workflow(tmp_path):
    from daft_exprt_tpu.frontend.audio import save_wav
    from daft_exprt_tpu.frontend.extract_features import extract_features
    from daft_exprt_tpu.frontend.mfa import extract_markers
    from daft_exprt_tpu.data.sets import (
        create_sets, extract_features_stats, save_stats)

    # ---- corpus ----
    spk = 'spk_x'
    dataset = tmp_path / 'data'
    features = tmp_path / 'features'
    wavs = dataset / spk / 'wavs'
    align = dataset / spk / 'align'
    wavs.mkdir(parents=True)
    align.mkdir(parents=True)
    (features / spk).mkdir(parents=True)
    meta = []
    for i, f0 in enumerate([120, 150, 180, 200]):
        save_wav(str(wavs / f'utt{i}.wav'), _voice(f0), SR)
        (align / f'utt{i}.TextGrid').write_text(TG_TEMPLATE)
        (align / f'utt{i}.lab').write_text('hello world')
        meta.append(f'utt{i}|hello world\n')
    (dataset / spk / 'metadata.csv').write_text(''.join(meta))
    (features / spk / 'metadata.csv').write_text(''.join(meta))

    hp = HyperParams(
        verbose=False, training_files=str(tmp_path / 'train.txt'),
        validation_files=str(tmp_path / 'val.txt'),
        output_directory=str(tmp_path / 'exp'), language='english',
        speakers=[spk], phoneme_encoder=dict(SMALL),
        accent_encoder=dict(SMALL), frame_decoder=dict(SMALL),
        length_buckets=[16], frame_buckets=[192],
        batch_size=2, accumulation_steps=1, warmup_steps=10,
        iters_check_for_model_improvement=100, iters_per_checkpoint=100,
        pitch_consistency_weight=0.0)

    # ---- pre_process (minus the external mfa CLI) ----
    extract_markers(str(align), n_jobs=1)
    extract_features(str(dataset), str(features), hp, n_jobs=1,
                     pitch_method='device')
    create_sets(str(features), hp, proportion_validation=25)
    stats = extract_features_stats(hp)
    save_stats(stats, hp.output_directory)
    rng = np.random.RandomState(0)
    for i in range(4):
        np.save(features / spk / f'utt{i}.spk_emb.npy',
                rng.randn(192).astype(np.float32))

    # ---- train 2 iterations ----
    import jax
    from daft_exprt_tpu.parallel.mesh import make_mesh
    from daft_exprt_tpu.train import launch_training
    mesh = make_mesh(n_data=1, devices=jax.devices('cpu')[:1])
    params, metrics = launch_training(hp, num_iterations=2, mesh=mesh)
    assert np.isfinite(metrics['loss'])

    # ---- synthesize from the trained checkpoint via the CLI surface ----
    from daft_exprt_tpu.generate import Synthesizer, generate_mel_specs
    from daft_exprt_tpu.models.daft_exprt import DaftExprt
    hp2 = HyperParams(verbose=False, **{
        k: v for k, v in hp.__dict__.items()
        if isinstance(v, (int, float, str, bool, list, dict))})
    assert 'spk 0' in hp2.stats          # stats.json auto-ingested
    model = DaftExprt.from_hparams(hp2)
    synth = Synthesizer(model, params, hp2, vocoder=None)
    sentence = [['HH', 'OW1'], ' ', ['W', 'ER1', 'D'], '~']
    prosody = [{'symbols': list(range(7)),
                'durations_frames': [20, 25, 8, 30, 25, 28, 4],
                'pitch': [4.8, 4.9, 0.0, 4.85, 4.9, 4.8, 0.0],
                'energy': [10.0, 12.0, 0.0, 11.0, 12.0, 10.0, 0.0]}]
    preds = generate_mel_specs(
        synth, [sentence], ['utt'], [0], str(tmp_path / 'out'), hp2,
        batch_size=1, external_prosody=prosody,
        external_embeddings=[rng.randn(192).astype(np.float32)],
        external_accent_emb=[rng.randn(16).astype(np.float32)],
        save_outputs=False)
    mel = next(iter(preds.values()))[4]
    assert mel.shape[0] == 80 and mel.shape[1] > 100
    assert np.isfinite(mel).all()

    # ---- vocode with a tiny generator ----
    from daft_exprt_tpu.models.hifigan import (
        generator_forward, init_generator_params)
    cfg = {'sampling_rate': SR, 'upsample_rates': [8, 8, 2, 2],
           'upsample_kernel_sizes': [16, 16, 4, 4],
           'upsample_initial_channel': 16, 'resblock': '2',
           'resblock_kernel_sizes': [3], 'resblock_dilation_sizes': [[1, 3]],
           'model_in_dim': 80}
    voc_params = init_generator_params(jax.random.PRNGKey(0), cfg)
    wav = np.asarray(generator_forward(
        voc_params, mel[None].astype(np.float32), cfg))[0, 0]
    assert len(wav) == mel.shape[1] * 256
    assert np.isfinite(wav).all()
