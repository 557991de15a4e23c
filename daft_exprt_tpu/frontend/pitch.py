"""Pitch extraction front end.

Mirrors the reference pipeline (reference: src/daft_exprt/extract_features.py:
237-284): obtain a per-sample F0 track (int Hz, -1/0 = unvoiced), set
unvoiced to 0 in log domain, decimate by hop_length to mel-frame rate.

Two trackers provide the track:
  * the native C++ tracker (``daft-reaper`` binary, built from native/pitch)
    — authoritative for offline preprocessing parity;
  * the on-device JAX NCCF tracker (ops/pitch.py) — used for the
    "preprocessing on-device" throughput configuration.
"""
import logging
import os
import shutil
import subprocess
import uuid

import numpy as np
from scipy.io import wavfile

_logger = logging.getLogger(__name__)

_NATIVE_BINARY_NAMES = ('daft-reaper', 'reaper')
_REPO_NATIVE_BIN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.realpath(__file__)))), 'native', 'pitch', 'build',
    'daft-reaper')

_tracker_cache = {}


def find_native_binary():
    if os.path.isfile(_REPO_NATIVE_BIN) and os.access(_REPO_NATIVE_BIN, os.X_OK):
        return _REPO_NATIVE_BIN
    for name in _NATIVE_BINARY_NAMES:
        path = shutil.which(name)
        if path:
            return path
    return None


def per_sample_f0_native(wav, fs, hparams, binary=None):
    """Run the native tracker binary; returns per-sample int16 F0 (Hz, -1=uv).

    Binary protocol matches the reference's REAPER invocation
    (reference: src/daft_exprt/extract_features.py:254-266).
    """
    binary = binary or find_native_binary()
    if binary is None:
        raise FileNotFoundError('no native pitch binary (build native/pitch '
                                'or put daft-reaper on PATH)')
    wav_int16 = (np.asarray(wav, dtype=np.float64) * 32768.0).astype('int16')
    rand = str(uuid.uuid4())
    tmp_dir = os.path.join('/tmp', 'daft_exprt_tpu_reaper')
    os.makedirs(tmp_dir, exist_ok=True)
    wav_file = os.path.join(tmp_dir, f'{rand}.wav')
    f0_file = os.path.join(tmp_dir, f'{rand}.f0')
    try:
        wavfile.write(wav_file, fs, wav_int16)
        cmd = [binary, '-i', wav_file, '-a', '-f', f0_file,
               '-e', str(hparams.f0_interval), '-m', str(hparams.min_f0),
               '-x', str(hparams.max_f0), '-u', str(hparams.uv_interval),
               '-w', str(hparams.uv_cost)]
        subprocess.check_call(cmd, stdout=subprocess.DEVNULL,
                              stderr=subprocess.STDOUT)
        with open(f0_file, 'rb') as f:
            pitch = np.frombuffer(f.read(), dtype='int16')
        return np.copy(pitch)
    finally:
        for p in (wav_file, f0_file):
            if os.path.isfile(p):
                os.remove(p)


def per_sample_f0_device(wav, fs, hparams):
    """On-device (JAX) tracker with the same output protocol."""
    from daft_exprt_tpu.ops.pitch import PitchTracker
    key = (fs, hparams.min_f0, hparams.max_f0, hparams.f0_interval,
           hparams.uv_cost)
    if key not in _tracker_cache:
        _tracker_cache[key] = PitchTracker(hparams, sr=fs)
    return _tracker_cache[key].per_sample_f0(np.asarray(wav, dtype=np.float32))


def extract_pitch(wav, fs, hparams, method='auto'):
    """wav (float32 [-1,1]) → per-mel-frame log-F0 (0 = unvoiced).

    method: 'native' (C++ binary), 'device' (JAX), or 'auto'
    (native if available, else device).
    """
    if method == 'auto':
        method = 'native' if find_native_binary() is not None else 'device'
    if method == 'native':
        pitch = per_sample_f0_native(wav, fs, hparams)
    elif method == 'device':
        pitch = per_sample_f0_device(wav, fs, hparams)
    else:
        raise ValueError(method)

    pitch = pitch.astype(np.float64)
    uv_idxs = np.where(pitch <= 0.0)[0]
    pitch[uv_idxs] = 1000.0          # placeholder so log() is defined
    pitch = np.log(pitch)
    pitch[uv_idxs] = 0.0
    pitch_frames = pitch[::hparams.hop_length]
    if len(pitch) % hparams.hop_length == 0:
        pitch_frames = np.append(pitch_frames, pitch[-1])
    return pitch_frames
