"""Load reference (PyTorch) modules from /root/reference for parity tests.

The reference package __init__ has Linux-binary side effects (chmod on a
read-only mount) and some modules import librosa/inflect/unidecode which are
not in this image — we synthesize the package namespace and stub the missing
imports so the pure-torch model/DSP code loads untouched.
"""
import importlib
import sys
import types

REF_SRC = '/root/reference/src'


def _ensure_stubs():
    if 'librosa' not in sys.modules:
        librosa = types.ModuleType('librosa')
        filters = types.ModuleType('librosa.filters')

        from daft_exprt_tpu.ops.mel import mel_filterbank

        def _mel(*, sr, n_fft, n_mels, fmin, fmax):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

        filters.mel = _mel
        librosa.filters = filters

        def _unavailable(*a, **k):
            raise RuntimeError('librosa is stubbed in tests')

        librosa.load = _unavailable
        sys.modules['librosa'] = librosa
        sys.modules['librosa.filters'] = filters

    for name in ('unidecode', 'inflect'):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == 'unidecode':
                mod.unidecode = lambda s: s
            else:
                class _Engine:
                    def number_to_words(self, *a, **k):
                        raise RuntimeError('inflect is stubbed in tests')
                mod.engine = _Engine
            sys.modules[name] = mod


def load_reference_module(submodule):
    """Import ``daft_exprt.<submodule>`` from the reference tree, bypassing
    the package __init__ side effects."""
    _ensure_stubs()
    if 'daft_exprt' not in sys.modules:
        pkg = types.ModuleType('daft_exprt')
        pkg.__path__ = [f'{REF_SRC}/daft_exprt']
        sys.modules['daft_exprt'] = pkg
    return importlib.import_module(f'daft_exprt.{submodule}')
