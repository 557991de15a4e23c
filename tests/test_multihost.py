"""Real multi-process data-parallel rehearsal (2 OS processes over
jax.distributed on localhost; see scripts/rehearse_multihost.py)."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_training_rehearsal():
    # the subprocess call below carries its own timeout=600 guard
    # (pytest-timeout is not installed — a mark would silently no-op)
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)      # script sets its own device count
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'scripts',
                                      'rehearse_multihost.py')],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert 'multi-host rehearsal OK' in r.stdout
