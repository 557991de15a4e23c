"""Shape sanity check for the PitchPredictor
(reference: scripts/verify_pitch_predictor_shape.py:4-18)."""
import os
import sys

import numpy as np

PROJECT_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, PROJECT_ROOT)

import jax  # noqa: E402

from daft_exprt_tpu.models.pitch_predictor import PitchPredictor  # noqa: E402

if __name__ == '__main__':
    model = PitchPredictor(n_mel_channels=80)
    mel = np.random.randn(2, 80, 123).astype(np.float32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, mel,
                           deterministic=True, use_running_average=False)
    out = model.apply(variables, mel, deterministic=True,
                      use_running_average=True)
    ok = out.shape == (2, 123)
    print(f'output shape: {out.shape} -- '
          f'{"SUCCESS" if ok else "FAILURE"}')
    sys.exit(0 if ok else 1)
