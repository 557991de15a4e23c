"""bf16 compute-dtype smoke: forward runs, stays close to f32, film/mel
outputs come back f32."""
import numpy as np

from tests.test_model_parity import jax_model, make_batch
import pytest


@pytest.mark.slow
def test_bf16_forward_close_to_f32():
    import jax
    import dataclasses

    m32 = jax_model(strict_masking=True)
    m16 = dataclasses.replace(m32, compute_dtype='bfloat16')
    rng = np.random.RandomState(0)
    b = make_batch(rng)
    variables = m32.init({'params': jax.random.PRNGKey(0),
                          'dropout': jax.random.PRNGKey(1)},
                         deterministic=True, **b)
    out32 = m32.apply(variables, deterministic=True, **b)
    out16 = m16.apply(variables, deterministic=True, **b)
    mel32 = np.asarray(out32['mel_preds'])
    mel16 = np.asarray(out16['mel_preds'])
    assert mel16.dtype == np.float32           # projection upcasts
    assert np.isfinite(mel16).all()
    scale = np.abs(mel32).max()
    assert np.abs(mel32 - mel16).max() < 0.05 * max(scale, 1.0)
