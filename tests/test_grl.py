"""Gradient reversal op: identity forward, -lambda-scaled backward.

(reference: src/daft_exprt/model.py:27-54 — autograd Function with
grad_output.neg() * lambda in backward)
"""
import numpy as np

from daft_exprt_tpu.ops.grl import gradient_reversal


def test_grl_forward_identity_backward_reversed():
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))

    y = gradient_reversal(x, 0.7)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    g = jax.grad(lambda x: jnp.sum(gradient_reversal(x, 0.7) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), -0.7 * 2.0 * np.ones((4, 3)),
                               rtol=1e-6)


def test_ecapa_import_is_gated():
    """frontend.ecapa imports without speechbrain; calling raises a clear
    ImportError naming the dependency (model-zoo external, SURVEY §2.4)."""
    import pytest
    from daft_exprt_tpu.frontend import ecapa
    try:
        import speechbrain  # noqa: F401
        pytest.skip('speechbrain present in this environment')
    except ImportError:
        pass
    with pytest.raises(ImportError, match='speechbrain'):
        ecapa._load_speechbrain_encoder()
