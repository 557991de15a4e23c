"""Fused whole-row attention kernel (ops/attention_kernels.py).

CPU coverage runs the pallas kernel in interpret mode with dropout off
(the in-kernel PRNG has no CPU lowering; the dropout path is validated on
device by scripts/bench_attention.py --check: determinism, keep-rate, and
finite-difference VJP with seed-fixed masks)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daft_exprt_tpu.ops.attention_kernels import _q_block, fused_attention


def _ref(q, k, v, lengths):
    """The XLA path from modules.MultiHeadSelfAttention (key-side -1e9
    mask, f32 softmax)."""
    T = q.shape[2]
    s = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                   preferred_element_type=jnp.float32)
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v)


def _inputs(B=3, H=2, T=256, D=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32)) * D ** -0.5
    k = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    lengths = jnp.asarray([T, max(1, T // 3), 1][:B], jnp.int32)
    return q, k, v, lengths


def test_q_block_divides_every_bucket():
    from daft_exprt_tpu.hparams import HyperParams
    hp = HyperParams(verbose=False, training_files='x', validation_files='x',
                     output_directory='/tmp/qb', language='english',
                     speakers=['s'])
    for T in hp.length_buckets + hp.frame_buckets:
        bq = _q_block(T)
        assert T % bq == 0
        assert bq * T * 4 <= 2 * 1024 * 1024 or bq == T


def test_forward_matches_xla_path():
    q, k, v, lengths = _inputs()
    o_ref = _ref(q, k, v, lengths)
    o_ker = fused_attention(q, k, v, lengths, 0, 0.0, True)
    np.testing.assert_allclose(np.asarray(o_ker), np.asarray(o_ref),
                               atol=1e-6)


def test_backward_matches_autodiff_of_xla_path():
    q, k, v, lengths = _inputs()

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(q, k, v, lengths)))

    def loss_ker(q, k, v):
        return jnp.sum(jnp.sin(fused_attention(q, k, v, lengths, 0, 0.0,
                                               True)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6)


def test_multi_qblock_grid():
    # T=768 exercises bq=384 (two q blocks) incl. dk/dv accumulation
    q, k, v, lengths = _inputs(B=2, T=768)
    assert _q_block(768) == 384
    o_ref = _ref(q, k, v, lengths)
    o_ker = fused_attention(q, k, v, lengths, 0, 0.0, True)
    np.testing.assert_allclose(np.asarray(o_ker), np.asarray(o_ref),
                               atol=1e-6)

    def loss_ker(k_):
        return jnp.sum(fused_attention(q, k_, v, lengths, 0, 0.0, True) ** 2)

    def loss_ref(k_):
        return jnp.sum(_ref(q, k_, v, lengths) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_ker)(k)), np.asarray(jax.grad(loss_ref)(k)),
        atol=5e-6)


@pytest.mark.slow
def test_integrated_model_exact_at_f32(monkeypatch):
    """DaftExprt with fused_attention=True (interpret) is bit-identical to
    the XLA attention path at float32."""
    monkeypatch.setenv('DAFT_FUSED_ATTN_INTERPRET', '1')
    from __graft_entry__ import _full_size_model, _make_batch
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    hp, _ = _full_size_model()
    hp.compute_dtype = 'float32'
    hp.fused_attention = False
    m_xla = DaftExprt.from_hparams(hp)
    hp.fused_attention = True
    m_fus = DaftExprt.from_hparams(hp)
    assert m_fus.phoneme_encoder_cfg['fused_attention']
    assert not m_xla.phoneme_encoder_cfg['fused_attention']

    b = _make_batch(hp, 2, 64, 256)
    variables = m_xla.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, **b)
    out1 = m_xla.apply(variables, deterministic=True, **b)
    out2 = m_fus.apply(variables, deterministic=True, **b)
    np.testing.assert_array_equal(np.asarray(out1['mel_preds']),
                                  np.asarray(out2['mel_preds']))


def test_auto_gate_respects_cpu_default_device():
    # conftest pins jax_default_device to CPU -> auto must resolve False
    from daft_exprt_tpu.models.modules import fused_attention_available
    if os.environ.get('DAFT_FUSED_ATTN') or \
            os.environ.get('DAFT_FUSED_ATTN_INTERPRET') == '1':
        pytest.skip('env override set')
    assert fused_attention_available() is False
