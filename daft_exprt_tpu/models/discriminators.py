"""HiFi-GAN discriminators (MPD + MSD) and GAN losses — functional JAX.

Capability parity with the reference port of official HiFi-GAN
(reference: src/daft_exprt/vocoder/discriminators.py:28-194): Multi-Period
Discriminator over periods 2/3/5/7/11 (2-D strided convs on period-folded
audio), Multi-Scale Discriminator over 3 scales (first sub-discriminator
spectral-normalized, others weight-normalized), LSGAN discriminator/
generator losses and the ×2 L1 feature-matching loss.

Training-time parameterizations are preserved (not folded): weight norm as
(g, v) params; spectral norm as a power-iteration ``u`` state threaded
through the forward pass — both matter for GAN training dynamics.
"""
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1
MPD_PERIODS = (2, 3, 5, 7, 11)


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


# ----------------------------------------------------------------------
# parameterizations
# ----------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in):
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def _init_conv(key, shape):
    """torch Conv default init; shape = (out, in/groups, *k)."""
    k1, k2 = jax.random.split(key)
    fan_in = int(np.prod(shape[1:]))
    w = _kaiming_uniform(k1, shape, fan_in) * float(np.sqrt(3.0))
    b = _kaiming_uniform(k2, (shape[0],), fan_in)
    return w, b


def _wn_params(key, shape):
    w, b = _init_conv(key, shape)
    axes = tuple(range(1, w.ndim))
    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    return {'g': g, 'v': w, 'b': b}


def _wn_kernel(p):
    v = p['v']
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return p['g'] * v / jnp.maximum(norm, 1e-12)


def _sn_params(key, shape):
    w, b = _init_conv(key, shape)
    return {'w': w, 'b': b}


def _sn_kernel(p, u, update_u):
    """Spectral normalization with one power-iteration step."""
    w = p['w']
    mat = w.reshape(w.shape[0], -1)
    v = mat.T @ u
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    u_new = mat @ v
    u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
    u_used = u_new if update_u else u
    sigma = u_used @ (mat @ v)
    return w / jnp.maximum(sigma, 1e-12), (u_new if update_u else u)


# ----------------------------------------------------------------------
# conv primitives (torch layouts)
# ----------------------------------------------------------------------

def _conv1d(x, w, b, stride=1, padding=0, groups=1):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        feature_group_count=groups, dimension_numbers=('NCH', 'OIH', 'NCH'))
    return y + b[None, :, None]


def _conv2d(x, w, b, stride=(1, 1), padding=((0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return y + b[None, :, None, None]


# ----------------------------------------------------------------------
# Multi-Period Discriminator
# ----------------------------------------------------------------------

_MPD_CHANNELS = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]


def init_mpd_params(rng):
    params = {}
    for p_idx, period in enumerate(MPD_PERIODS):
        sub = {}
        for i, (cin, cout) in enumerate(_MPD_CHANNELS):
            key = jax.random.fold_in(rng, p_idx * 100 + i)
            sub[f'conv_{i}'] = _wn_params(key, (cout, cin, 5, 1))
        sub['conv_post'] = _wn_params(
            jax.random.fold_in(rng, p_idx * 100 + 99), (1, 1024, 3, 1))
        params[f'period_{period}'] = sub
    return params


def _discriminator_p(sub, x, period, dtype=None):
    """x: (B, 1, T) → (score_flat, fmap list). ``dtype`` casts the conv
    compute (weight-norm fold stays f32; bf16 halves the conv time on the
    MXU with params/optimizer untouched)."""
    if dtype is not None:
        x = x.astype(dtype)

    def cast(w):
        return w.astype(dtype) if dtype is not None else w

    b, c, t = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode='reflect')
        t = t + n_pad
    x = x.reshape(b, c, t // period, period)
    fmap = []
    for i in range(len(_MPD_CHANNELS)):
        stride = (3, 1) if i < 4 else (1, 1)
        x = _conv2d(x, cast(_wn_kernel(sub[f'conv_{i}'])),
                    cast(sub[f'conv_{i}']['b']),
                    stride=stride, padding=((2, 2), (0, 0)))
        x = _lrelu(x)
        fmap.append(x)
    x = _conv2d(x, cast(_wn_kernel(sub['conv_post'])),
                cast(sub['conv_post']['b']),
                stride=(1, 1), padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(b, -1), fmap


def mpd_forward(params, y, y_hat, dtype=None):
    """y, y_hat: (B, 1, T). Returns (real_scores, gen_scores, real_fmaps,
    gen_fmaps) lists over the 5 periods."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for period in MPD_PERIODS:
        sub = params[f'period_{period}']
        s_r, f_r = _discriminator_p(sub, y, period, dtype=dtype)
        s_g, f_g = _discriminator_p(sub, y_hat, period, dtype=dtype)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ----------------------------------------------------------------------
# Multi-Scale Discriminator
# ----------------------------------------------------------------------

_MSD_LAYERS = [
    # (cin, cout, k, stride, groups, pad)
    (1, 128, 15, 1, 1, 7),
    (128, 128, 41, 2, 4, 20),
    (128, 256, 41, 2, 16, 20),
    (256, 512, 41, 4, 16, 20),
    (512, 1024, 41, 4, 16, 20),
    (1024, 1024, 41, 1, 16, 20),
    (1024, 1024, 5, 1, 1, 2),
]


def init_msd_params(rng):
    """Returns (params, sn_state): scale_0 is spectral-normalized."""
    params, sn_state = {}, {}
    for s_idx in range(3):
        sub, sub_state = {}, {}
        spectral = s_idx == 0
        for i, (cin, cout, k, _st, groups, _pad) in enumerate(_MSD_LAYERS):
            key = jax.random.fold_in(rng, 1000 + s_idx * 100 + i)
            shape = (cout, cin // groups, k)
            if spectral:
                sub[f'conv_{i}'] = _sn_params(key, shape)
                sub_state[f'conv_{i}'] = jax.random.normal(
                    jax.random.fold_in(key, 7), (cout,), dtype=jnp.float32)
            else:
                sub[f'conv_{i}'] = _wn_params(key, shape)
        key = jax.random.fold_in(rng, 1000 + s_idx * 100 + 99)
        if spectral:
            sub['conv_post'] = _sn_params(key, (1, 1024, 3))
            sub_state['conv_post'] = jax.random.normal(
                jax.random.fold_in(key, 7), (1,), dtype=jnp.float32)
        else:
            sub['conv_post'] = _wn_params(key, (1, 1024, 3))
        params[f'scale_{s_idx}'] = sub
        if spectral:
            sn_state[f'scale_{s_idx}'] = sub_state
    return params, sn_state


def _discriminator_s(sub, sn_sub, x, update_sn, dtype=None):
    """``dtype`` casts conv compute; WN fold and the SN power iteration
    stay f32 (the iteration state drives training dynamics)."""
    if dtype is not None:
        x = x.astype(dtype)

    def cast(w):
        return w.astype(dtype) if dtype is not None else w

    fmap = []
    new_state = {}
    for i, (_cin, _cout, _k, stride, groups, pad) in enumerate(_MSD_LAYERS):
        p = sub[f'conv_{i}']
        if sn_sub is not None:
            w, u = _sn_kernel(p, sn_sub[f'conv_{i}'], update_sn)
            new_state[f'conv_{i}'] = u
        else:
            w = _wn_kernel(p)
        x = _conv1d(x, cast(w), cast(p['b']), stride=stride, padding=pad,
                    groups=groups)
        x = _lrelu(x)
        fmap.append(x)
    p = sub['conv_post']
    if sn_sub is not None:
        w, u = _sn_kernel(p, sn_sub['conv_post'], update_sn)
        new_state['conv_post'] = u
    else:
        w = _wn_kernel(p)
    x = _conv1d(x, cast(w), cast(p['b']), stride=1, padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap, new_state


def _avg_pool_4_2(x):
    """torch AvgPool1d(4, 2, padding=2), count_include_pad=True."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2)))
    T = xp.shape[-1]
    n_out = (T - 4) // 2 + 1
    idx = jnp.arange(n_out)[:, None] * 2 + jnp.arange(4)[None, :]
    return xp[:, :, idx].mean(axis=-1)


def msd_forward(params, sn_state, y, y_hat, update_sn=True, dtype=None):
    """Returns (real_scores, gen_scores, real_fmaps, gen_fmaps, new_sn_state).
    The inter-scale average pooling stays f32; ``dtype`` casts conv compute."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    new_sn_state = dict(sn_state)
    for s_idx in range(3):
        if s_idx != 0:
            y = _avg_pool_4_2(y)
            y_hat = _avg_pool_4_2(y_hat)
        sub = params[f'scale_{s_idx}']
        sn_sub = sn_state.get(f'scale_{s_idx}')
        s_r, f_r, state_r = _discriminator_s(sub, sn_sub, y, update_sn,
                                             dtype=dtype)
        # generated pass reuses the just-updated u (one power step per call)
        s_g, f_g, _ = _discriminator_s(
            sub, state_r if sn_sub is not None else None, y_hat, False,
            dtype=dtype)
        if sn_sub is not None:
            new_sn_state[f'scale_{s_idx}'] = state_r
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs, new_sn_state


# ----------------------------------------------------------------------
# losses (LSGAN + feature matching)
# ----------------------------------------------------------------------

def discriminator_loss(real_outputs, generated_outputs):
    loss = jnp.float32(0.0)
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, generated_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg ** 2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = jnp.float32(0.0)
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def feature_loss(fmap_r, fmap_g):
    loss = jnp.float32(0.0)
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl.astype(jnp.float32)
                                           - gl.astype(jnp.float32)))
    return loss * 2.0
