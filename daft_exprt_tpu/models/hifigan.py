"""HiFi-GAN generator — TPU-native inference + trainable forward.

Same architecture family as the reference vocoder
(reference: src/daft_exprt/vocoder/hifigan.py:27-184): conv_pre →
[transposed-conv upsample → multi-receptive-field resblock fusion] × 4 →
conv_post → tanh, V1 config (upsample 8·8·2·2, kernels 16·16·4·4, resblock
kernels 3/7/11 with dilations 1/3/5).

TPU-first choices: a functional params-pytree implementation (works for both
frozen inference and GAN fine-tuning under jax.grad), transposed convs
expressed as input-dilated convolutions (XLA lowers these onto the MXU), and
weight_norm folded into plain kernels at conversion time — the reference
removes weight norm before inference anyway (hifigan.py:203).

Kernels are stored in torch layout (out, in, k) so reference checkpoints
convert by folding only.
"""
from typing import Any, Dict

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1

# universal LJSpeech/22kHz HiFi-GAN generator, publicly mirrored — same
# source the reference auto-downloads (reference:
# src/daft_exprt/vocoder/hifigan.py:22-25,43-68)
DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser('~'), '.cache', 'daft_exprt_tpu', 'hifigan')
DEFAULT_CHECKPOINT_URL = ('https://huggingface.co/espnet/'
                          'kan-bayashi_ljspeech_hifigan/resolve/main/'
                          'generator.pth?download=1')
DEFAULT_CHECKPOINT_HF_REPO = 'espnet/kan-bayashi_ljspeech_hifigan'
DEFAULT_CHECKPOINT_NAME = 'hifigan_ljspeech_generator.pth'


def _verify_sha256(path):
    """If ``DAFT_HIFIGAN_SHA256`` is set, check the downloaded artifact
    against it before it enters the cache (defense against a compromised
    or substituted download source)."""
    expected = os.environ.get('DAFT_HIFIGAN_SHA256', '').strip().lower()
    if not expected:
        return
    import hashlib
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    got = h.hexdigest()
    if got != expected:
        os.remove(path)
        raise RuntimeError(
            f'downloaded checkpoint sha256 mismatch: expected {expected}, '
            f'got {got} — refusing to cache it.')


def download_default_checkpoint(cache_dir=None, url=None):
    """Fetch (and cache) the universal HiFi-GAN generator checkpoint
    (reference: src/daft_exprt/vocoder/hifigan.py:43-68).

    Network access is opt-in: set ``DAFT_ALLOW_DOWNLOAD=1`` (this build
    targets offline/zero-egress environments, so accidental egress is an
    error, not a fallback). ``DAFT_HIFIGAN_URL`` overrides the source URL
    (bypassing the HF-hub default entirely) and accepts ``file://`` URLs
    (used by the tests). With the default source, tries huggingface_hub
    first when available, then plain HTTP(S) — mirroring the reference's
    two-stage fallback. Returns the cached local path."""
    import shutil
    import urllib.request

    cache_dir = cache_dir or os.environ.get('DAFT_HIFIGAN_CACHE',
                                            DEFAULT_CACHE_DIR)
    url = url or os.environ.get('DAFT_HIFIGAN_URL', DEFAULT_CHECKPOINT_URL)
    dst = os.path.join(cache_dir, DEFAULT_CHECKPOINT_NAME)
    if os.path.isfile(dst):
        return dst
    if os.environ.get('DAFT_ALLOW_DOWNLOAD', '0') != '1':
        raise RuntimeError(
            'no vocoder checkpoint given and the universal-checkpoint '
            f'download is disabled (offline default). Either pass '
            f'--vocoder_checkpoint / checkpoint_path explicitly, or set '
            f'DAFT_ALLOW_DOWNLOAD=1 to fetch {url} into {cache_dir}.')
    os.makedirs(cache_dir, exist_ok=True)
    tmp = dst + '.part'
    # a user-pinned URL (env or arg) bypasses the HF-hub default source —
    # the hub branch would fetch the hardcoded repo instead of the pin
    if url == DEFAULT_CHECKPOINT_URL:
        try:
            from huggingface_hub import hf_hub_download
            hf_path = hf_hub_download(repo_id=DEFAULT_CHECKPOINT_HF_REPO,
                                      filename='generator.pth')
            # stage through tmp + atomic rename (like the HTTP branch) so a
            # crash mid-copy can't leave a truncated file that later calls
            # treat as a cache hit
            shutil.copyfile(hf_path, tmp)
            _verify_sha256(tmp)
            os.replace(tmp, dst)
            return dst
        except ImportError:
            pass
        except Exception as exc:                     # noqa: BLE001
            warnings.warn(f'huggingface_hub download failed ({exc}); '
                          'falling back to direct HTTP')
    req = urllib.request.Request(url, headers={'User-Agent': 'Mozilla/5.0'})
    try:
        with urllib.request.urlopen(req) as resp, open(tmp, 'wb') as out:
            shutil.copyfileobj(resp, out)
    except Exception:
        if os.path.isfile(tmp):
            os.remove(tmp)
        raise
    _verify_sha256(tmp)
    os.replace(tmp, dst)
    return dst


DEFAULT_CONFIG = {
    'sampling_rate': 22050,
    'upsample_rates': [8, 8, 2, 2],
    'upsample_kernel_sizes': [16, 16, 4, 4],
    'upsample_initial_channel': 512,
    'resblock': '1',
    'resblock_kernel_sizes': [3, 7, 11],
    'resblock_dilation_sizes': [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    'model_in_dim': 80,
}

_DN = ('NCH', 'OIH', 'NCH')


def _conv1d(x, w, b, dilation=1, padding=None):
    """x: (B, C, T); w: (out, in, k) torch layout."""
    k = w.shape[-1]
    if padding is None:
        padding = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=_DN)
    return y + b[None, :, None]


def _conv_transpose1d(x, w, b, stride, padding):
    """torch ConvTranspose1d semantics; w: (in, out, k) torch layout.

    When k - 2p == s (both HiFi-GAN V1 upsample levels) this lowers to the
    polyphase form: one (s*C_out, |S|*C_in) @ (|S|*C_in, T) matmul over a
    few shifted copies of x, then a phase interleave — s× fewer FLOPs than
    the input-dilated convolution (which multiplies the inserted zeros)
    and a far better MXU shape. Otherwise falls back to the input-dilated
    convolution: y = conv(dilate(x, s), flip(w^T), pad k-1-p).
    """
    k = w.shape[-1]
    s = stride
    p = padding
    if k - 2 * p == s and s > 1 and \
            os.environ.get('DAFT_POLY_UPS', '1') != '0':
        return _conv_transpose1d_poly(x, w, b, s, p)
    w_t = jnp.flip(jnp.swapaxes(w, 0, 1), axis=-1)      # (out, in, k)
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w_t, window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(stride,), dimension_numbers=_DN)
    return y + b[None, :, None]


def _conv_transpose1d_poly(x, w, b, s, p, in_tc=False, out_tc=False):
    """Polyphase transposed conv, valid when k - 2p == s.

    y[co, q*s + r] = Σ_t Σ_ci w[ci, co, j0(r) + t*s] * x[ci, q + δ(r) - t]
    with j0(r) = (r + p) mod s and δ(r) = (r + p) // s.

    ``in_tc``/``out_tc`` select (B, T, C) time-major layouts. In tc-out
    form the phase interleave is a plain reshape of the einsum result
    (time-major ordering already interleaves the s phases) — the ct-out
    form needs an explicit transpose of the full upsampled tensor.
    """
    if in_tc:
        B, T, C_in = x.shape
    else:
        B, C_in, T = x.shape
    C_out = w.shape[1]
    k = w.shape[-1]
    n_taps = k // s                                     # taps per phase
    # shifts δ(r) - t span [δ_min - (n_taps-1), δ_max]
    deltas = [(r + p) // s for r in range(s)]
    shifts = sorted({d - t for d in deltas for t in range(n_taps)},
                    reverse=True)
    # stacked input: rows are x shifted by each needed offset
    # x[q + shift]: left-pad by max(shifts), right-pad by -min(shifts)
    hi, lo = max(shifts), min(shifts)
    t_axis = 1 if in_tc else 2
    pad = [(0, 0)] * 3
    pad[t_axis] = (-lo if lo < 0 else 0, hi if hi > 0 else 0)
    xp = jnp.pad(x, pad)
    off0 = -lo if lo < 0 else 0
    stacked = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xp, off0 + sh, T, axis=t_axis)
         for sh in shifts], axis=2 if in_tc else 1)
    # (B, |S|*C_in, T) ct — or (B, T, |S|*C_in) tc
    # big weight: row block r*C_out..(r+1)*C_out, col block for shift
    shift_col = {sh: i for i, sh in enumerate(shifts)}
    W = jnp.zeros((s * C_out, len(shifts) * C_in), x.dtype)
    for r in range(s):
        j0, d = (r + p) % s, deltas[r]
        for t in range(n_taps):
            col = shift_col[d - t]
            W = W.at[r * C_out:(r + 1) * C_out,
                     col * C_in:(col + 1) * C_in].set(
                jnp.swapaxes(w[:, :, j0 + t * s], 0, 1).astype(x.dtype))
    eq = 'oc,btc->bto' if in_tc else 'oc,bct->bto'
    if out_tc:
        y = jnp.einsum(eq, W, stacked)                  # (B, T, s*C_out)
        # y[b, t, r*C_out + co] is output time t*s + r → time-major
        # flatten interleaves the phases for free
        y = y.reshape(B, T * s, C_out)
        return y + b[None, None, :]
    y = jnp.einsum('oc,btc->bot' if in_tc else 'oc,bct->bot', W, stacked)
    y = y.reshape(B, s, C_out, T)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(B, C_out, T * s)
    return y + b[None, :, None]


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _resblock1(params, x, dilations):
    for i, d in enumerate(dilations):
        xt = _lrelu(x)
        xt = _conv1d(xt, params[f'convs1_{i}']['w'], params[f'convs1_{i}']['b'],
                     dilation=d)
        xt = _lrelu(xt)
        xt = _conv1d(xt, params[f'convs2_{i}']['w'], params[f'convs2_{i}']['b'])
        x = xt + x
    return x


def _resblock2(params, x, dilations):
    for i, d in enumerate(dilations):
        xt = _lrelu(x)
        xt = _conv1d(xt, params[f'convs_{i}']['w'], params[f'convs_{i}']['b'],
                     dilation=d)
        x = xt + x
    return x


def generator_forward(params: Dict[str, Any], mel, config=None,
                      use_pallas=False, pallas_tile=8192, int8=None,
                      int8_act_scales=None, interpret=False, _tap=None):
    """mel: (B, n_mels, T) → wav (B, 1, T * prod(upsample_rates)).

    ``use_pallas=True`` routes each ResBlock1 group through the fused
    Pallas kernel (ops/vocoder_kernels.py) — one HBM round trip per block
    instead of six. Interior samples are exact; samples within the block's
    receptive field of the utterance edges differ slightly from the
    per-conv zero-padding semantics (keep the default path for bit-parity
    checks).

    ``int8`` (default: DAFT_VOC_INT8 env, off) additionally quantizes the
    fused kernels' resblock matmuls to int8 (per-channel weight scales,
    per-tile activation scales) — 2x MXU rate on the matmul-bound levels
    at a ~1e-2 relative waveform error (quantized-serving mode, not the
    parity path). Requires ``use_pallas=True`` (raises otherwise); levels
    whose channel width is not a multiple of 32 (never the case for the
    real V1 config) silently fall back to the bf16 kernels — int8 sublane
    slices need 32-granules.
    """
    cfg = config or DEFAULT_CONFIG
    if int8 is None:
        # env-derived opt-in: warn (a global env var may legitimately
        # coexist with non-pallas parity calls) instead of raising
        int8 = os.environ.get('DAFT_VOC_INT8', '0') == '1'
        if int8 and not use_pallas:
            warnings.warn('DAFT_VOC_INT8=1 has no effect with '
                          'use_pallas=False — serving full precision')
    elif int8 and not use_pallas:
        raise ValueError('generator_forward(int8=True) requires '
                         'use_pallas=True — the int8 path lives in the '
                         'fused Pallas kernels; the XLA path would '
                         'silently serve full precision')
    int8 = bool(int8) and use_pallas
    # _tap: diagnostics-only hook called as _tap(level, x, cur_p, cur_tc)
    # after each upsample level (scripts/qualify_int8.py per-level error
    # budgets); captured values join the traced outputs of the caller.
    num_kernels = len(cfg['resblock_kernel_sizes'])
    resblock = _resblock1 if cfg['resblock'] == '1' else _resblock2
    # DAFT_MRF_PHASE=0 is the phase-kernel kill switch — it must disable
    # the chain too, not just the internal-relayout branch in _pallas_mrf
    chain = use_pallas and cfg['resblock'] == '1' and \
        os.environ.get('DAFT_PHASE_CHAIN', '1') != '0' and \
        os.environ.get('DAFT_MRF_PHASE', '1') != '0'

    x = _conv1d(mel, params['conv_pre']['w'], params['conv_pre']['b'])
    cur_p = 1        # current phase depth of x: (B, cur_p*C, T/cur_p)
    cur_tc = False   # x currently in (B, T, C) time-major layout
    xla_min_c = int(os.environ.get('DAFT_MRF_XLA_MIN_C', '0') or 0)
    n_ups = len(cfg['upsample_rates'])
    post_done = False
    for i, (u, k) in enumerate(zip(cfg['upsample_rates'],
                                   cfg['upsample_kernel_sizes'])):
        c_out = params[f'ups_{i}']['w'].shape[1]
        want_p = _phase_for(c_out)
        # wide levels (C >= 128): time-in-sublanes MRF kernel — tap
        # shifts are sublane offsets (free) vs the ct kernel's VPU lane
        # rotations; the polyphase upsample emits (B, T, C) directly (the
        # phase interleave becomes a free reshape). int8-static serving
        # routes here too (tc-int8: dense FLOPs at the s8 MXU rate; the
        # banded ct form's kcols/k inflation cancels most of int8's 2x);
        # dynamic-scale int8 keeps the ct kernel (per-tile scales don't
        # commute with the tc input-channel fold).
        tc_int8 = (int8 and (int8_act_scales or {}).get(i) is not None
                   and c_out % 32 == 0
                   and os.environ.get('DAFT_MRF_TC_INT8', '1') != '0')
        want_tc = (use_pallas and cfg['resblock'] == '1'
                   and (not int8 or tc_int8)
                   and c_out >= 128 and cur_p == 1
                   and not (xla_min_c and c_out >= xla_min_c)
                   and k - 2 * ((k - u) // 2) == u and u > 1
                   and os.environ.get('DAFT_MRF_TC', '1') != '0'
                   and os.environ.get('DAFT_POLY_UPS', '1') != '0')
        if want_tc:
            x = _conv_transpose1d_poly(
                _lrelu(x), params[f'ups_{i}']['w'], params[f'ups_{i}']['b'],
                u, (k - u) // 2, in_tc=cur_tc, out_tc=True)
            x = _pallas_mrf_tc(params, x, i, cfg, pallas_tile,
                               int8=int8 and tc_int8,
                               act_scales=(int8_act_scales or {}).get(i),
                               interpret=interpret)
            cur_tc = True
            if _tap is not None:
                _tap(i, x, cur_p, cur_tc)
            continue
        # narrow levels under int8-static: the phase-tc kernel — p phases
        # x C channels in the 128 lanes, time in sublanes, dense s8
        # (L,128)@(128,128) dots with zero staging (the banded form's
        # staging was ~34% of its runtime; measured L3 4.57 vs 5.40 ms,
        # L2 5.51 vs 6.14 standalone). Consumes the previous level's tc /
        # ptc rows directly (L1-tc emits (B,T,128); ups keeps row count),
        # and the fused conv_post epilogue's output reshapes straight to
        # the waveform. DAFT_MRF_PTC=0 reverts to the banded phase path.
        lvl_scales = (int8_act_scales or {}).get(i)
        # ptc wins at batch (B=128: 3215 vs 3056 audio-s/s) but loses at
        # B=1 (chained RTF 4.95 vs 4.41 ms: ~190 small dots/tile expose
        # per-op latency without batch grid rows to hide it) — route by
        # the static batch size, banded below DAFT_PTC_MIN_BATCH
        # the bf16 tier CAN route here too (fdot mode: same zero-staging
        # form with unquantized bf16 dots) but measured SLOWER at
        # pipeline level — B=128 bf16 tier 2045 banded vs ptc 1912/1978/
        # 2013 at tiles 4096/8192/16384: at the 1x bf16 MXU rate the
        # form's 2.92x-dense FLOPs (banded-compact: 2.14x) cost more
        # than the eliminated staging saves. Opt-in via
        # DAFT_MRF_PTC_BF16=1 (kept correctness-tested); int8's 2x s8
        # rate is what makes ptc win there.
        want_ptc = (use_pallas and cfg['resblock'] == '1' and chain
                    and (int8
                         and (lvl_scales is not None
                              or os.environ.get('DAFT_MRF_PTC_DYN',
                                                '1') != '0')
                         or not int8
                         and os.environ.get('DAFT_MRF_PTC_BF16',
                                            '0') != '0')
                    and os.environ.get('DAFT_MRF_PTC', '1') != '0'
                    and x.shape[0] >= int(os.environ.get(
                        'DAFT_PTC_MIN_BATCH', '8'))
                    and cur_tc and want_p >= 2 and want_p == u * cur_p
                    and k - 2 * ((k - u) // 2) == u
                    and want_p * c_out == 128
                    and cur_p * params[f'ups_{i}']['w'].shape[0] == 128
                    and c_out % 32 == 0)
        if want_ptc:
            post = params['conv_post'] if (
                i == n_ups - 1
                and os.environ.get('DAFT_FUSE_POST', '1') != '0') else None
            y_ptc, pd = _pallas_mrf_ptc(
                params, x, i, cfg, want_p, cur_p,
                ups=dict(params[f'ups_{i}'], stride=u,
                         padding=(k - u) // 2),
                post=post, act_scales=lvl_scales if int8 else None,
                int8=int8, interpret=interpret)
            if y_ptc is not None:
                x = y_ptc
                cur_p = want_p
                post_done = pd
                if _tap is not None:
                    _tap(i, x, cur_p, cur_tc)
                continue
        if cur_tc:
            x = jnp.swapaxes(x, 1, 2)      # to (B, cur_p*C, Q) phase/ct
            cur_tc = False
        if chain and want_p >= 2 and want_p == u * cur_p \
                and k - 2 * ((k - u) // 2) == u:
            # phase-native tail: the polyphase upsample emits phase
            # layout directly (no interleave transpose) and the fused
            # MRF kernel consumes/produces it (no to/from_phase) — the
            # relayouts otherwise cost as much as the kernel saves.
            # lrelu + the upsample itself fuse into the kernel prologue
            # (DAFT_FUSE_UPS=0 falls back to the XLA phase upsample);
            # the last level fuses lrelu→conv_post→tanh as the epilogue
            # (DAFT_FUSE_POST=0) when the halo margin allows.
            post = params['conv_post'] if (
                i == n_ups - 1
                and os.environ.get('DAFT_FUSE_POST', '1') != '0') else None
            # the fused-ups prologue needs p_out*C_out == p_in*C_in rows
            # (true for the V1 family); other configs fall back to the
            # XLA phase upsample feeding the kernel
            c_in = params[f'ups_{i}']['w'].shape[0]
            ups = dict(params[f'ups_{i}'], stride=u,
                       padding=(k - u) // 2, p_in=cur_p) if (
                os.environ.get('DAFT_FUSE_UPS', '1') != '0'
                and want_p * c_out == cur_p * c_in) else None
            if ups is None:
                from daft_exprt_tpu.ops.vocoder_kernels import (
                    conv_transpose1d_phase)
                x = conv_transpose1d_phase(
                    _lrelu(x), params[f'ups_{i}']['w'],
                    params[f'ups_{i}']['b'],
                    stride=u, padding=(k - u) // 2, p_in=cur_p)
            cur_p = want_p
            # int8 sublane slices land on 32-granules only when C % 32 == 0
            # (true for every real V1 level; synthetic narrower configs
            # fall back to the bf16 kernels)
            x, post_done = _pallas_mrf_phase(
                params, x, i, cfg, cur_p, post=post, ups=ups,
                int8=int8 and c_out % 32 == 0,
                act_scales=(int8_act_scales or {}).get(i),
                interpret=interpret)
            if _tap is not None:
                _tap(i, x, cur_p, cur_tc)
            continue
        x = _lrelu(x)
        if cur_p > 1:
            from daft_exprt_tpu.ops.vocoder_kernels import from_phase
            x = from_phase(x, cur_p)
            cur_p = 1
        x = _conv_transpose1d(x, params[f'ups_{i}']['w'],
                              params[f'ups_{i}']['b'], stride=u,
                              padding=(k - u) // 2)
        # C=256 standalone measurement (scripts/bench_tc_kernel.py --level
        # 0, B=8): XLA per-conv 6.94 ms vs ct 8.78 / tc 7.74 — XLA's own
        # lowering wins at the widest level; DAFT_MRF_XLA_MIN_C routes
        # such levels to plain XLA resblocks even under use_pallas
        if use_pallas and cfg['resblock'] == '1' and \
                not (xla_min_c and c_out >= xla_min_c):
            x = _pallas_mrf(params, x, i, cfg, num_kernels, pallas_tile,
                            int8=int8,
                            act_scales=(int8_act_scales or {}).get(i),
                            interpret=interpret)
        else:
            xs = None
            for j, dil in enumerate(cfg['resblock_dilation_sizes']):
                rb = params[f'resblock_{i}_{j}']
                y = resblock(rb, x, dil)
                xs = y if xs is None else xs + y
            x = xs / num_kernels
        if _tap is not None:
            _tap(i, x, cur_p, cur_tc)
    if post_done:
        if cur_tc:
            # ptc epilogue output (B, Q, p): the row-major flatten IS the
            # waveform (x[q, r] = wav[p*q + r])
            B_, Q_, pr = x.shape
            return x.reshape(B_, 1, Q_ * pr)
        # banded epilogue; x is (B, p*1, T/p) phase layout
        from daft_exprt_tpu.ops.vocoder_kernels import from_phase
        return from_phase(x, cur_p)
    if cur_tc:
        x = jnp.swapaxes(x, 1, 2)                   # back to (B, C, T)
    x = _lrelu(x)
    if cur_p > 1:
        from daft_exprt_tpu.ops.vocoder_kernels import (
            from_phase, phase_conv1d)
        x = phase_conv1d(x, params['conv_post']['w'],
                         params['conv_post']['b'], cur_p)
        x = from_phase(x, cur_p)        # (B, 1, T): cheap, one channel
    else:
        x = _conv1d(x, params['conv_post']['w'], params['conv_post']['b'])
    return jnp.tanh(x)


def _phase_for(c):
    """Phase depth that fills the 128 MXU rows for channel width c."""
    if c <= 0 or c >= 128 or 128 % c != 0:
        return 1
    return min(8, 128 // c)


def _pallas_mrf_phase(params, x_p, level, cfg, p, post=None, ups=None,
                      int8=False, act_scales=None, interpret=False):
    """Fused phase-native MRF: x_p (B, p*C, Q) in, same layout out.

    ``post``: the conv_post params dict — when given AND the chain halo
    leaves enough margin, the generator tail (lrelu → conv_post → tanh)
    fuses into the kernel epilogue. ``ups``: dict(w, b, stride, padding,
    p_in) — when given, x_p is the PRE-upsample activation and
    lrelu + the transposed-conv upsample fuse into the kernel prologue.
    Returns (y_p, post_applied)."""
    from daft_exprt_tpu.ops.vocoder_kernels import (
        conv_transpose1d_phase, fused_mrf_phase, pack_mrf_phase_weights,
        pack_post_phase_weights, pack_ups_phase_weights,
        phase_post_feasible, ups_used_blocks)
    ks = tuple(cfg['resblock_kernel_sizes'])
    dils = tuple(tuple(d) for d in cfg['resblock_dilation_sizes'])
    Q = x_p.shape[2]
    # int8 tiles run 2x larger: the s8 staging stack halves the VMEM cost
    # per column and the decompose probe's ~25% fixed (DMA+loop) share
    # amortizes — measured 5.85 vs 6.41 ms at the L3 probe shape
    # (bench_int8_decompose --tile 8192; bf16 keeps 4096 — larger bf16
    # tiles measured SLOWER in round 2). DAFT_PHASE_TILE overrides.
    eff = int(os.environ.get('DAFT_PHASE_TILE', '') or
              (8192 if int8 else 4096))
    while Q % eff != 0 and eff > 64:
        eff //= 2
    if Q % eff != 0:
        from daft_exprt_tpu.ops.vocoder_kernels import from_phase, to_phase
        if ups is not None:
            x_p = conv_transpose1d_phase(_lrelu(x_p), ups['w'], ups['b'],
                                         ups['stride'], ups['padding'],
                                         ups['p_in'])
        x = from_phase(x_p, p)
        return to_phase(_pallas_mrf(params, x, level, cfg, len(ks), 8192,
                                    int8=int8, act_scales=act_scales,
                                    interpret=interpret),
                        p), False
    weights = pack_mrf_phase_weights(params, level, ks, dils, p)
    ph_scales = None
    if int8 and act_scales is not None:
        ph_scales = [s[i] for s1, s2 in act_scales
                     for i in range(s1.shape[0]) for s in (s1, s2)]
    kw = {}
    if ups is not None:
        wb, bu, ups_w, ups_dmin = pack_ups_phase_weights(
            ups['w'], ups['b'], ups['stride'], ups['padding'], ups['p_in'])
        kw = dict(ups_weights=(wb, bu), ups_w=ups_w, ups_dmin=ups_dmin,
                  ups_p_in=ups['p_in'],
                  ups_used=ups_used_blocks(ups['w'].shape[-1],
                                           ups['stride'], ups['padding'],
                                           ups['p_in']))
    post_k = post['w'].shape[-1] if post is not None else 0
    if post_k and phase_post_feasible(ks, dils, p, post_k, eff):
        post_weights = pack_post_phase_weights(post['w'], post['b'], p)
        return fused_mrf_phase(x_p, weights, ks, dils, p, tile=eff,
                               in_phase=True, out_phase=True,
                               post_weights=post_weights, post_k=post_k,
                               int8_chain=int8, act_scales=ph_scales,
                               int8_fused=_int8_fused(),
                               interpret=interpret, **kw), True
    return fused_mrf_phase(x_p, weights, ks, dils, p, tile=eff,
                           in_phase=True, out_phase=True, int8_chain=int8,
                           act_scales=ph_scales, int8_fused=_int8_fused(),
                           interpret=interpret, **kw), False


def calibrate_act_scales(params, mels, config=None):
    """Per-channel amax of every resblock conv input (post-lrelu) from the
    XLA reference forward on calibration mels — the statistics behind the
    int8 kernels' STATIC activation scales (folded into the banded weight
    columns at pack time; unlike per-time scales they commute with the
    banded time shifts).

    Returns {level: [(s1, s2), ...] per resblock} with s1/s2 shaped
    (n_dil, C): s1 = conv1 inputs (the residual stream), s2 = conv2
    inputs (conv1 outputs).
    """
    cfg = config or DEFAULT_CONFIG
    if cfg['resblock'] != '1':
        raise ValueError('static act-scale calibration targets the '
                         'ResBlock1 fused kernels')
    mels = jnp.asarray(mels, jnp.float32)
    if mels.ndim == 2:
        mels = mels[None]
    x = _conv1d(mels, params['conv_pre']['w'], params['conv_pre']['b'])
    scales = {}

    def amax_c(t):
        return jnp.max(jnp.abs(t), axis=(0, 2))            # (C,)

    for i, (u, k) in enumerate(zip(cfg['upsample_rates'],
                                   cfg['upsample_kernel_sizes'])):
        x = _conv_transpose1d(_lrelu(x), params[f'ups_{i}']['w'],
                              params[f'ups_{i}']['b'], stride=u,
                              padding=(k - u) // 2)
        xs = None
        level = []
        for j, dils in enumerate(cfg['resblock_dilation_sizes']):
            rb = params[f'resblock_{i}_{j}']
            cur = x
            s1, s2 = [], []
            for ii, d in enumerate(dils):
                t1 = _lrelu(cur)
                s1.append(amax_c(t1))
                a = _conv1d(t1, rb[f'convs1_{ii}']['w'],
                            rb[f'convs1_{ii}']['b'], dilation=d)
                t2 = _lrelu(a)
                s2.append(amax_c(t2))
                cur = cur + _conv1d(t2, rb[f'convs2_{ii}']['w'],
                                    rb[f'convs2_{ii}']['b'])
            level.append((jnp.stack(s1), jnp.stack(s2)))
            xs = cur if xs is None else xs + cur
        x = xs / len(cfg['resblock_kernel_sizes'])
        scales[i] = level
    return jax.tree_util.tree_map(np.asarray, scales)


def _pallas_mrf_tc(params, x_tc, level, cfg, tile, int8=False,
                   act_scales=None, interpret=False):
    """Wide-level MRF via the time-in-sublanes kernel: tap shifts are
    sublane offsets instead of VPU lane rotations (the measured ~33%
    overhead holding L1 at 67% MXU). x_tc: (B, T, C) → (B, T, C).
    With ``int8`` + this level's ``act_scales`` calibration entry, runs
    the tc int8-static form — dense conv FLOPs at the 2x s8 MXU rate
    (the banded ct/phase int8 forms pay a kcols/k FLOP inflation that
    cancels most of the int8 rate gain; tc-int8 keeps all of it)."""
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_tc, pack_mrf_tc_int8_weights, pack_mrf_tc_weights)
    B, T, C = x_tc.shape
    ks = tuple(cfg['resblock_kernel_sizes'])
    dils = tuple(tuple(d) for d in cfg['resblock_dilation_sizes'])
    # int8 tiles run 4x larger (s8 operands; fixed DMA/loop costs
    # amortize): L1 9.45→8.46 ms, L0 4.61→4.26 (bench_tc_kernel
    # --tile_tc). bf16 keeps the round-2 tile*C ≈ 512K rule.
    cap = (1 << 21) if int8 else (1 << 19)
    eff_tile = (tile * 4) if int8 else tile
    while eff_tile * C > cap and eff_tile > 512:
        eff_tile //= 2
    if T % eff_tile != 0:
        eff_tile = min(eff_tile, T)
        while T % eff_tile != 0:
            eff_tile //= 2
    if int8 and act_scales is not None:
        weights = pack_mrf_tc_int8_weights(params, level, ks, dils,
                                           act_scales)
        return fused_mrf_tc(x_tc, weights, ks, dils, tile=eff_tile,
                            q8=True, interpret=interpret)
    weights = pack_mrf_tc_weights(params, level, ks, dils)
    return fused_mrf_tc(x_tc, weights, ks, dils, tile=eff_tile,
                        interpret=interpret)


def _pallas_mrf_ptc(params, x_rows, level, cfg, p, p_in, ups, post,
                    act_scales, int8=True, interpret=False):
    """Fused upsample + MRF (+ conv_post) in phase-tc layout: int8-static
    (``act_scales``), dynamic-int8 (``int8`` without scales), or bf16
    float dots (``int8=False`` — the bf16 serving tier).

    x_rows: (B, Q, p_in*C_in) with p_in*C_in == 128 (the tc layout the
    wide levels emit is the p_in=1 case). Returns (y, post_applied) —
    y is (B, Q, p*C_out), or (B, Q, p) when the conv_post epilogue ran,
    or (None, False) when the row count cannot tile (caller falls back
    to the banded phase path)."""
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_ptc, pack_mrf_ptc_f_weights, pack_mrf_ptc_weights,
        pack_post_ptc_weights, pack_ups_ptc_f_weights,
        pack_ups_ptc_weights, ptc_post_feasible)
    ks = tuple(cfg['resblock_kernel_sizes'])
    dils = tuple(tuple(d) for d in cfg['resblock_dilation_sizes'])
    rows = x_rows.shape[1]
    eff = int(os.environ.get('DAFT_PTC_TILE', '')
              or (8192 if int8 else 4096))
    while rows % eff != 0 and eff > 64:
        eff //= 2
    if rows % eff != 0:
        return None, False
    if int8:
        weights = pack_mrf_ptc_weights(params, level, ks, dils, p,
                                       act_scales)
        Uq, sw_u, b_u, u_shifts = pack_ups_ptc_weights(
            ups['w'], ups['b'], ups['stride'], ups['padding'], p_in)
        ups_w = (Uq, sw_u, b_u)
    else:
        wdt = (x_rows.dtype if x_rows.dtype == jnp.bfloat16
               else jnp.bfloat16)
        weights = pack_mrf_ptc_f_weights(params, level, ks, dils, p,
                                         dtype=wdt)
        U, b_u, u_shifts = pack_ups_ptc_f_weights(
            ups['w'], ups['b'], ups['stride'], ups['padding'], p_in,
            dtype=wdt)
        ups_w = (U, b_u)
    post_w, post_k = None, 0
    if post is not None and ptc_post_feasible(ks, dils, p,
                                              post['w'].shape[-1], eff):
        P, b_p, post_k = pack_post_ptc_weights(post['w'], post['b'], p,
                                               dtype=x_rows.dtype)
        post_w = (P, b_p)
    y = fused_mrf_ptc(x_rows, weights, ks, dils, p, tile=eff,
                      post_weights=post_w, post_k=post_k,
                      ups_weights=ups_w, ups_shifts=u_shifts,
                      dyn=int8 and act_scales is None, fdot=not int8,
                      interpret=interpret)
    return y, post_w is not None


def _int8_fused():
    """DAFT_INT8_FUSED_EPI=0 reverts the int8-static kernels to the
    round-3 separate dequant→lrelu→requant epilogue (A/B knob). Passed to
    the kernels as a static jit arg so flipping it re-keys the cache."""
    return os.environ.get('DAFT_INT8_FUSED_EPI', '1') != '0'


def _pallas_mrf(params, x, level, cfg, num_kernels, tile, int8=False,
                act_scales=None, interpret=False):
    """Multi-receptive-field fusion of one upsample level's resblocks via
    the fused channels-in-sublanes Pallas kernel: all ``num_kernels``
    resblocks computed in one HBM round trip. x: (B, C, T) → (B, C, T).
    ``act_scales``: this level's [(s1, s2) per block] calibration entry
    (see calibrate_act_scales) — switches the int8 path to static
    per-channel activation scales."""
    from daft_exprt_tpu.ops.vocoder_kernels import (
        fused_mrf_ct, fused_mrf_phase, pack_mrf_phase_weights,
        pack_mrf_weights)
    B, C, T = x.shape
    ks = tuple(cfg['resblock_kernel_sizes'])
    dils = tuple(tuple(d) for d in cfg['resblock_dilation_sizes'])
    int8 = int8 and C % 32 == 0      # int8 sublane slicing granularity
    if not int8:
        act_scales = None
    # narrowest levels (C*4 <= 128): phase-major banded kernel — folds 4
    # time phases into channels so every conv matmul fills all 128 MXU
    # rows (1.75x the M=C-bound matmul floor on the V1 conv mix)
    p = 128 // C if C > 0 and 128 % C == 0 else 1
    if p >= 4 and os.environ.get('DAFT_MRF_PHASE', '1') != '0':
        p = min(p, 8)
        eff = 4096
        while T % (p * eff) != 0 and eff > 128:
            eff //= 2
        if T % (p * eff) == 0:
            weights = pack_mrf_phase_weights(params, level, ks, dils, p)
            ph_scales = None
            # DAFT_INT8_STATIC_PHASE=0: keep dynamic scales on the phase
            # (narrow) levels while the ct levels use static — the
            # standalone L2 numbers slightly favor dynamic there
            if os.environ.get('DAFT_INT8_STATIC_PHASE', '1') == '0':
                act_scales = None
            if act_scales is not None:
                # phase pack order: per (block, dil): conv1, conv2
                ph_scales = [s[i] for s1, s2 in act_scales
                             for i in range(s1.shape[0])
                             for s in (s1, s2)]
            return fused_mrf_phase(x, weights, ks, dils, p, tile=eff,
                                   int8_chain=int8, act_scales=ph_scales,
                                   int8_fused=_int8_fused(),
                                   interpret=interpret)
    # scale the time tile with channel width so the in-kernel chain
    # (several live (C, tile) f32 intermediates + the packed weights)
    # fits VMEM; tile*C ≈ 512K elements ≈ 2 MB per live buffer
    eff_tile = tile
    while eff_tile * C > (1 << 19) and eff_tile > 512:
        eff_tile //= 2
    if T % eff_tile != 0:
        eff_tile = min(eff_tile, T)
        while T % eff_tile != 0:
            eff_tile //= 2
    # narrow levels (C<=64): one (C, k*C)@(k*C, L) matmul per conv keeps
    # the MXU reduction deep; wide levels use per-tap (C, C) matmuls so
    # the stacked operand doesn't blow VMEM
    merge = C <= 64 and not int8 and \
        os.environ.get('DAFT_MRF_MERGE', '1') != '0'
    weights = pack_mrf_weights(params, level, ks, dils, merge_taps=merge)
    ct_scales = None
    if act_scales is not None:
        # ct pack order: per block: conv1-stack, conv2-stack (n_dil, C)
        ct_scales = [s for s1, s2 in act_scales for s in (s1, s2)]
    return fused_mrf_ct(x, weights, ks, dils, tile=eff_tile,
                        merge_taps=merge, int8_chain=int8,
                        act_scales=ct_scales, int8_fused=_int8_fused(),
                        interpret=interpret)


def init_generator_params(rng, config=None, std=0.01):
    """Fresh generator params (normal(0, 0.01) like the reference init)."""
    cfg = config or DEFAULT_CONFIG
    params: Dict[str, Any] = {}
    counter = iter(range(1 << 16))

    def norm(shape):
        key = jax.random.fold_in(rng, next(counter))
        return std * jax.random.normal(key, shape, dtype=jnp.float32)

    c0 = cfg['upsample_initial_channel']
    params['conv_pre'] = {'w': norm((c0, cfg['model_in_dim'], 7)),
                          'b': jnp.zeros((c0,))}
    ch = c0
    for i, (u, k) in enumerate(zip(cfg['upsample_rates'],
                                   cfg['upsample_kernel_sizes'])):
        out = c0 // (2 ** (i + 1))
        params[f'ups_{i}'] = {'w': norm((ch, out, k)), 'b': jnp.zeros((out,))}
        ch = out
        for j, (rk, dils) in enumerate(zip(cfg['resblock_kernel_sizes'],
                                           cfg['resblock_dilation_sizes'])):
            rb = {}
            for l in range(len(dils)):
                if cfg['resblock'] == '1':
                    rb[f'convs1_{l}'] = {'w': norm((out, out, rk)),
                                         'b': jnp.zeros((out,))}
                    rb[f'convs2_{l}'] = {'w': norm((out, out, rk)),
                                         'b': jnp.zeros((out,))}
                else:
                    rb[f'convs_{l}'] = {'w': norm((out, out, rk)),
                                        'b': jnp.zeros((out,))}
            params[f'resblock_{i}_{j}'] = rb
    params['conv_post'] = {'w': norm((1, ch, 7)), 'b': jnp.zeros((1,))}
    return params


# ----------------------------------------------------------------------
# torch checkpoint conversion
# ----------------------------------------------------------------------

def _fold_wn(sd, prefix):
    """Fold weight_norm(dim=0) params into a plain kernel; pass through
    plain .weight if weight norm was already removed."""
    if f'{prefix}.weight_v' in sd:
        v = np.asarray(sd[f'{prefix}.weight_v'], dtype=np.float32)
        g = np.asarray(sd[f'{prefix}.weight_g'], dtype=np.float32)
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    else:
        w = np.asarray(sd[f'{prefix}.weight'], dtype=np.float32)
    return {'w': jnp.asarray(w),
            'b': jnp.asarray(np.asarray(sd[f'{prefix}.bias'], dtype=np.float32))}


def convert_torch_generator(state_dict, config=None):
    """Reference HiFiGANGenerator state_dict → our params pytree."""
    cfg = config or DEFAULT_CONFIG
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {'conv_pre': _fold_wn(sd, 'conv_pre'),
                              'conv_post': _fold_wn(sd, 'conv_post')}
    num_kernels = len(cfg['resblock_kernel_sizes'])
    for i in range(len(cfg['upsample_rates'])):
        params[f'ups_{i}'] = _fold_wn(sd, f'ups.{i}')
        for j, dils in enumerate(cfg['resblock_dilation_sizes']):
            flat_idx = i * num_kernels + j
            rb = {}
            for l in range(len(dils)):
                if cfg['resblock'] == '1':
                    rb[f'convs1_{l}'] = _fold_wn(sd, f'resblocks.{flat_idx}.convs1.{l}')
                    rb[f'convs2_{l}'] = _fold_wn(sd, f'resblocks.{flat_idx}.convs2.{l}')
                else:
                    rb[f'convs_{l}'] = _fold_wn(sd, f'resblocks.{flat_idx}.convs.{l}')
            params[f'resblock_{i}_{j}'] = rb
    return params


class HiFiGanVocoder:
    """Frozen inference wrapper mirroring the reference API
    (reference: src/daft_exprt/vocoder/hifigan.py:187-226).

    Serving tiers (measured on a v5e chip, error vs the f32 XLA path on
    trained weights — PARITY.md "int8 vocoder serving mode"):

    - ``fast=False`` (default): parity-exact f32 XLA path.
    - ``fast=True`` / ``'bf16'``: bf16 activations through the fused
      Pallas MRF kernels + phase-native tail chain (~2.2x f32; waveform
      rel-L2 0.002).
    - ``fast='int8'``: additionally quantizes the resblock matmuls to
      int8 (~2.7x f32, the bench.py headline path; waveform rel-L2
      0.008, mel-L1 0.008).

    Also via DAFT_FAST_VOCODER=1|bf16|int8.
    """

    def __init__(self, params=None, config=None, checkpoint_path=None,
                 fast=None, int8_calibration_mels=None):
        self.config = config or DEFAULT_CONFIG
        if params is None:
            if checkpoint_path is None:
                # reference behavior: auto-fetch the universal checkpoint
                # (gated behind DAFT_ALLOW_DOWNLOAD — see
                # download_default_checkpoint)
                checkpoint_path = download_default_checkpoint()
            params = load_torch_generator(checkpoint_path, self.config)
        self.params = params
        if fast is None:
            env = os.environ.get('DAFT_FAST_VOCODER', '0')
            fast = env if env in ('int8', 'bf16') else env == '1'
        # DAFT_VOC_INT8=1 upgrades the generic fast tier to int8 (the
        # pre-tier spelling documented in README — keep it working)
        int8 = fast == 'int8' or (
            bool(fast) and fast != 'bf16'
            and os.environ.get('DAFT_VOC_INT8', '0') == '1')
        self.fast = bool(fast)
        # optional: per-channel STATIC activation scales for the int8
        # tier, calibrated on representative mels (cuts the waveform
        # error ~20%: rel-L2 0.0064 vs 0.0081 dynamic — PARITY.md)
        act_scales = None
        if int8_calibration_mels is not None and not int8:
            warnings.warn("int8_calibration_mels given but the serving "
                          "tier is not int8 (fast=%r) — calibration "
                          "ignored" % (fast,))
        if int8 and int8_calibration_mels is not None:
            cal = jnp.asarray(int8_calibration_mels, jnp.float32)
            act_scales = calibrate_act_scales(params, cal, self.config)
        if self.fast:
            # Mosaic kernels only lower for TPU — interpret everywhere
            # else (tests / CPU or GPU smoke runs)
            dev = jax.config.jax_default_device or jax.devices()[0]
            interp = getattr(dev, 'platform', '') not in ('tpu', 'axon')

            def run(p, m):
                p16 = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), p)
                wav = generator_forward(p16, m.astype(jnp.bfloat16),
                                        self.config, use_pallas=True,
                                        int8=int8,
                                        int8_act_scales=act_scales,
                                        interpret=interp)
                return wav.astype(jnp.float32)
            self._infer = jax.jit(run)
        else:
            self._infer = jax.jit(
                lambda p, m: generator_forward(p, m, self.config))

    def infer(self, mel_spec):
        """mel (n_mels, T) or (B, n_mels, T) → float32 wav in [-1, 1]."""
        mel = jnp.asarray(mel_spec, dtype=jnp.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        T0 = mel.shape[-1]
        if self.fast:
            # bucket T to a multiple of 128 frames: keeps the Pallas tile
            # selection on 128-lane granules for arbitrary utterance
            # lengths AND caps jit retraces to a handful of buckets
            # instead of one compile (~minutes on the tunnel) per unique
            # length. Pad with the mel floor log(1e-5); crop the wav.
            t_pad = -(-T0 // 128) * 128
            if t_pad != T0:
                mel = jnp.pad(mel, ((0, 0), (0, 0), (0, t_pad - T0)),
                              constant_values=float(np.log(1e-5)))
        hop = int(np.prod(self.config['upsample_rates']))
        audio = self._infer(self.params, mel)
        audio = np.asarray(audio)[:, 0, :T0 * hop]
        if squeeze:
            audio = audio[0]
        return np.clip(audio, -1.0, 1.0)


def load_torch_generator(path, config=None):
    """Load a torch HiFi-GAN generator checkpoint and convert it.

    Uses the repo-wide guarded loader (checkpoint.torch_load_guarded):
    ``weights_only=True`` first, full unpickling only behind
    ``DAFT_TORCH_LOAD_UNSAFE=1`` for local trusted files."""
    from daft_exprt_tpu.checkpoint import torch_load_guarded
    ckpt = torch_load_guarded(path)
    sd = ckpt.get('generator', ckpt.get('state_dict', ckpt)) \
        if isinstance(ckpt, dict) else ckpt
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return convert_torch_generator(sd, config)


def load_hifigan_vocoder(checkpoint_path=None, params=None, config=None,
                         fast=None, int8_calibration_mels=None):
    return HiFiGanVocoder(params=params, config=config,
                          checkpoint_path=checkpoint_path, fast=fast,
                          int8_calibration_mels=int8_calibration_mels)
