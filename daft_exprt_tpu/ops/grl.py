"""Gradient reversal as a jax.custom_vjp.

Identity in the forward pass; upstream gradients are multiplied by -lambda in
the backward pass (Ganin & Lempitsky, ICML 2015). TPU-native replacement for
the autograd Function of the reference (reference: src/daft_exprt/model.py:27-54).
"""
import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, lambda_=1.0):
    return x


def _grl_fwd(x, lambda_):
    return x, None


def _grl_bwd(lambda_, _res, g):
    return (-lambda_ * g,)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)
