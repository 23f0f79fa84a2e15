"""Activation zoo matching the reference's build_activation
(ofa/utils.py:245-310). The pixelshuffle/pixelunshuffle "activations" live in
ops/pixelshuffle.py and are wired at the layer level."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, 0)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0), 6.0)


def h_swish(x):
    """x * relu6(x + 3) / 6 (reference Hswish, ofa/utils.py:334-341)."""
    return x * relu6(x + 3.0) / 6.0


def h_sigmoid(x):
    """relu6(x + 3) / 6 (reference Hsigmoid, ofa/utils.py:344-351)."""
    return relu6(x + 3.0) / 6.0


def lrelu(x):
    """LeakyReLU(0.1) (reference build_activation 'lrelu')."""
    return jnp.where(x >= 0, x, 0.1 * x)


ACT_FNS = {
    "relu": relu,
    "relu6": relu6,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "h_swish": h_swish,
    "h_sigmoid": h_sigmoid,
    "lrelu": lrelu,
    None: lambda x: x,
    "none": lambda x: x,
}


def apply_act(x, act_func):
    return ACT_FNS[act_func](x)
