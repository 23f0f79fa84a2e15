"""NHWC convolution primitives.

The reference is NCHW PyTorch (F.conv2d everywhere); on TPU the canonical
layout is NHWC with HWIO kernels so XLA tiles convs straight onto the MXU.
Weight initialization reproduces the reference's `he_fout`
(ofa/utils.py:134-155): normal(0, sqrt(2 / (kh*kw*out_channels))).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv_init(key, kernel_size, in_ch, out_ch, dtype=jnp.float32, mode="he_fout"):
    """he_fout / he_fin init (reference ofa/utils.py:134-147), HWIO layout."""
    if mode == "he_fout":
        n = kernel_size * kernel_size * out_ch
    elif mode == "he_fin":
        n = kernel_size * kernel_size * in_ch
    else:
        raise NotImplementedError(mode)
    std = math.sqrt(2.0 / n)
    return std * jax.random.normal(key, (kernel_size, kernel_size, in_ch, out_ch), dtype)


def depthwise_conv_init(key, kernel_size, channels, dtype=jnp.float32, mode="he_fout"):
    """Depthwise kernel bank, HWIO with I=1 (groups == channels).

    he_fout uses out_channels == channels (torch Conv2d with
    groups=C, out=C has weight [C,1,k,k]; fan-out n = k*k*C).
    """
    if mode == "he_fout":
        n = kernel_size * kernel_size * channels
    elif mode == "he_fin":
        n = kernel_size * kernel_size * channels
    else:
        raise NotImplementedError(mode)
    std = math.sqrt(2.0 / n)
    return std * jax.random.normal(key, (kernel_size, kernel_size, 1, channels), dtype)


def icnr_conv_init(key, kernel_size, in_ch, out_ch, r=2, dtype=jnp.float32,
                   mode="he_fout"):
    """ICNR init for a sub-pixel (conv -> PixelShuffle(r)) head
    (arXiv:1707.02937): initialize out_ch/r^2 distinct filters and replicate
    each r^2 times along the output axis, so at init the shuffled output is
    a nearest-neighbor upsample — no checkerboard artifact. Replication
    order matches pixel_shuffle's row-major (c, y, x) channel decomposition
    (ops/pixelshuffle.py)."""
    assert out_ch % (r * r) == 0
    w = conv_init(key, kernel_size, in_ch, out_ch // (r * r), dtype, mode)
    return jnp.repeat(w, r * r, axis=-1)


def conv2d(x, w, stride=1, padding="same"):
    """2D conv, NHWC x HWIO -> NHWC.

    `padding='same'` reproduces the reference's get_same_padding (k//2 per
    side, odd kernels only — ofa/utils.py:212-220).
    """
    k = w.shape[0]
    if padding == "same":
        p = k // 2
        pad = ((p, p), (p, p))
    elif padding == "valid":
        pad = ((0, 0), (0, 0))
    else:
        pad = padding
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMS,
    )


def depthwise_conv2d(x, w, stride=1, padding="same"):
    """Depthwise conv: w is [k,k,1,C], feature_group_count=C.

    Matches F.conv2d(..., groups=in_channel) in
    DynamicSeparableConv2d.forward (dynamic_op.py:73-84).
    """
    k = w.shape[0]
    c = x.shape[-1]
    if padding == "same":
        p = k // 2
        pad = ((p, p), (p, p))
    elif padding == "valid":
        pad = ((0, 0), (0, 0))
    else:
        pad = padding
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMS,
        feature_group_count=c,
    )
