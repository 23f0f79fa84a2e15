"""Pixel shuffle / unshuffle with the reference's exact channel ordering.

The reference implements PixelShuffle via torch.nn.PixelShuffle and
PixelUnshuffle via a grouped conv with a one-hot kernel
(ofa/utils.py:383-397): output channel c*r^2 + y*r + x holds input channel
c's sub-pixel (y, x). On TPU both are pure reshape/transpose (SURVEY.md §7.0)
— no conv, no data movement beyond a layout change XLA can fuse.

Layout here is NHWC; channel ordering is kept identical to torch's NCHW
semantics so checkpoints imported from the reference produce identical
images.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x, r=2):
    """[B,H,W,C*r^2] -> [B,H*r,W*r,C]; input channel c*r^2 + y*r + x feeds
    output channel c at sub-pixel (y, x) — torch.nn.PixelShuffle semantics."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    # channel index decomposes row-major as (c, y, x)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, y, w, x, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x, r=2):
    """[B,H,W,C] -> [B,H/r,W/r,C*r^2]; inverse of pixel_shuffle, matching the
    reference's one-hot grouped-conv ordering (ofa/utils.py:383-397):
    out channel = c*r^2 + y*r + x."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/r, w/r, c, y, x
    return x.reshape(b, h // r, w // r, c * r * r)
