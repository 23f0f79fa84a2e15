from .activations import ACT_FNS, apply_act
from .conv import conv2d, depthwise_conv2d, conv_init, depthwise_conv_init
from .norm import batch_norm, bn_init
from .pixelshuffle import pixel_shuffle, pixel_unshuffle
from .elastic import (
    channel_mask,
    kernel_candidates,
    select_kernel,
    transform_kernel_chain,
)

__all__ = [
    "ACT_FNS",
    "apply_act",
    "conv2d",
    "depthwise_conv2d",
    "conv_init",
    "depthwise_conv_init",
    "batch_norm",
    "bn_init",
    "pixel_shuffle",
    "pixel_unshuffle",
    "channel_mask",
    "kernel_candidates",
    "select_kernel",
    "transform_kernel_chain",
]
