"""Core scalar helpers shared by every layer of the framework.

Semantics mirror the reference's utility layer (L0 in SURVEY.md §1):
`make_divisible`, `get_same_padding`, `sub_filter_start_end` and `int2list`
reproduce /root/reference/ofa/utils.py:212-243 and
/root/reference/ofa/imagenet_codebase/utils/__init__.py:84-99 exactly — these
define the elastic-channel and elastic-kernel geometry, so any deviation
changes which weights a subnet sees.
"""

from __future__ import annotations


def make_divisible(v, divisor, min_val=None):
    """Round `v` to the nearest multiple of `divisor`, never going below 90%.

    Reference: ofa/utils.py:225-243 (taken from the TF slim mobilenet repo).
    Used to compute elastic middle-channel counts
    `make_divisible(round(in_ch * expand_ratio), 8)`.
    """
    if min_val is None:
        min_val = divisor
    new_v = max(min_val, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def get_same_padding(kernel_size):
    """SAME padding for an odd kernel (reference: ofa/utils.py:212-220)."""
    if isinstance(kernel_size, tuple):
        assert len(kernel_size) == 2, "invalid kernel size: %s" % str(kernel_size)
        return get_same_padding(kernel_size[0]), get_same_padding(kernel_size[1])
    assert isinstance(kernel_size, int), "kernel size should be either `int` or `tuple`"
    assert kernel_size % 2 > 0, "kernel size should be odd number"
    return kernel_size // 2


def sub_filter_start_end(kernel_size, sub_kernel_size):
    """Start/end indices of the centered k×k window inside a K×K kernel.

    Reference: ofa/imagenet_codebase/utils/__init__.py:84-89.
    e.g. (7, 3) -> (2, 5).
    """
    center = kernel_size // 2
    dev = sub_kernel_size // 2
    start, end = center - dev, center + dev + 1
    assert end - start == sub_kernel_size
    return start, end


def int2list(val, repeat_time=1):
    """Broadcast a scalar (or pass through a list) — reference
    ofa/imagenet_codebase/utils/__init__.py:92-99."""
    if isinstance(val, list):
        return val
    elif isinstance(val, tuple):
        return list(val)
    else:
        return [val for _ in range(repeat_time)]


# Alias used by some call sites in the reference.
val2list = int2list


class AverageMeter:
    """Running average (reference: ofa/utils.py:53-75)."""

    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
