"""Host-side (PIL) image transforms with the reference's exact semantics.

The reference composes torchvision transforms (div2k_setxx.py:166-171:
RandomCrop(96) + RandomHorizontalFlip + RandomRotation(-90..90)) and its own
ModCrop / Scale-bicubic (div2k_setxx.py:318-380). The PSNR targets were
measured against PIL-bicubic-downscaled inputs, so the host path keeps PIL
for bit-parity; the on-device path (data/bicubic.py) replicates the filter in
XLA for streaming augmentation.

Unlike the reference (torchvision's hidden global RNG), every random
transform takes an explicit `rng: random.Random` — deterministic and
host-count invariant (SURVEY.md §5.2 race-surface note).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np
from PIL import Image


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img, rng: Optional[random.Random] = None):
        for t in self.transforms:
            img = t(img, rng) if _wants_rng(t) else t(img)
        return img


def _wants_rng(t):
    return isinstance(t, (RandomCrop, RandomHorizontalFlip, RandomRotation,
                          NineRandomCrop))  # EntropyCrop is a NineRandomCrop


class RandomCrop:
    """Random image_size x image_size crop (torchvision semantics: uniform
    top-left over valid positions)."""

    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, img: Image.Image, rng: random.Random):
        w, h = img.size
        tw = th = self.size
        if w == tw and h == th:
            return img
        i = rng.randint(0, h - th)
        j = rng.randint(0, w - tw)
        return img.crop((j, i, j + tw, i + th))


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img: Image.Image, rng: random.Random):
        if rng.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class RandomRotation:
    """Rotate by an angle uniform in [-degrees, degrees] (torchvision
    RandomRotation default: nearest resample, no expand)."""

    def __init__(self, degrees: float = 90.0):
        self.degrees = float(degrees)

    def __call__(self, img: Image.Image, rng: random.Random):
        angle = rng.uniform(-self.degrees, self.degrees)
        return img.rotate(angle, resample=Image.NEAREST, expand=False)


class CenterCrop:
    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, img: Image.Image):
        w, h = img.size
        tw = th = self.size
        j = int(round((w - tw) / 2.0))
        i = int(round((h - th) / 2.0))
        return img.crop((j, i, j + tw, i + th))


class ModCrop:
    """Crop H, W down to a multiple of `mod` from the top-left (reference
    ModCrop, div2k_setxx.py:318-349) — keeps SR shapes divisible by 4."""

    def __init__(self, mod: int = 4):
        self.mod = int(mod)

    def __call__(self, img: Image.Image):
        w, h = img.size
        return img.crop((0, 0, w - w % self.mod, h - h % self.mod))


class NineRandomCrop:
    """One size x size crop at a randomly chosen one of nine anchors —
    4 corners, 4 edge midpoints, center (reference oracle_video.py:354-408;
    unused by live configs, kept for parity).

    The reference's selector is `random.randint(1, 3)` so only the top row
    of the 3x3 anchor grid is ever chosen — an evident typo against its own
    "4 Corner, 4 SideLine, 1 Center" docstring. `full_grid=False` reproduces
    that behavior exactly; the default samples all nine anchors.
    """

    def __init__(self, size: int, full_grid: bool = True):
        self.size = int(size)
        self.full_grid = full_grid

    def __call__(self, img: Image.Image, rng: random.Random):
        w, h = img.size
        size = self.size
        rows = (0, int((h - size) / 2), h - size)
        cols = (0, int((w - size) / 2), w - size)
        select = rng.randint(1, 9 if self.full_grid else 3)
        i = rows[(select - 1) // 3]
        j = cols[(select - 1) % 3]
        return img.crop((j, i, j + size, i + size))


class EntropyCrop(NineRandomCrop):
    """Alias of NineRandomCrop: the reference's EntropyCrop
    (oracle_video.py:407-458) is a verbatim copy of NineRandomCrop with no
    entropy logic — kept under its reference name for API parity."""


class Scale:
    """Scale by a float factor with PIL BICUBIC (reference Scale,
    div2k_setxx.py:355-375: size = (int(w*f), int(h*f)))."""

    def __init__(self, scale_factor: float, interpolation=Image.BICUBIC):
        self.scale_factor = scale_factor
        self.interpolation = interpolation

    def __call__(self, img: Image.Image):
        w, h = img.size
        tw, th = int(w * self.scale_factor), int(h * self.scale_factor)
        return img.resize((tw, th), self.interpolation)


def bicubic_downscale_pil(img: Image.Image, factor: int) -> Image.Image:
    """The reference get_transform_L (div2k_setxx.py:376-380)."""
    assert factor in (2, 4, 8)
    return Scale(1.0 / factor)(img)


def to_numpy(img: Image.Image) -> np.ndarray:
    """HWC float32 in [0,1] (torchvision ToTensor semantics, NHWC here)."""
    return np.asarray(img, dtype=np.float32) / 255.0
