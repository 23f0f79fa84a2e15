"""Datasets: map an index to a sample dict of HWC float32 [0,1] arrays.

Reference: Div2K_SetXXDataset (div2k_setxx.py:280-298) yields
{'image', '2x_down_image', '4x_down_image'} (HR + PIL-bicubic 2x/4x LR);
Codec_DecoderDataset (codec_decoder.py:282-307) yields precomputed
{'image' (HR label), 'down_image' (codec-decoded LR)} pairs. Keys here are
'image'/'x2'/'x4' ('lr' for paired mode) — the trainer's batch contract.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np
from PIL import Image

from .transforms import bicubic_downscale_pil, to_numpy

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".tif", ".tiff")


def is_image_file(fname: str) -> bool:
    return fname.lower().endswith(IMG_EXTENSIONS)


def list_images(root: str, numeric_sort: bool = False) -> List[str]:
    """Recursive image listing (reference get_image_paths_recursive,
    div2k_setxx.py:252-262); numeric_sort reproduces the oracle-video
    frame ordering (frames sorted by int filename, oracle_video.py:285)."""
    paths = []
    for r, _, fnames in sorted(os.walk(root)):
        for fname in sorted(fnames):
            if is_image_file(fname):
                paths.append(os.path.join(r, fname))
    if numeric_sort:
        def key(p):
            stem = os.path.splitext(os.path.basename(p))[0]
            try:
                return (0, int(stem))
            except ValueError:
                return (1, stem)
        paths.sort(key=key)
    if not paths:
        raise FileNotFoundError("%s has no valid image file" % root)
    return paths


class SRImageDataset:
    """HR images on disk; LR produced by PIL bicubic at access time.

    `transform(img, rng)` is applied to the HR image first (crop/flip/rot),
    then 2x and 4x bicubic downscales are derived from the transformed HR —
    exactly the reference order (div2k_setxx.py:288-298).
    """

    def __init__(self, root: str, transform=None, numeric_sort: bool = False,
                 factors=(2, 4)):
        self.root = root
        self.transform = transform
        self.paths = list_images(root, numeric_sort)
        self.factors = tuple(factors)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index, rng: Optional[random.Random] = None):
        img = Image.open(self.paths[index]).convert("RGB")
        if self.transform is not None:
            img = self.transform(img, rng)
        out = {"image": to_numpy(img)}
        for f in self.factors:
            out["x%d" % f] = to_numpy(bicubic_downscale_pil(img, f))
        return out


class PairedImageDataset:
    """Precomputed (LR, HR) pairs: `<root>/image/*.png` is the degraded LR
    frame, `<root>/label/*.png` the pristine HR (reference Codec_Decoder
    layout, codec_decoder.py:282-307). The reference's 'down_image' key
    mismatch (SURVEY.md §2.4) is resolved here: the LR is exposed as both
    'lr' and, when its size matches HR/2 or HR/4, as the matching 'x2'/'x4'
    key so the shared trainer consumes it directly."""

    def __init__(self, root: str, transform=None, numeric_sort: bool = True):
        self.lr_paths = list_images(os.path.join(root, "image"), numeric_sort)
        self.hr_paths = list_images(os.path.join(root, "label"), numeric_sort)
        assert len(self.lr_paths) == len(self.hr_paths), (
            len(self.lr_paths), len(self.hr_paths))
        self.transform = transform

    def __len__(self):
        return len(self.lr_paths)

    def __getitem__(self, index, rng: Optional[random.Random] = None):
        lr = Image.open(self.lr_paths[index]).convert("RGB")
        hr = Image.open(self.hr_paths[index]).convert("RGB")
        if self.transform is not None:
            hr = self.transform(hr, rng)
        hr_np, lr_np = to_numpy(hr), to_numpy(lr)
        out = {"image": hr_np, "lr": lr_np}
        for f in (2, 4):
            if (lr_np.shape[0] * f, lr_np.shape[1] * f) == hr_np.shape[:2]:
                out["x%d" % f] = lr_np
        return out


class SyntheticSRDataset:
    """Deterministic random-image dataset for tests/benchmarks (the reference
    has no synthetic path; SURVEY.md §4 calls for one)."""

    def __init__(self, n: int = 64, hr_size: int = 96, seed: int = 0,
                 factors=(2, 4)):
        self.n = n
        self.hr_size = hr_size
        self.seed = seed
        self.factors = tuple(factors)

    def __len__(self):
        return self.n

    def __getitem__(self, index, rng: Optional[random.Random] = None):
        r = np.random.RandomState(self.seed * 100003 + index)
        hs = self.hr_size
        out = {"image": r.rand(hs, hs, 3).astype(np.float32)}
        for f in self.factors:
            out["x%d" % f] = r.rand(hs // f, hs // f, 3).astype(np.float32)
        return out
