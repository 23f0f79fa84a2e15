"""On-device bicubic resize replicating PIL's resampling filter.

The reference downscales every training sample with PIL bicubic in the
DataLoader workers (div2k_setxx.py:291-295) — a host-side hot spot
(SURVEY.md §3.5 item 5). Here the same separable, antialiased Keys filter
(a = -0.5, support 2, kernel widened by the scale factor on downscale, PIL's
exact tap-window arithmetic including edge renormalization) is precomputed as
two small dense matrices and applied on device as two matmuls per image:
Y = Wh @ X @ Ww^T, batched over N and C. XLA maps these straight onto the
MXU; a 96->48 downscale is a pair of (48x96)x(96x96) GEMMs.

Float-precision caveat: PIL internally quantizes coefficients and clips to
uint8 when resizing 8-bit images, so device results can differ from the host
path by ~1/255 per pixel. tests/test_data.py measures the gap; the host PIL
path (data/transforms.py) remains the bit-parity reference for evaluation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bicubic_filter(x, a=-0.5):
    """Keys cubic kernel, support 2 (PIL's 'bicubic')."""
    x = np.abs(x)
    out = np.where(
        x < 1, ((a + 2) * x - (a + 3)) * x * x + 1,
        np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0))
    return out


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """PIL-style resampling weight matrix [out_size, in_size]: per output
    pixel, taps over int(center±support+0.5) with weights renormalized over
    the clipped window (ImagingResampleHorizontal's arithmetic)."""
    support = 2.0
    scale = in_size / out_size
    filterscale = max(scale, 1.0)  # antialias on downscale
    sup = support * filterscale
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(0, int(center - sup + 0.5))
        xmax = min(in_size, int(center + sup + 0.5))
        taps = np.arange(xmin, xmax)
        w = _bicubic_filter((taps + 0.5 - center) / filterscale)
        W[xx, xmin:xmax] = w / w.sum()
    return W.astype(np.float32)


def resize_bicubic(x, out_h: int, out_w: int):
    """Resize NHWC (or HWC) on device. Matches PIL Image.resize(...,BICUBIC)
    up to PIL's internal uint8 quantization."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    wh = jnp.asarray(resize_matrix(h, out_h))
    ww = jnp.asarray(resize_matrix(w, out_w))
    # [N,H,W,C]: contract H then W
    y = jnp.einsum("oh,nhwc->nowc", wh, x)
    y = jnp.einsum("ow,nhwc->nhoc", ww, y)
    return y[0] if squeeze else y


def downscale(x, factor: int):
    """The reference get_transform_L on device: out = int(size/factor)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bicubic(x, h // factor, w // factor)
