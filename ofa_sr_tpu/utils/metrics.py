"""Image-quality metrics with the reference's exact uint8/Y-channel semantics.

The reference computes PSNR on the Y channel of uint8-rounded images
(sr_run_manager.py:364,496; helpers at sr_run_manager.py:567-597; psnr at
ofa/utils.py:27-34). That pipeline forces a device->host round-trip per
training step. Here the whole chain — clamp to [0,1], x255, round, ITU-R 601
Y conversion with a second round, MSE, 20*log10(255/sqrt(mse)) — runs as jnp
ops on device (SURVEY.md §3.5 item 4), returning one scalar.

`psnr_np`/`rgb2y_np`/`tensor2img_np` are bit-exact numpy twins used by tests
and by the evaluation path when comparing against reference outputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ITU-R 601 RGB->Y weights (reference: sr_run_manager.py:592-597).
_Y_WEIGHTS = (65.481, 128.553, 24.966)


# ---------------------------------------------------------------------------
# On-device (jnp) versions — used inside jitted train/eval steps.
# ---------------------------------------------------------------------------

def quantize_img(x):
    """clamp [0,1] -> x255 -> round, kept in float (reference
    tensor2img_np, sr_run_manager.py:567-584, minus the uint8 cast)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0)


def rgb2y_device(img255, channel_axis=-1):
    """uint8-valued float RGB (0..255) -> rounded Y channel (reference
    rgb2y, sr_run_manager.py:592-597)."""
    w = jnp.asarray(_Y_WEIGHTS, dtype=img255.dtype)
    y = jnp.tensordot(img255, w, axes=[[channel_axis], [0]]) / 255.0 + 16.0
    return jnp.round(y)


def psnr_y_device(pred, target, channel_axis=-1, valid_mask=None):
    """PSNR on the Y channel of uint8-rounded [0,1] images, fully on device.

    Matches psnr(rgb2y(tensor2img_np(pred)), rgb2y(tensor2img_np(target)))
    from the reference hot loop (progressive_shrinking.py:196) up to float64
    vs float32 accumulation.

    `valid_mask`: optional (1, H, W, 1) 0/1 mask for shape-bucketed eval —
    the MSE averages only over valid pixels.
    """
    y1 = rgb2y_device(quantize_img(pred), channel_axis)
    y2 = rgb2y_device(quantize_img(target), channel_axis)
    if valid_mask is not None:
        m = valid_mask[..., 0]  # (1, H, W) to match the Y maps
        sq = jnp.square(y1 - y2) * m
        mse = jnp.sum(sq) / (jnp.sum(m) * y1.shape[0])
    else:
        mse = jnp.mean(jnp.square(y1 - y2))
    # Reference returns inf on mse == 0; keep that behaviour without a branch.
    return jnp.where(
        mse == 0,
        jnp.inf,
        20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-12))),
    )


def psnr_rgb_device(pred, target):
    """PSNR on uint8-rounded RGB images (no Y conversion)."""
    i1 = quantize_img(pred)
    i2 = quantize_img(target)
    mse = jnp.mean(jnp.square(i1 - i2))
    return jnp.where(
        mse == 0,
        jnp.inf,
        20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-12))),
    )


# ---------------------------------------------------------------------------
# Host (numpy) twins — bit-exact with the reference, for tests/eval.
# ---------------------------------------------------------------------------

def psnr_np(img1, img2):
    """Reference psnr (ofa/utils.py:27-34): uint8 in, float64 math."""
    assert img1.dtype == img2.dtype == np.uint8
    a = img1.astype(np.float64)
    b = img2.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0 / np.sqrt(mse))


def tensor2img_np(arr, out_type=np.uint8, min_max=(0, 1)):
    """Reference tensor2img_np (sr_run_manager.py:567-584) for HWC numpy
    arrays (or NHWC; the batch dim is kept rather than grid-tiled)."""
    a = np.asarray(arr, dtype=np.float32)
    a = np.clip(a, *min_max)
    a = (a - min_max[0]) / (min_max[1] - min_max[0])
    if out_type == np.uint8:
        a = (a * 255.0).round()
    return a.astype(out_type)


def rgb2y_np(img):
    """Reference rgb2y (sr_run_manager.py:592-597)."""
    assert img.dtype == np.uint8
    y = (np.dot(img[..., :3], list(_Y_WEIGHTS)) / 255.0 + 16.0).round()
    return y.astype(np.uint8)


def rgb2gray_np(img):
    """Reference rgb2gray (sr_run_manager.py:586-590)."""
    in_type = img.dtype
    gray = np.dot(img[..., :3], [0.299, 0.587, 0.114]).round()
    return gray.astype(in_type)
