"""Media tools: yuv decode, split, crop/resize batch jobs, scene cuts."""

import os

import numpy as np
from PIL import Image

from ofa_sr_tpu.tools.media import (
    color_histogram_difference,
    crop_and_save,
    resize_and_save,
    split_frames,
    yuv_to_png,
)


def _frames(tmp_path, n=10, size=(32, 24), cut_at=5):
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.RandomState(0)
    base_a = (rng.rand(size[1], size[0], 3) * 255).astype(np.uint8)
    base_b = 255 - base_a
    for i in range(n):
        base = base_a if i < cut_at else base_b
        noise = rng.randint(-3, 4, base.shape)
        arr = np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(d / ("%04d.png" % i))
    return str(d)


def test_yuv_to_png_numpy_decoder(tmp_path):
    w, h, n = 16, 8, 3
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 256, n * w * h * 3 // 2, dtype=np.uint8)
    yuv = tmp_path / "clip.yuv"
    yuv.write_bytes(raw.tobytes())
    out = tmp_path / "out"
    count = yuv_to_png(str(yuv), str(out), width=w, height=h)
    assert count == 3
    img = Image.open(out / "0000.png")
    assert img.size == (w, h)


def test_split_frames(tmp_path):
    d = _frames(tmp_path, n=10)
    counts = split_frames(d, str(tmp_path / "split"), train=0.8, test=0.1,
                          bucket_size=1)
    assert counts["train"] == 8 and counts["test"] == 1 and counts["val"] == 1


def test_crop_and_resize(tmp_path):
    d = _frames(tmp_path, n=2, size=(64, 48))
    n = crop_and_save(d, str(tmp_path / "crop"), size=32)
    assert n == 2
    assert Image.open(tmp_path / "crop" / "0000.png").size == (32, 32)
    n = resize_and_save(d, str(tmp_path / "rs"), factor=4)
    assert n == 2
    assert Image.open(tmp_path / "rs" / "0000.png").size == (16, 12)


def test_scene_cut_detection(tmp_path):
    d = _frames(tmp_path, n=10, cut_at=5)
    diffs = color_histogram_difference(d)
    assert len(diffs) == 9
    # the cut (frame 4 -> 5) must dominate
    assert np.argmax(diffs) == 4
