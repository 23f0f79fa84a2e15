"""Native C++ loader vs PIL: decode parity, bicubic parity, batch loader."""

import numpy as np
import pytest
from PIL import Image

from ofa_sr_tpu.data.native import (
    NativeSRLoader,
    decode_image,
    native_available,
    resize_bicubic,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader not built")


def _png(tmp_path, name="a.png", size=(64, 48), seed=0):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(size[1], size[0], 3) * 255).astype(np.uint8)
    p = tmp_path / name
    Image.fromarray(arr).save(p)
    return str(p), arr


def test_png_decode_bit_exact(tmp_path):
    path, arr = _png(tmp_path)
    out = decode_image(path)
    np.testing.assert_array_equal((out * 255).round().astype(np.uint8), arr)


def test_png_decode_palette_and_gray(tmp_path):
    arr = (np.random.RandomState(1).rand(16, 16) * 255).astype(np.uint8)
    pg = tmp_path / "g.png"
    Image.fromarray(arr, mode="L").save(pg)
    out = decode_image(str(pg))
    np.testing.assert_array_equal((out[..., 0] * 255).round().astype(np.uint8), arr)
    # palette
    pp = tmp_path / "p.png"
    Image.fromarray(np.stack([arr] * 3, -1)).convert("P").save(pp)
    out = decode_image(str(pp))
    assert out.shape == (16, 16, 3)


def test_native_bicubic_matches_python_filter(tmp_path):
    """The C++ resize must match the float-exact Python/XLA filter
    (data/bicubic.py), which itself matches PIL F-mode."""
    import jax.numpy as jnp
    from ofa_sr_tpu.data.bicubic import resize_bicubic as jax_resize
    rng = np.random.RandomState(2)
    src = rng.rand(48, 64, 3).astype(np.float32)
    nat = resize_bicubic(src, 24, 32)
    dev = np.asarray(jax_resize(jnp.asarray(src), 24, 32))
    np.testing.assert_allclose(nat, dev, rtol=1e-5, atol=1e-6)


def test_native_loader_batches(tmp_path):
    for i in range(8):
        _png(tmp_path, "img%d.png" % i, size=(70, 60), seed=i)
    paths = sorted(str(p) for p in tmp_path.glob("*.png"))
    ld = NativeSRLoader(paths, crop=32, batch_size=4, augment=True,
                        n_threads=2)
    batches = list(ld)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["x2"].shape == (4, 16, 16, 3)
    assert b["x4"].shape == (4, 8, 8, 3)
    assert b["image"].min() >= 0 and b["image"].max() <= 1

    # determinism within an epoch
    again = list(ld)
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])
    # epochs shuffle/augment differently
    ld.set_epoch(1)
    other = list(ld)
    assert not np.array_equal(batches[0]["image"], other[0]["image"])


def test_jpeg_decode_matches_pil(tmp_path):
    """Native libjpeg decode == PIL's decode (same settings, both libjpeg):
    RGB + grayscale sources; corrupt data fails cleanly instead of exiting
    the process (libjpeg's default error handler calls exit())."""
    rng = np.random.RandomState(0)
    base = (np.cumsum(np.cumsum(rng.rand(41, 53, 3), 0), 1) * 3 % 255
            ).astype(np.uint8)
    p = tmp_path / "a.jpg"
    Image.fromarray(base).save(p, quality=92)
    ours = (decode_image(str(p)) * 255).round().astype(np.uint8)
    pil = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(ours, pil)

    g = tmp_path / "g.jpg"
    Image.fromarray(base[:, :, 0], mode="L").save(g, quality=92)
    np.testing.assert_array_equal(
        (decode_image(str(g)) * 255).round().astype(np.uint8),
        np.asarray(Image.open(g).convert("RGB")))

    c = tmp_path / "c.jpg"
    c.write_bytes(b"\xff\xd8\xff" + b"junk" * 10)
    with pytest.raises(IOError):
        decode_image(str(c))


def test_native_cls_dataset_matches_pil(tmp_path):
    """ImageFolderDataset(use_native=True): identical crop/flip geometry
    (shared rng sampling) and close pixels — the backends differ only in
    resample precision (PIL uint8 fixed point vs native float32)."""
    import random

    from ofa_sr_tpu.data.cls_providers import ImageFolderDataset

    rng0 = np.random.RandomState(0)
    for c in ("a", "b"):
        d = tmp_path / c
        d.mkdir()
        for k in range(2):
            arr = (np.cumsum(rng0.rand(48, 56, 3), 1) * 9 % 255).astype(np.uint8)
            Image.fromarray(arr).save(d / ("%d.jpg" % k), quality=95)

    for train in (True, False):
        pil_ds = ImageFolderDataset(str(tmp_path), image_size=24, train=train)
        nat_ds = ImageFolderDataset(str(tmp_path), image_size=24, train=train,
                                    use_native=True)
        assert nat_ds.use_native
        for idx in range(4):
            a = pil_ds.__getitem__(idx, rng=random.Random(idx))
            b = nat_ds.__getitem__(idx, rng=random.Random(idx))
            assert a["label"] == b["label"]
            assert a["image"].shape == b["image"].shape == (24, 24, 3)
            # same geometry, backend resample gap only (normalized units)
            assert np.abs(a["image"] - b["image"]).mean() < 0.05, (train, idx)


def test_native_loader_jpeg_inputs(tmp_path):
    """The threaded C++ prefetch loader decodes JPEG HR trees (the ImageNet
    format) through the same load_image chain as PNG."""
    rng = np.random.RandomState(7)
    for i in range(4):
        arr = (np.cumsum(rng.rand(60, 70, 3), 1) * 7 % 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / ("v%d.jpg" % i), quality=95)
    paths = sorted(str(p) for p in tmp_path.glob("*.jpg"))
    ld = NativeSRLoader(paths, crop=32, batch_size=2, augment=True,
                        n_threads=2)
    batches = list(ld)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["x2"].shape == (2, 16, 16, 3)
    assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
    assert b["image"].std() > 0.01  # decoded real content, not zeros
