"""Golden-value tests for the geometry helpers (SURVEY.md §4 seams)."""

import numpy as np

from ofa_sr_tpu.utils import (
    make_divisible,
    sub_filter_start_end,
    int2list,
    psnr_np,
    rgb2y_np,
    tensor2img_np,
)


def test_sub_filter_start_end():
    assert sub_filter_start_end(7, 3) == (2, 5)
    assert sub_filter_start_end(7, 5) == (1, 6)
    assert sub_filter_start_end(7, 7) == (0, 7)
    assert sub_filter_start_end(5, 3) == (1, 4)


def test_make_divisible():
    # mid-channel values the SR supernet actually uses: 64 * {3,4,6}
    assert make_divisible(round(64 * 3), 8) == 192
    assert make_divisible(round(64 * 4), 8) == 256
    assert make_divisible(round(64 * 6), 8) == 384
    # classic mobilenet cases
    assert make_divisible(16 // 4, 8) == 8
    assert make_divisible(96 // 4, 8) == 24


def test_int2list():
    assert int2list(5, 3) == [5, 5, 5]
    assert int2list([1, 2], 3) == [1, 2]
    assert int2list((1, 2)) == [1, 2]


def test_psnr_np_identical_images():
    img = np.random.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    assert psnr_np(img, img) == float("inf")


def test_psnr_np_known_value():
    a = np.zeros((4, 4), dtype=np.uint8)
    b = np.full((4, 4), 255, dtype=np.uint8)
    assert abs(psnr_np(a, b) - 0.0) < 1e-9


def test_tensor2img_rounding():
    x = np.array([[-0.1, 0.0, 0.5, 1.0, 1.3]], dtype=np.float32)
    out = tensor2img_np(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[0, 0, 128, 255, 255]])


def test_rgb2y_known():
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    y = rgb2y_np(img)
    # white -> Y = 235 in ITU-R 601 studio range
    assert (y == 235).all()
    img0 = np.zeros((2, 2, 3), dtype=np.uint8)
    assert (rgb2y_np(img0) == 16).all()


def test_torch_opt_clip_grad_norm():
    """Global-norm clipping (optim.TorchOpt clip_grad_norm): grads above the
    threshold are rescaled to exactly the threshold norm before the moment
    updates; grads below pass through untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ofa_sr_tpu.train.optim import TorchOpt

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    grads = {"w": jnp.full((4,), 3.0), "b": jnp.full((2,), 4.0)}
    gnorm = float(jnp.sqrt(4 * 9.0 + 2 * 16.0))

    opt = TorchOpt("sgd", weight_decay=0.0, momentum=0.0,
                   clip_grad_norm=1.0)
    st = opt.init(params)
    p1, _ = opt.update(params, grads, st, 1.0)
    # effective grad = grads / gnorm (clipped to norm 1)
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0 - 3.0 / gnorm,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["b"]), -4.0 / gnorm, rtol=1e-5)

    # below the threshold: no rescale
    opt2 = TorchOpt("sgd", weight_decay=0.0, momentum=0.0,
                    clip_grad_norm=100.0)
    p2, _ = opt2.update(params, grads, opt2.init(params), 1.0)
    np.testing.assert_allclose(np.asarray(p2["w"]), 1.0 - 3.0, rtol=1e-6)
