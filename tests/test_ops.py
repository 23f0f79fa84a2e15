"""Ops vs torch-CPU oracle: conv, depthwise, BN, pixel(un)shuffle, metrics.

torch here is only the *oracle* for reference semantics (the reference is
PyTorch); the framework itself never imports torch on the compute path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ofa_sr_tpu.ops import (
    batch_norm,
    bn_init,
    conv2d,
    depthwise_conv2d,
    pixel_shuffle,
    pixel_unshuffle,
)
from ofa_sr_tpu.ops.activations import h_sigmoid, h_swish, relu6
from ofa_sr_tpu.utils import psnr_np, psnr_y_device, rgb2y_np, tensor2img_np

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_conv2d_matches_torch_same_padding():
    for k in (1, 3, 5, 7):
        x = _rand(2, 12, 12, 8, seed=k)
        w = _rand(k, k, 8, 16, seed=k + 100)
        y = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w)))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        yt = F.conv2d(xt, wt, None, 1, k // 2).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(y, yt, rtol=RTOL, atol=1e-4)


def test_depthwise_conv_matches_torch():
    for k in (3, 5, 7):
        c = 8
        x = _rand(2, 10, 10, c, seed=k)
        w = _rand(k, k, 1, c, seed=k + 50)
        y = np.asarray(depthwise_conv2d(jnp.asarray(x), jnp.asarray(w)))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # HWIO [k,k,1,C] -> torch depthwise [C,1,k,k]
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        yt = F.conv2d(xt, wt, None, 1, k // 2, 1, c).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(y, yt, rtol=RTOL, atol=1e-4)


def test_pixel_shuffle_matches_torch():
    x = _rand(2, 4, 5, 16)
    y = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = F.pixel_shuffle(xt, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(y, yt)


def test_pixel_unshuffle_matches_reference_grouped_conv():
    """The reference implements unshuffle as a grouped conv with a one-hot
    kernel (ofa/utils.py:383-397); replicate that construction in torch and
    compare orderings exactly."""
    r, c = 2, 3
    x = _rand(2, 6, 8, c)
    y = np.asarray(pixel_unshuffle(jnp.asarray(x), r))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    kernel = torch.zeros(r * r * c, 1, r, r)
    for yy in range(r):
        for xx in range(r):
            kernel[xx + yy * r::r * r, 0, yy, xx] = 1
    yt = F.conv2d(xt, kernel, stride=r, groups=c).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(y, yt)


def test_shuffle_unshuffle_roundtrip():
    x = jnp.asarray(_rand(1, 8, 8, 4))
    np.testing.assert_array_equal(
        np.asarray(pixel_shuffle(pixel_unshuffle(x, 2), 2)), np.asarray(x))


def test_batch_norm_train_matches_torch():
    c = 8
    x = _rand(4, 6, 6, c)
    p, s = bn_init(c)
    p = {"scale": jnp.asarray(_rand(c, seed=1) * 0.1 + 1.0),
         "bias": jnp.asarray(_rand(c, seed=2) * 0.1)}
    s = {"mean": jnp.asarray(_rand(c, seed=3) * 0.1),
         "var": jnp.asarray(np.abs(_rand(c, seed=4)) + 0.5)}

    y, new_s = batch_norm(jnp.asarray(x), p, s, training=True,
                          momentum=0.1, eps=1e-5)

    bn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    bn.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    bn.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    bn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
    bn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())
    bn.train()
    yt = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_eval_matches_torch():
    c = 4
    x = _rand(2, 5, 5, c)
    p = {"scale": jnp.ones(c), "bias": jnp.zeros(c)}
    s = {"mean": jnp.asarray(_rand(c, seed=5) * 0.2),
         "var": jnp.asarray(np.abs(_rand(c, seed=6)) + 0.3)}
    y, new_s = batch_norm(jnp.asarray(x), p, s, training=False, eps=1e-5)

    bn = torch.nn.BatchNorm2d(c, eps=1e-5)
    bn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
    bn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())
    bn.eval()
    yt = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)
    # eval mode must not touch running stats
    np.testing.assert_array_equal(np.asarray(new_s["mean"]), np.asarray(s["mean"]))


def test_masked_bn_matches_sliced_bn():
    """BN over masked channels == BN over sliced channels for the active
    prefix (DynamicBatchNorm2d semantics, dynamic_op.py:148-167)."""
    c, active = 8, 5
    x = _rand(4, 6, 6, c)
    x_masked = x.copy()
    x_masked[..., active:] = 0.0
    p = {"scale": jnp.asarray(_rand(c, seed=7) + 1.0),
         "bias": jnp.asarray(_rand(c, seed=8))}
    s = {"mean": jnp.zeros(c), "var": jnp.ones(c)}
    mask = jnp.asarray((np.arange(c) < active).astype(np.float32))

    y_m, s_m = batch_norm(jnp.asarray(x_masked), p, s, training=True, mask=mask)

    p_sl = {"scale": p["scale"][:active], "bias": p["bias"][:active]}
    s_sl = {"mean": s["mean"][:active], "var": s["var"][:active]}
    y_s, s_s = batch_norm(jnp.asarray(x[..., :active]), p_sl, s_sl, training=True)

    np.testing.assert_allclose(np.asarray(y_m)[..., :active], np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(y_m)[..., active:]).max() == 0.0
    np.testing.assert_allclose(np.asarray(s_m["mean"])[:active],
                               np.asarray(s_s["mean"]), rtol=1e-6, atol=1e-6)
    # inactive running stats untouched
    np.testing.assert_array_equal(np.asarray(s_m["mean"])[active:],
                                  np.zeros(c - active))


def test_activations_match_torch():
    x = _rand(4, 8)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(np.asarray(relu6(jnp.asarray(x))),
                               F.relu6(xt).numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_swish(jnp.asarray(x))),
                               (xt * F.relu6(xt + 3.0) / 6.0).numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_sigmoid(jnp.asarray(x))),
                               (F.relu6(xt + 3.0) / 6.0).numpy(), rtol=1e-6)


def test_psnr_y_device_matches_numpy_chain():
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 16, 16, 3).astype(np.float32)
    tgt = np.clip(pred + rng.randn(2, 16, 16, 3).astype(np.float32) * 0.05, 0, 1)

    dev = float(psnr_y_device(jnp.asarray(pred), jnp.asarray(tgt)))
    ref = psnr_np(rgb2y_np(tensor2img_np(pred)), rgb2y_np(tensor2img_np(tgt)))
    assert abs(dev - ref) < 1e-3, (dev, ref)
