"""Elastic-dimension equivalence: masked execution == reference slicing.

The torch oracle below re-implements get_active_filter semantics
(dynamic_op.py:46-71) from its spec to validate the transform chain, and the
sliced-subnet oracle validates that channel masking is numerically identical
to weight slicing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ofa_sr_tpu.models.arch import SearchSpace
from ofa_sr_tpu.models.layers import mbconv_apply, mbconv_init
from ofa_sr_tpu.ops.conv import conv2d, depthwise_conv2d
from ofa_sr_tpu.ops.elastic import (
    channel_mask,
    embed_center,
    kernel_candidates,
    select_kernel,
    transform_kernel_chain,
    transform_matrices_init,
)
from ofa_sr_tpu.ops.norm import batch_norm


def _torch_active_filter(weight_oihw, mats, ks_list, target_ks):
    """Oracle: chained center-slice + F.linear transform, per the
    get_active_filter spec (dynamic_op.py:46-71)."""
    ks_set = sorted(set(ks_list))
    max_ks = max(ks_set)
    if target_ks == max_ks:
        return weight_oihw
    start_filter = weight_oihw
    for i in range(len(ks_set) - 1, 0, -1):
        src_ks = ks_set[i]
        if src_ks <= target_ks:
            break
        tgt = ks_set[i - 1]
        center = src_ks // 2 - tgt // 2
        f = start_filter[:, :, center:center + tgt, center:center + tgt].contiguous()
        o, ic = f.shape[0], f.shape[1]
        v = f.view(o * ic, tgt * tgt)
        v = F.linear(v, mats["%dto%d" % (src_ks, tgt)])
        start_filter = v.view(o, ic, tgt, tgt)
    return start_filter


def test_transform_chain_matches_oracle():
    ks_list = [3, 5, 7]
    c = 6
    rng = np.random.RandomState(0)
    w_hwio = rng.randn(7, 7, 1, c).astype(np.float32)
    m75 = rng.randn(25, 25).astype(np.float32) * 0.1 + np.eye(25, dtype=np.float32)
    m53 = rng.randn(9, 9).astype(np.float32) * 0.1 + np.eye(9, dtype=np.float32)
    mats = {"7to5": jnp.asarray(m75), "5to3": jnp.asarray(m53)}

    wt = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1))  # [C,1,7,7]
    t_mats = {"7to5": torch.from_numpy(m75), "5to3": torch.from_numpy(m53)}

    for target in (3, 5, 7):
        got = transform_kernel_chain(jnp.asarray(w_hwio), mats, ks_list, target)
        want = _torch_active_filter(wt, t_mats, ks_list, target).numpy()
        np.testing.assert_allclose(
            np.asarray(got).transpose(3, 2, 0, 1), want, rtol=1e-5, atol=1e-5)


def test_identity_transform_equals_plain_slice():
    """Identity-initialized matrices (dynamic_op.py:40) make the transform a
    pure center slice."""
    ks_list = [3, 5, 7]
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(7, 7, 1, 4).astype(np.float32))
    mats = transform_matrices_init(ks_list)
    for target in (3, 5):
        got = transform_kernel_chain(w, mats, ks_list, target)
        want = transform_kernel_chain(w, None, ks_list, target, use_transform=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_embedded_kernel_conv_equals_sliced_conv():
    """Zero-embedded k-kernel @ SAME(max_ks//2) == sliced k-kernel @ k//2."""
    rng = np.random.RandomState(2)
    c = 4
    x = jnp.asarray(rng.randn(2, 9, 9, c).astype(np.float32))
    w7 = rng.randn(7, 7, 1, c).astype(np.float32)
    for k in (3, 5):
        lo = 7 // 2 - k // 2
        wk = jnp.asarray(w7[lo:lo + k, lo:lo + k])
        y_small = depthwise_conv2d(x, wk)
        y_embed = depthwise_conv2d(x, embed_center(wk, 7))
        np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_embed),
                                   rtol=1e-5, atol=1e-5)


def test_select_kernel_onehot_exact():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(7, 7, 1, 4).astype(np.float32))
    mats = transform_matrices_init([3, 5, 7])
    cands = kernel_candidates(w, mats, [3, 5, 7])
    for idx in range(3):
        got = select_kernel(cands, jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(cands[idx]))


def test_masked_mbconv_equals_sliced_mbconv():
    """End-to-end equivalence of the masked MBConv vs explicitly sliced
    weights (the reference execution model) — forward values."""
    space = SearchSpace(ks_list=[3, 5, 7], expand_list=[3, 4, 6],
                        depth_list=[2, 3, 4], width=16)
    key = jax.random.PRNGKey(0)
    p, s = mbconv_init(key, space)

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))

    for ks, e in [(3, 3), (5, 4), (7, 6), (3, 6), (7, 3)]:
        ks_idx = space.ks_list.index(ks)
        mid = space.mid_channels(e)

        y_masked, _ = mbconv_apply(
            p, s, x, space, jnp.asarray(ks_idx), jnp.asarray(mid), training=True)

        # ---- sliced oracle, same math with actually-sliced weights ----
        w_ib = p["inverted_bottleneck"]["conv"]["w"][:, :, :, :mid]
        h = conv2d(x, w_ib)
        bn_p = {k: v[:mid] for k, v in p["inverted_bottleneck"]["bn"].items()}
        bn_s = {k: v[:mid] for k, v in s["inverted_bottleneck"]["bn"].items()}
        h, _ = batch_norm(h, bn_p, bn_s, training=True)
        h = jnp.minimum(jnp.maximum(h, 0), 6.0)

        w_dw_full = transform_kernel_chain(
            p["depth_conv"]["conv"]["w"], p["depth_conv"]["kt"], space.ks_list, ks)
        w_dw = w_dw_full[:, :, :, :mid]
        h = depthwise_conv2d(h, w_dw)
        bn_p = {k: v[:mid] for k, v in p["depth_conv"]["bn"].items()}
        bn_s = {k: v[:mid] for k, v in s["depth_conv"]["bn"].items()}
        h, _ = batch_norm(h, bn_p, bn_s, training=True)
        h = jnp.minimum(jnp.maximum(h, 0), 6.0)

        w_pl = p["point_linear"]["conv"]["w"][:, :, :mid, :]
        h = conv2d(h, w_pl)
        h, _ = batch_norm(h, p["point_linear"]["bn"], s["point_linear"]["bn"],
                          training=True)

        np.testing.assert_allclose(np.asarray(y_masked), np.asarray(h),
                                   rtol=2e-4, atol=2e-4)


def test_masked_mbconv_gradients_zero_on_inactive():
    """Inactive weight-bank slices must receive zero gradient, matching the
    reference where they are simply absent from the graph."""
    space = SearchSpace(ks_list=[3, 5, 7], expand_list=[3, 6],
                        depth_list=[2], width=8)
    p, s = mbconv_init(jax.random.PRNGKey(1), space)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 6, 6, 8).astype(np.float32))
    mid = space.mid_channels(3)  # 24 of max 48

    def loss_fn(params):
        y, _ = mbconv_apply(params, s, x, space,
                            jnp.asarray(0), jnp.asarray(mid), training=True)
        return jnp.sum(y ** 2)

    g = jax.grad(loss_fn)(p)
    g_ib = np.asarray(g["inverted_bottleneck"]["conv"]["w"])
    assert np.abs(g_ib[..., mid:]).max() == 0.0
    assert np.abs(g_ib[..., :mid]).max() > 0.0
    g_pl = np.asarray(g["point_linear"]["conv"]["w"])
    assert np.abs(g_pl[:, :, mid:, :]).max() == 0.0
    # ks=3 selected -> the raw 7x7 bank gets grads only through the
    # transform chain; the 5to3 matrix must be exercised
    assert np.abs(np.asarray(g["depth_conv"]["kt"]["5to3"])).max() > 0.0


def test_channel_mask():
    m = np.asarray(channel_mask(jnp.asarray(3), 6))
    np.testing.assert_array_equal(m, [1, 1, 1, 0, 0, 0])
