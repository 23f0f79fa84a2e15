"""Bit-level parity against the actual reference implementation.

Builds the reference PyTorch supernets (imported from /root/reference as a
test oracle — none of its code is copied), transfers randomly-initialized
weights through train/checkpoint.import_torch_*, and requires the masked
JAX forward to match the reference's sliced eager forward for multiple
sampled subnets — the acceptance criterion of SURVEY.md §7.3 item 1.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    # the reference imports torchvision only for unused display helpers
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: a[0]
    tv.utils = tvu
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tvu)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ofa.elastic_nn.modules.dynamic_op import DynamicSeparableConv2d
    from ofa.elastic_nn.networks.ofa_mbs4 import OFAMobileNetS4 as RefS4
    from ofa.elastic_nn.networks.ofa_mbx4 import OFAMobileNetX4 as RefX4
    DynamicSeparableConv2d.KERNEL_TRANSFORM_MODE = 1
    return RefS4, RefX4


def test_s4_param_count_matches(ref_modules):
    import jax
    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    RefS4, _ = ref_modules
    ref = RefS4(ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4], pixelshuffle_depth_list=[1, 2])
    n_ref = sum(p.numel() for p in ref.parameters())
    net = OFAMobileNetS4(SearchSpace())
    p, _ = net.init(jax.random.PRNGKey(0))
    n_ours = sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(p))
    assert n_ours == n_ref == 2160422


def test_s4_forward_parity_random_subnets(ref_modules):
    import jax
    import jax.numpy as jnp
    import torch
    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
    from ofa_sr_tpu.train.checkpoint import import_torch_s4

    RefS4, _ = ref_modules
    torch.manual_seed(0)
    ref = RefS4(ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4], pixelshuffle_depth_list=[1, 2])
    ref.eval()

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = import_torch_s4(ref.state_dict(), net)

    from ofa_sr_tpu.models.arch import reference_quirk_arch_s4
    rng = np.random.RandomState(0)
    for seed in range(4):
        cfg = sample_subnet(space, seed=seed)
        ref.set_active_subnet(ks=list(cfg.ks), e=list(cfg.e), d=list(cfg.d),
                              pixel_d=[cfg.pixel_d])
        # the reference's runtime_depth indexing quirks mean the executed
        # arch differs from the sampled one; mirror it explicitly
        eff = reference_quirk_arch_s4(cfg)
        hw = 96 // (2 ** eff.pixel_d)
        x = rng.rand(2, hw, hw, 3).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        y_ref = y_ref.numpy().transpose(0, 2, 3, 1)

        y_ours, _ = net.apply(params, state, jnp.asarray(x),
                              eff.to_device(space), pixel_d=eff.pixel_d,
                              training=False)
        np.testing.assert_allclose(np.asarray(y_ours), y_ref,
                                   rtol=1e-4, atol=1e-4)


def test_s4_train_mode_forward_parity(ref_modules):
    """Training-mode BN (batch stats) must also match — the loss the
    trainer optimizes is computed in this mode."""
    import jax.numpy as jnp
    import torch
    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.train.checkpoint import import_torch_s4

    RefS4, _ = ref_modules
    torch.manual_seed(1)
    ref = RefS4(ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4], pixelshuffle_depth_list=[1, 2])
    ref.train()

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = import_torch_s4(ref.state_dict(), net)

    from ofa_sr_tpu.models.arch import reference_quirk_arch_s4
    cfg = uniform_subnet(space, 5, 4, 3, 1)
    ref.set_active_subnet(ks=5, e=4, d=[3, 3, 3, 3], pixel_d=[1])
    eff = reference_quirk_arch_s4(cfg)
    x = np.random.RandomState(1).rand(4, 24, 24, 3).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    y_ours, _ = net.apply(params, state, jnp.asarray(x),
                          eff.to_device(space), pixel_d=eff.pixel_d,
                          training=True)
    np.testing.assert_allclose(np.asarray(y_ours),
                               y_ref.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)


def test_x4_forward_parity(ref_modules):
    import jax.numpy as jnp
    import torch
    from ofa_sr_tpu.models import OFAMobileNetX4, SearchSpace
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.train.checkpoint import import_torch_x4

    _, RefX4 = ref_modules
    torch.manual_seed(2)
    ref = RefX4(ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4], pixelshuffle_depth_list=[1, 2])
    ref.eval()

    space = SearchSpace()
    net = OFAMobileNetX4(space)
    params, state = import_torch_x4(ref.state_dict(), net)

    from ofa_sr_tpu.models.arch import reference_quirk_arch_x4
    for pd in (1, 2):
        cfg = uniform_subnet(space, 7, 6, 4, pd, n_trunks=2)
        ref.set_active_subnet(ks=7, e=6, d=[4] * 8, pixel_d=[pd])
        eff = reference_quirk_arch_x4(cfg)
        x = np.random.RandomState(pd).rand(1, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        # reference X4 forward = full autoencoder (encoder active)
        y_ours, _ = net.apply(params, state, jnp.asarray(x),
                              eff.to_device(space), pixel_d=eff.pixel_d,
                              mode="autoencoder", training=False)
        np.testing.assert_allclose(np.asarray(y_ours),
                                   y_ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def test_mbv3_forward_parity(ref_modules):
    """The upstream classification supernet must match too (no runtime_depth
    quirks there — its forward indexes groups globally, ofa_mbv3.py:140-160)."""
    import jax.numpy as jnp
    import torch
    sys.path.insert(0, REF)
    from ofa.elastic_nn.networks.ofa_mbv3 import OFAMobileNetV3 as RefV3

    from ofa_sr_tpu.models.ofa_cls import ClsArch, OFAMobileNetV3
    from ofa_sr_tpu.train.checkpoint import import_torch_mbv3

    torch.manual_seed(3)
    ref = RefV3(n_classes=10, ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4])
    ref.eval()

    net = OFAMobileNetV3(n_classes=10)
    params, state = import_torch_mbv3(ref.state_dict(), net)

    rng = np.random.RandomState(0)
    for seed in range(3):
        a = net.sample_arch(seed=seed)
        ref.set_active_subnet(ks=list(a.ks), e=list(a.e), d=list(a.d))
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        y_ours, _ = net.apply(params, state, jnp.asarray(x),
                              net.arch_to_device(a), training=False)
        np.testing.assert_allclose(np.asarray(y_ours), y_ref,
                                   rtol=2e-4, atol=2e-4)


def test_proxyless_forward_parity(ref_modules):
    import jax.numpy as jnp
    import torch
    sys.path.insert(0, REF)
    from ofa.elastic_nn.networks.ofa_proxyless import (
        OFAProxylessNASNets as RefPx,
    )

    from ofa_sr_tpu.models.ofa_cls import OFAProxylessNASNets
    from ofa_sr_tpu.train.checkpoint import import_torch_mbv3

    torch.manual_seed(4)
    ref = RefPx(n_classes=10, ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4])
    ref.eval()
    net = OFAProxylessNASNets(n_classes=10)
    params, state = import_torch_mbv3(ref.state_dict(), net)

    rng = np.random.RandomState(0)
    for seed in range(2):
        a = net.sample_arch(seed=seed)
        ref.set_active_subnet(ks=list(a.ks), e=list(a.e), d=list(a.d))
        x = rng.rand(1, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        y_ours, _ = net.apply(params, state, jnp.asarray(x),
                              net.arch_to_device(a), training=False)
        np.testing.assert_allclose(np.asarray(y_ours), y_ref,
                                   rtol=2e-4, atol=2e-4)


def test_x4_mixed_per_block_parity(ref_modules):
    """Sampled (non-uniform) per-block ks/e on X4: verifies the enc-then-dec
    block ordering of the arch arrays against the reference's
    blocks[2:-2] zip (ofa_mbx4.py:368-372)."""
    import jax.numpy as jnp
    import torch
    from ofa_sr_tpu.models import OFAMobileNetX4, SearchSpace, sample_subnet
    from ofa_sr_tpu.models.arch import reference_quirk_arch_x4
    from ofa_sr_tpu.train.checkpoint import import_torch_x4

    _, RefX4 = ref_modules
    torch.manual_seed(5)
    ref = RefX4(ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                depth_list=[2, 3, 4], pixelshuffle_depth_list=[1, 2])
    ref.eval()
    space = SearchSpace()
    net = OFAMobileNetX4(space)
    params, state = import_torch_x4(ref.state_dict(), net)

    rng = np.random.RandomState(7)
    for seed in (11, 12):
        cfg = sample_subnet(space, seed=seed, n_trunks=2)
        ref.set_active_subnet(ks=list(cfg.ks), e=list(cfg.e), d=list(cfg.d),
                              pixel_d=[cfg.pixel_d])
        eff = reference_quirk_arch_x4(cfg)
        x = rng.rand(1, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        y_ours, _ = net.apply(params, state, jnp.asarray(x),
                              eff.to_device(space), pixel_d=eff.pixel_d,
                              mode="autoencoder", training=False)
        np.testing.assert_allclose(np.asarray(y_ours),
                                   y_ref.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def test_mbv3_elastic_width_parity(ref_modules):
    """Runtime elastic width (width_mult_list=[0.65, 1.0]): wid=None must
    match the reference net as built (it always runs at max width —
    sample_active_subnet sets wid=None, ofa_mbv3.py:257-258); wid=0 must
    match the reference with every layer's active width set the way the
    upstream OFA applies a width choice (active_out_channel attributes on
    DynamicConvLayer/DynamicMBConvLayer, dynamic_layers.py:69-80,224-227)."""
    import jax.numpy as jnp
    import torch
    sys.path.insert(0, REF)
    from ofa.elastic_nn.networks.ofa_mbv3 import OFAMobileNetV3 as RefV3

    from ofa_sr_tpu.models.ofa_cls import ClsArch, OFAMobileNetV3
    from ofa_sr_tpu.train.checkpoint import import_torch_mbv3

    torch.manual_seed(6)
    wml = [0.65, 1.0]
    ref = RefV3(n_classes=10, width_mult_list=wml, ks_list=[3, 5, 7],
                expand_ratio_list=[3, 4, 6], depth_list=[2, 3, 4])
    # train-mode BN: at random init the eval-mode trunk collapses to ~1e-9
    # (bias-dominated logits), which would make this test vacuous
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    net = OFAMobileNetV3(n_classes=10, width_mult_list=wml)
    params, state = import_torch_mbv3(ref.state_dict(), net)

    rng = np.random.RandomState(3)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    a = net.sample_arch(seed=9)
    ref.set_active_subnet(ks=list(a.ks), e=list(a.e), d=list(a.d))

    # wid=None -> max width: reference as-is
    with torch.no_grad():
        y_ref = ref(xt).numpy()
    y_ours, _ = net.apply(params, state, jnp.asarray(x),
                          net.arch_to_device(a), training=True)
    np.testing.assert_allclose(np.asarray(y_ours), y_ref,
                               rtol=2e-4, atol=2e-4)

    # wid=0: set active widths on the reference modules (upstream semantics)
    wid = 0
    ins, outs = net.active_block_channels(wid)
    for blk, out_ch in zip(ref.blocks[1:], outs):
        blk.mobile_inverted_conv.active_out_channel = out_ch
    # first conv / first block are static here (width lists collapse to 16)
    assert not net._elastic_first and not net._elastic_fb
    with torch.no_grad():
        y_ref0 = ref(xt).numpy()
    a0 = ClsArch(a.ks, a.e, a.d, wid=wid)
    y_ours0, _ = net.apply(params, state, jnp.asarray(x),
                           net.arch_to_device(a0), training=True)
    np.testing.assert_allclose(np.asarray(y_ours0), y_ref0,
                               rtol=2e-4, atol=2e-4)
    assert np.abs(y_ref0 - y_ref).max() > 1e-5  # width actually matters


def test_proxyless_elastic_width_parity(ref_modules):
    """Proxyless with width_mult_list: the first conv IS elastic there
    (widths [24, 32]); verifies the first-conv/first-block masks too."""
    import jax.numpy as jnp
    import torch
    sys.path.insert(0, REF)
    from ofa.elastic_nn.networks.ofa_proxyless import (
        OFAProxylessNASNets as RefPx,
    )

    from ofa_sr_tpu.models.ofa_cls import ClsArch, OFAProxylessNASNets
    from ofa_sr_tpu.train.checkpoint import import_torch_mbv3

    torch.manual_seed(7)
    wml = [0.65, 1.0]
    ref = RefPx(n_classes=10, width_mult_list=wml, ks_list=[3, 5, 7],
                expand_ratio_list=[3, 4, 6], depth_list=[2, 3, 4])
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    net = OFAProxylessNASNets(n_classes=10, width_mult_list=wml)
    params, state = import_torch_mbv3(ref.state_dict(), net)

    rng = np.random.RandomState(5)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    a = net.sample_arch(seed=4)
    ref.set_active_subnet(ks=list(a.ks), e=list(a.e), d=list(a.d))
    with torch.no_grad():
        y_ref = ref(xt).numpy()
    y_ours, _ = net.apply(params, state, jnp.asarray(x),
                          net.arch_to_device(a), training=True)
    np.testing.assert_allclose(np.asarray(y_ours), y_ref,
                               rtol=2e-4, atol=2e-4)

    wid = 0
    ins, outs = net.active_block_channels(wid)
    assert net._elastic_first
    ref.first_conv.active_out_channel = net.first_conv_widths[wid]
    ref.blocks[0].mobile_inverted_conv.active_out_channel = \
        net.first_block_outs[wid]
    for blk, out_ch in zip(ref.blocks[1:], outs):
        blk.mobile_inverted_conv.active_out_channel = out_ch
    with torch.no_grad():
        y_ref0 = ref(xt).numpy()
    a0 = ClsArch(a.ks, a.e, a.d, wid=wid)
    y_ours0, _ = net.apply(params, state, jnp.asarray(x),
                           net.arch_to_device(a0), training=True)
    np.testing.assert_allclose(np.asarray(y_ours0), y_ref0,
                               rtol=2e-4, atol=2e-4)
    assert np.abs(y_ref0 - y_ref).max() > 1e-5
