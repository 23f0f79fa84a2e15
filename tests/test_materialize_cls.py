"""Materialized classification subnet == masked supernet (eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models.materialize_cls import get_active_cls_subnet
from ofa_sr_tpu.models.ofa_cls import ElasticClassifierNet, StageSpec


def _tiny_net():
    net = ElasticClassifierNet(
        n_classes=10,
        stage_specs=[StageSpec(16, 2, "relu", False, 2),
                     StageSpec(24, 2, "h_swish", True, 2)],
        first_conv_width=8, first_conv_act="h_swish", first_block_act="relu",
        final_expand_width=64, feature_mix_width=96,
        ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2])
    net._first_block_out = net.first_conv_width
    return net


def test_cls_materialized_matches_masked():
    net = _tiny_net()
    p, s = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    for seed in range(4):
        arch = net.sample_arch(seed=seed)
        y_super, _ = net.apply(p, s, x, net.arch_to_device(arch),
                               training=False)
        for fold in (True, False):
            sub = get_active_cls_subnet(net, p, s, arch, fold_bn=fold)
            y_sub = jax.jit(sub)(x)
            np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_super),
                                       rtol=3e-4, atol=3e-5)


def test_cls_materialized_proxyless_head():
    net = ElasticClassifierNet(
        n_classes=5,
        stage_specs=[StageSpec(16, 2, "relu6", False, 2)],
        first_conv_width=8, first_conv_act="relu6", first_block_act="relu6",
        final_expand_width=None, feature_mix_width=32, head_act="relu6",
        ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2])
    net._first_block_out = 8
    p, s = net.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32))
    arch = net.sample_arch(seed=3)
    y_super, _ = net.apply(p, s, x, net.arch_to_device(arch), training=False)
    sub = get_active_cls_subnet(net, p, s, arch)
    np.testing.assert_allclose(np.asarray(sub(x)), np.asarray(y_super),
                               rtol=3e-4, atol=3e-5)


def test_cls_materialized_elastic_width():
    """wid slicing: the materialized subnet at each width index matches the
    masked supernet forward (both MBV3- and proxyless-style nets)."""
    from ofa_sr_tpu.models.ofa_cls import (
        ClsArch,
        OFAMobileNetV3,
        OFAProxylessNASNets,
    )
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32))
    for make in (OFAMobileNetV3, OFAProxylessNASNets):
        net = make(n_classes=7, width_mult_list=[0.65, 1.0])
        p, s = net.init(jax.random.PRNGKey(2))
        base = net.sample_arch(seed=5)
        for wid in (0, 1, None):
            arch = ClsArch(base.ks, base.e, base.d, wid)
            y_super, _ = net.apply(p, s, x, net.arch_to_device(arch),
                                   training=False)
            sub = get_active_cls_subnet(net, p, s, arch, fold_bn=False)
            np.testing.assert_allclose(np.asarray(sub(x)),
                                       np.asarray(y_super),
                                       rtol=3e-4, atol=3e-5)


def test_cls_export_roundtrip(tmp_path):
    """AOT export of a classification subnet: serialized artifact serves
    logits bit-identical to the live materialized subnet."""
    from ofa_sr_tpu.models.export import export_cls_subnet, load_subnet

    net = _tiny_net()
    p, s = net.init(jax.random.PRNGKey(0))
    arch = net.sample_arch(seed=1)
    path = str(tmp_path / "cls.stablehlo")
    blob = export_cls_subnet(net, p, s, arch, image_size=32, batch=2,
                             path=path)
    assert len(blob) > 1000
    fn = load_subnet(path)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    y = fn(x)
    ref = jax.jit(get_active_cls_subnet(net, p, s, arch))(x)
    assert y.shape == (2, 10)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
