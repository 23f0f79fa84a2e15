"""Subnet-config serialization: layer registry, static build_from_config,
config extraction, and torch-oracle interop for specialized nets."""

import json
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofa_sr_tpu.models.arch import SearchSpace, SubnetConfig, sample_subnet
from ofa_sr_tpu.models.net_config import (
    build_from_config,
    get_active_net_config,
    import_torch_static,
    specialize,
    static_params_from_supernet,
)
from ofa_sr_tpu.models.ofa_cls import ClsArch, OFAMobileNetV3, OFAProxylessNASNets

REF = "/root/reference"


def _x(b=2, s=64, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).rand(b, s, s, 3).astype(np.float32))


def test_subnet_config_json_round_trip():
    sp = SearchSpace()
    cfg = sample_subnet(sp, seed=3, n_trunks=2)
    d = json.loads(json.dumps(cfg.to_dict()))
    assert SubnetConfig.from_dict(d) == cfg


def test_specialize_matches_masked_supernet():
    """Static net built from get_active_net_config + sliced weights ==
    the masked supernet forward, for sampled archs incl. elastic width."""
    for make, wml in ((OFAMobileNetV3, None),
                      (OFAMobileNetV3, [0.65, 1.0]),
                      (OFAProxylessNASNets, [0.65, 1.0])):
        net = make(n_classes=7, width_mult_list=wml)
        p, s = net.init(jax.random.PRNGKey(0))
        base = net.sample_arch(seed=2)
        wids = (None,) if wml is None else (None, 0)
        for wid in wids:
            arch = ClsArch(base.ks, base.e, base.d, wid)
            y_super, _ = net.apply(p, s, _x(), net.arch_to_device(arch),
                                   training=False)
            static, sp_, ss_ = specialize(net, p, s, arch)
            y_static, _ = static.apply(sp_, ss_, _x(), training=False)
            np.testing.assert_allclose(np.asarray(y_static),
                                       np.asarray(y_super),
                                       rtol=3e-4, atol=3e-5)


def test_net_config_json_round_trip_forward():
    """config -> JSON -> build_from_config gives the identical program."""
    net = OFAMobileNetV3(n_classes=5)
    p, s = net.init(jax.random.PRNGKey(1))
    arch = net.sample_arch(seed=1)
    cfg = get_active_net_config(net, arch)
    static1 = build_from_config(cfg)
    static2 = build_from_config(json.loads(json.dumps(cfg)))
    sp_, ss_ = static_params_from_supernet(net, p, s, arch)
    y1, _ = static1.apply(sp_, ss_, _x(1), training=False)
    y2, _ = static2.apply(sp_, ss_, _x(1), training=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_static_net_init_and_train_forward():
    """A config-built net initializes its own weights and runs in both BN
    modes (fresh-deployment path when no init weights exist)."""
    net = OFAProxylessNASNets(n_classes=4)
    cfg = get_active_net_config(net, net.sample_arch(seed=5))
    static = build_from_config(cfg)
    p, s = static.init(jax.random.PRNGKey(2))
    y, ns = static.apply(p, s, _x(2, 32), training=True)
    assert y.shape == (2, 4)
    assert ns["blocks"]  # BN state threads through


@pytest.fixture(scope="module")
def ref_v3():
    pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not mounted")
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: a[0]
    tv.utils = tvu
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tvu)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ofa.elastic_nn.modules.dynamic_op import DynamicSeparableConv2d
    from ofa.elastic_nn.networks.ofa_mbv3 import OFAMobileNetV3 as RefV3
    DynamicSeparableConv2d.KERNEL_TRANSFORM_MODE = 1
    return RefV3


def test_net_config_matches_reference_schema(ref_v3):
    """Our get_active_net_config emits the reference's own schema: compare
    the semantic fields against ref.get_active_net_config()
    (ofa_mbv3.py:319-378)."""
    import torch
    torch.manual_seed(11)
    ref = ref_v3(n_classes=10, ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                 depth_list=[2, 3, 4])
    net = OFAMobileNetV3(n_classes=10)
    a = net.sample_arch(seed=7)
    ref.set_active_subnet(ks=list(a.ks), e=list(a.e), d=list(a.d))
    ref_cfg = ref.get_active_net_config()
    our_cfg = get_active_net_config(net, a)

    assert our_cfg["name"] == ref_cfg["name"] == "MobileNetV3"
    assert len(our_cfg["blocks"]) == len(ref_cfg["blocks"])
    for ours, theirs in zip(our_cfg["blocks"], ref_cfg["blocks"]):
        om, tm = ours["mobile_inverted_conv"], theirs["mobile_inverted_conv"]
        for k in ("name", "in_channels", "out_channels", "kernel_size",
                  "stride", "expand_ratio", "mid_channels", "act_func",
                  "use_se"):
            assert om[k] == tm[k], (k, om, tm)
        assert (ours["shortcut"] is None) == (theirs["shortcut"] is None)
    for k in ("kernel_size", "stride", "out_channels", "act_func"):
        assert our_cfg["first_conv"][k] == ref_cfg["first_conv"][k]
        assert (our_cfg["final_expand_layer"][k]
                == ref_cfg["final_expand_layer"][k])
        assert (our_cfg["feature_mix_layer"][k]
                == ref_cfg["feature_mix_layer"][k])
    assert (our_cfg["classifier"]["out_features"]
            == ref_cfg["classifier"]["out_features"])


def test_import_torch_specialized_net(ref_v3):
    """The full ofa_specialized oracle: the reference materializes a
    specialized torch subnet (get_active_subnet(preserve_weight=True)); we
    build from its net.config and load its state_dict — forwards match."""
    import torch
    torch.manual_seed(12)
    ref = ref_v3(n_classes=10, ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                 depth_list=[2, 3, 4])
    net = OFAMobileNetV3(n_classes=10)
    a = net.sample_arch(seed=13)
    ref.set_active_subnet(ks=list(a.ks), e=list(a.e), d=list(a.d))
    ref_sub = ref.get_active_subnet(preserve_weight=True)
    ref_sub.train()
    for m in ref_sub.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    static = build_from_config(ref.get_active_net_config())
    params, state = import_torch_static(ref_sub.state_dict(), static)

    x = np.random.RandomState(9).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        y_ref = ref_sub(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    y_ours, _ = static.apply(params, state, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(y_ours), y_ref,
                               rtol=2e-4, atol=2e-4)


def test_ofa_specialized_zoo_paths(tmp_path):
    """model_zoo.ofa_specialized builds the real architecture from a local
    net.config mirror and from a supernet slice."""
    from ofa_sr_tpu.model_zoo import ofa_net, ofa_specialized

    net_id = "flops@595M_top1@80.0_finetune@75"
    e_net, e_params, e_state = ofa_net("ofa_mbv3_d234_e346_k357_w1.0")
    # tiny net instead would diverge from the id; use the real supernet but
    # only forward at a small image to keep this quick
    arch = e_net.sample_arch(seed=3)

    # supernet-slice path
    static, p, s, expected = ofa_specialized(
        net_id, supernet=(e_net, e_params, e_state), arch=arch)
    y, _ = static.apply(p, s, _x(1, 32), training=False)
    assert y.shape == (1, 1000) and expected["top1"] == 80.0

    # local-mirror path
    base = tmp_path / net_id
    base.mkdir(parents=True)
    (base / "net.config").write_text(
        json.dumps(get_active_net_config(e_net, arch)))
    (base / "run.config").write_text(json.dumps({"image_size": 160}))
    static2, p2, s2, expected2 = ofa_specialized(net_id, root=str(tmp_path))
    assert expected2["image_size"] == 160
    y2, _ = static2.apply(p2, s2, _x(1, 32), training=False)
    assert y2.shape == (1, 1000)

    # no source -> loud error
    with pytest.raises(ValueError, match="architecture source"):
        ofa_specialized(net_id)
