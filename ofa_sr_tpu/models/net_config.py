"""Subnet-config serialization: the layer registry, static nets built from
`net.config` dicts, and config extraction from a trained supernet.

This is the deployment half of the OFA story the reference implements with
`set_layer_from_config` (ofa/layers.py:11-27), the layers' `.config` dicts,
`MobileNetV3`/`ProxylessNASNets.build_from_config`
(mobilenet_v3.py:48-86, proxyless_nets.py:105-139) and
`get_active_net_config` (ofa_mbv3.py:319-378). The JSON schema here is the
reference's own net.config format, so configs written by either side load in
both (round-trip tested against the torch oracle).

TPU-native design: a "layer" is a (init, apply) pure-function pair over an
explicit param/state pytree, registered by config name; a static net is the
composition driven by the config dict, jitted once per config (the
deployment path — a handful of configs, SURVEY.md §7.0).

For the SR nets the reference's config plumbing is broken leftovers
(mobilenet_s4.py:47,69-73 — why save_config comments out the net.config
dump, sr_run_manager.py:312-315); SR subnets serialize via
`SubnetConfig.to_dict/from_dict` (arch.py) + the S4/X4 materializer instead.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import apply_act, h_sigmoid
from ..ops.conv import conv2d, conv_init, depthwise_conv2d, depthwise_conv_init
from ..ops.norm import batch_norm, bn_init
from ..utils.common import make_divisible


# ---------------------------------------------------------------------------
# Layer registry: name -> (init, apply)
#
# init(key, cfg, dtype) -> (params, state)
# apply(params, state, x, cfg, *, training, bn_cfg) -> (y, new_state)
# ---------------------------------------------------------------------------

def _check(cfg, **expected):
    for k, v in expected.items():
        got = cfg.get(k, v)
        if got != v:
            raise NotImplementedError(
                "%s=%r unsupported (only %r)" % (k, got, v))


def _conv_layer_init(key, cfg, dtype):
    """ConvLayer (ofa/layers.py:120-187): conv (+bias) -> BN -> act."""
    _check(cfg, dilation=1, groups=1, has_shuffle=False,
           ops_order="weight_bn_act")
    p = {"conv": {"w": conv_init(key, cfg["kernel_size"], cfg["in_channels"],
                                 cfg["out_channels"], dtype)}}
    if cfg.get("bias", False):
        p["conv"]["b"] = jnp.zeros((cfg["out_channels"],), dtype)
    s = {}
    if cfg.get("use_bn", True):
        p["bn"], s_bn = bn_init(cfg["out_channels"], dtype)
        s["bn"] = s_bn
    return p, s


def _conv_layer_apply(p, s, x, cfg, *, training, bn_cfg):
    y = conv2d(x, p["conv"]["w"], stride=cfg.get("stride", 1))
    if "b" in p["conv"]:
        y = y + p["conv"]["b"]
    new_s = {}
    if "bn" in p:
        y, new_s["bn"] = batch_norm(y, p["bn"], s["bn"], training=training,
                                    **bn_cfg)
    y = apply_act(y, cfg.get("act_func"))
    return y, new_s


def _depth_conv_layer_init(key, cfg, dtype):
    """DepthConvLayer (ofa/layers.py:190-255): depthwise conv -> 1x1 point
    conv -> BN -> act."""
    _check(cfg, dilation=1, has_shuffle=False, ops_order="weight_bn_act")
    k1, k2 = jax.random.split(key)
    p = {"depth_conv": {"w": depthwise_conv_init(
            k1, cfg["kernel_size"], cfg["in_channels"], dtype)},
         "point_conv": {"w": conv_init(k2, 1, cfg["in_channels"],
                                       cfg["out_channels"], dtype)}}
    s = {}
    if cfg.get("use_bn", True):
        p["bn"], s_bn = bn_init(cfg["out_channels"], dtype)
        s["bn"] = s_bn
    return p, s


def _depth_conv_layer_apply(p, s, x, cfg, *, training, bn_cfg):
    y = depthwise_conv2d(x, p["depth_conv"]["w"], stride=cfg.get("stride", 1))
    y = conv2d(y, p["point_conv"]["w"])
    new_s = {}
    if "bn" in p:
        y, new_s["bn"] = batch_norm(y, p["bn"], s["bn"], training=training,
                                    **bn_cfg)
    y = apply_act(y, cfg.get("act_func"))
    return y, new_s


def _linear_layer_init(key, cfg, dtype):
    """LinearLayer (ofa/layers.py:318-380). Weight U(-1/sqrt(in), 1/sqrt(in))
    with ZERO bias — the reference's operative init is init_model('he_fout')
    (ofa/utils.py:134-155), which every RunManager applies and which zeroes
    all biases; torch's module-default bias init never survives it."""
    kin = cfg["in_features"]
    stdv = 1.0 / (kin ** 0.5)
    p = {"linear": {"w": jax.random.uniform(
        key, (kin, cfg["out_features"]), dtype, -stdv, stdv)}}
    if cfg.get("bias", True):
        p["linear"]["b"] = jnp.zeros((cfg["out_features"],), dtype)
    return p, {}


def _linear_layer_apply(p, s, x, cfg, *, training, bn_cfg):
    y = x @ p["linear"]["w"]
    if "b" in p["linear"]:
        y = y + p["linear"]["b"]
    y = apply_act(y, cfg.get("act_func"))
    return y, {}


def _identity_init(key, cfg, dtype):
    return {}, {}


def _identity_apply(p, s, x, cfg, *, training, bn_cfg):
    return x, {}


def _zero_apply(p, s, x, cfg, *, training, bn_cfg):
    # ZeroLayer (ofa/layers.py:412-444): zeros at h//stride (floor, like
    # the reference's padding computation), not the ceil that plain
    # ::stride slicing gives on odd extents
    stride = cfg.get("stride", 1)
    h, w = x.shape[1] // stride, x.shape[2] // stride
    return jnp.zeros_like(x[:, :h, :w, :]), {}


def _pooling_init(key, cfg, dtype):
    return {}, {}


def _pooling_apply(p, s, x, cfg, *, training, bn_cfg):
    """PoolingLayer (ofa/layers.py:258-315), avg/max, SAME padding."""
    k = cfg.get("kernel_size", 2)
    st = cfg.get("stride", 2)
    pad = ((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0))
    if cfg["pool_type"] == "avg":
        y = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                                  (1, st, st, 1), pad) / float(k * k)
    elif cfg["pool_type"] == "max":
        y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                  (1, st, st, 1), pad)
    else:
        raise NotImplementedError(cfg["pool_type"])
    return apply_act(y, cfg.get("act_func")), {}


def _mb_inverted_init(key, cfg, dtype):
    """MBInvertedConvLayer (ofa/layers.py:447-527): optional 1x1 expand ->
    depthwise (+optional SE) -> 1x1 project, BN after each conv."""
    in_ch, out_ch = cfg["in_channels"], cfg["out_channels"]
    mid = cfg.get("mid_channels") or round(in_ch * cfg["expand_ratio"])
    k_ib, k_dw, k_pl, k_s1, k_s2 = jax.random.split(key, 5)
    p, s = {}, {}
    if cfg["expand_ratio"] != 1:
        p["inverted_bottleneck"] = {"conv": {"w": conv_init(k_ib, 1, in_ch,
                                                            mid, dtype)}}
        p["inverted_bottleneck"]["bn"], s_ib = bn_init(mid, dtype)
        s["inverted_bottleneck"] = {"bn": s_ib}
    p["depth_conv"] = {"conv": {"w": depthwise_conv_init(
        k_dw, cfg["kernel_size"], mid, dtype)}}
    p["depth_conv"]["bn"], s_dw = bn_init(mid, dtype)
    s["depth_conv"] = {"bn": s_dw}
    if cfg.get("use_se", False):
        se_mid = make_divisible(mid // 4, 8)  # SEModule, ofa/utils.py:355-371
        p["se"] = {
            "reduce": {"w": conv_init(k_s1, 1, mid, se_mid, dtype),
                       "b": jnp.zeros((se_mid,), dtype)},
            "expand": {"w": conv_init(k_s2, 1, se_mid, mid, dtype),
                       "b": jnp.zeros((mid,), dtype)},
        }
    p["point_linear"] = {"conv": {"w": conv_init(k_pl, 1, mid, out_ch,
                                                 dtype)}}
    p["point_linear"]["bn"], s_pl = bn_init(out_ch, dtype)
    s["point_linear"] = {"bn": s_pl}
    return p, s


def _mb_inverted_apply(p, s, x, cfg, *, training, bn_cfg):
    act = cfg.get("act_func", "relu6")
    new_s = {}
    y = x
    if "inverted_bottleneck" in p:
        y = conv2d(y, p["inverted_bottleneck"]["conv"]["w"])
        y, bn = batch_norm(y, p["inverted_bottleneck"]["bn"],
                           s["inverted_bottleneck"]["bn"], training=training,
                           **bn_cfg)
        y = apply_act(y, act)
        new_s["inverted_bottleneck"] = {"bn": bn}
    y = depthwise_conv2d(y, p["depth_conv"]["conv"]["w"],
                         stride=cfg.get("stride", 1))
    y, bn = batch_norm(y, p["depth_conv"]["bn"], s["depth_conv"]["bn"],
                       training=training, **bn_cfg)
    y = apply_act(y, act)
    new_s["depth_conv"] = {"bn": bn}
    if "se" in p:
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = conv2d(g, p["se"]["reduce"]["w"]) + p["se"]["reduce"]["b"]
        g = jnp.maximum(g, 0)
        g = conv2d(g, p["se"]["expand"]["w"]) + p["se"]["expand"]["b"]
        y = y * h_sigmoid(g)
    y = conv2d(y, p["point_linear"]["conv"]["w"])
    y, bn = batch_norm(y, p["point_linear"]["bn"], s["point_linear"]["bn"],
                       training=training, **bn_cfg)
    new_s["point_linear"] = {"bn": bn}
    return y, new_s


# the reference's name2layer registry (ofa/layers.py:11-27)
LAYER_REGISTRY = {
    "ConvLayer": (_conv_layer_init, _conv_layer_apply),
    "DepthConvLayer": (_depth_conv_layer_init, _depth_conv_layer_apply),
    "PoolingLayer": (_pooling_init, _pooling_apply),
    "IdentityLayer": (_identity_init, _identity_apply),
    "LinearLayer": (_linear_layer_init, _linear_layer_apply),
    "ZeroLayer": (_identity_init, _zero_apply),
    "MBInvertedConvLayer": (_mb_inverted_init, _mb_inverted_apply),
}


def layer_init_from_config(key, cfg, dtype=jnp.float32):
    """set_layer_from_config (ofa/layers.py:11-27), init half."""
    if cfg is None:
        return None
    return LAYER_REGISTRY[cfg["name"]][0](key, cfg, dtype)


def layer_apply_from_config(p, s, x, cfg, *, training=False, bn_cfg=None):
    if cfg is None:
        return x, {}
    return LAYER_REGISTRY[cfg["name"]][1](p, s, x, cfg, training=training,
                                          bn_cfg=bn_cfg or {})


# ---------------------------------------------------------------------------
# Static nets from net.config
# ---------------------------------------------------------------------------

class StaticNetFromConfig:
    """A concrete (non-elastic) classification net built from a reference
    net.config dict — MobileNetV3 (mobilenet_v3.py:15-86) or
    ProxylessNASNets (proxyless_nets.py:75-139) schema."""

    SUPPORTED = ("MobileNetV3", "ProxylessNASNets")

    def __init__(self, config: dict):
        if config["name"] not in self.SUPPORTED:
            raise ValueError("unsupported net.config name: %r (supported %s)"
                             % (config["name"], self.SUPPORTED))
        self.config = config
        bn = config.get("bn", {})
        self.bn_cfg = {"momentum": bn.get("momentum", 0.1),
                       "eps": bn.get("eps", 1e-5
                                     if config["name"] == "MobileNetV3"
                                     else 1e-3)}
        self.is_mbv3 = config["name"] == "MobileNetV3"

    # -- init ------------------------------------------------------------------

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        n = len(cfg["blocks"])
        keys = jax.random.split(key, n + 4)
        p, s = {}, {}
        p["first_conv"], s["first_conv"] = layer_init_from_config(
            keys[0], cfg["first_conv"], dtype)
        bp, bs = [], []
        for i, blk in enumerate(cfg["blocks"]):
            a = layer_init_from_config(keys[1 + i],
                                       blk["mobile_inverted_conv"], dtype)
            bp.append(a[0])
            bs.append(a[1])
        p["blocks"], s["blocks"] = bp, bs
        ki = n + 1
        if self.is_mbv3:
            p["final_expand_layer"], s["final_expand_layer"] = \
                layer_init_from_config(keys[ki], cfg["final_expand_layer"],
                                       dtype)
        fm = cfg.get("feature_mix_layer")
        if fm is not None:
            p["feature_mix_layer"], s["feature_mix_layer"] = \
                layer_init_from_config(keys[ki + 1], fm, dtype)
        p["classifier"], s["classifier"] = layer_init_from_config(
            keys[ki + 2], cfg["classifier"], dtype)
        return p, s

    # -- forward -----------------------------------------------------------------

    def apply(self, params, state, x, *, training=False):
        cfg, bn_cfg = self.config, self.bn_cfg
        new_s = {}
        y, new_s["first_conv"] = layer_apply_from_config(
            params["first_conv"], state["first_conv"], x, cfg["first_conv"],
            training=training, bn_cfg=bn_cfg)
        blocks_s = []
        for i, blk in enumerate(cfg["blocks"]):
            mic = blk["mobile_inverted_conv"]
            out, ns = layer_apply_from_config(
                params["blocks"][i], state["blocks"][i], y, mic,
                training=training, bn_cfg=bn_cfg)
            # MobileInvertedResidualBlock (proxyless_nets.py:44-51)
            if blk.get("shortcut") is not None and \
                    blk["shortcut"]["name"] == "IdentityLayer":
                out = out + y
            y = out
            blocks_s.append(ns)
        new_s["blocks"] = blocks_s
        if self.is_mbv3:
            y, new_s["final_expand_layer"] = layer_apply_from_config(
                params["final_expand_layer"], state["final_expand_layer"], y,
                cfg["final_expand_layer"], training=training, bn_cfg=bn_cfg)
            y = jnp.mean(y, axis=(1, 2), keepdims=True)  # mobilenet_v3.py:31
            y, _ = layer_apply_from_config(
                params["feature_mix_layer"], state.get("feature_mix_layer", {}),
                y, cfg["feature_mix_layer"], training=training, bn_cfg=bn_cfg)
            y = y[:, 0, 0, :]
        else:
            if "feature_mix_layer" in params:
                y, new_s["feature_mix_layer"] = layer_apply_from_config(
                    params["feature_mix_layer"], state["feature_mix_layer"],
                    y, cfg["feature_mix_layer"], training=training,
                    bn_cfg=bn_cfg)
            y = jnp.mean(y, axis=(1, 2))  # proxyless_nets.py:90
        y, _ = layer_apply_from_config(
            params["classifier"], state.get("classifier", {}), y,
            cfg["classifier"], training=training, bn_cfg=bn_cfg)
        return y, new_s


def build_from_config(config: dict) -> StaticNetFromConfig:
    """The reference's <Net>.build_from_config dispatch
    (model_zoo.py:196-202)."""
    return StaticNetFromConfig(config)


def load_net_config(path: str) -> StaticNetFromConfig:
    with open(path) as f:
        return build_from_config(json.load(f))


# ---------------------------------------------------------------------------
# Config extraction from an elastic supernet (get_active_net_config,
# ofa_mbv3.py:319-378) + weight transfer
# ---------------------------------------------------------------------------

def get_active_net_config(net, arch) -> dict:
    """ElasticClassifierNet + ClsArch -> a reference-schema net.config for
    the active subnet."""
    wid = len(net.width_mult_list) - 1 if arch.wid is None else arch.wid
    ins, outs = net.active_block_channels(wid)
    fw = net.first_conv_widths[wid]
    fbo = net.first_block_outs[wid]
    fm_w = net.feature_mix_widths[wid]

    def conv_cfg(in_ch, out_ch, k, stride, act, use_bn=True, bias=False):
        return {"name": "ConvLayer", "kernel_size": k, "stride": stride,
                "dilation": 1, "groups": 1, "bias": bias,
                "has_shuffle": False, "in_channels": in_ch,
                "out_channels": out_ch, "use_bn": use_bn, "act_func": act,
                "dropout_rate": 0, "ops_order": "weight_bn_act"}

    def mb_cfg(in_ch, out_ch, k, stride, e, mid, act, use_se):
        return {"name": "MBInvertedConvLayer", "in_channels": in_ch,
                "out_channels": out_ch, "kernel_size": k, "stride": stride,
                "expand_ratio": e, "mid_channels": mid, "act_func": act,
                "use_se": use_se}

    def block_cfg(mic, shortcut):
        return {"name": "MobileInvertedResidualBlock",
                "mobile_inverted_conv": mic,
                "shortcut": ({"name": "IdentityLayer",
                              "in_channels": mic["out_channels"],
                              "out_channels": mic["out_channels"]}
                             if shortcut else None)}

    # first block: static e1-k3, mid_channels None like the reference's
    # static MBInvertedConvLayer config (layers.py:513-524)
    blocks = [block_cfg(
        mb_cfg(fw, fbo, 3, 1, 1, None, net.first_block_act, False),
        fbo == fw)]
    bi = 0
    for si, spec in enumerate(net.stage_specs):
        for i in range(spec.n_block):
            if i == 0 or i < arch.d[si]:
                in_ch, out_ch = ins[bi], outs[bi]
                mid = make_divisible(round(in_ch * arch.e[bi]), 8)
                stride = spec.stride if i == 0 else 1
                blocks.append(block_cfg(
                    mb_cfg(in_ch, out_ch, arch.ks[bi], stride, arch.e[bi],
                           mid, spec.act, spec.se),
                    stride == 1 and in_ch == out_ch))
            bi += 1

    head_in = outs[-1]
    cfg = {"name": "MobileNetV3" if net.final_expand_width
           else "ProxylessNASNets",
           "bn": {"momentum": net.bn_cfg["momentum"],
                  "eps": net.bn_cfg["eps"]},
           "first_conv": conv_cfg(3, fw, 3, 2, net.first_conv_act),
           "blocks": blocks,
           "classifier": {"name": "LinearLayer",
                          "in_features": (net.feature_mix_width
                                          if net.final_expand_width
                                          else fm_w),
                          "out_features": net.n_classes, "bias": True,
                          "use_bn": False, "act_func": None,
                          "dropout_rate": net.dropout_rate,
                          "ops_order": "weight_bn_act"}}
    if net.final_expand_width:
        cfg["final_expand_layer"] = conv_cfg(
            head_in, net.final_expand_width, 1, 1, net.head_act)
        cfg["feature_mix_layer"] = conv_cfg(
            net.final_expand_width, net.feature_mix_width, 1, 1,
            net.head_act, use_bn=False)
    else:
        cfg["feature_mix_layer"] = conv_cfg(head_in, fm_w, 1, 1,
                                            net.head_act)
    return cfg


def static_params_from_supernet(net, params, state, arch):
    """Slice a supernet's weight banks into the param tree of the static
    net built from get_active_net_config(net, arch) — the functional
    equivalent of get_active_subnet(preserve_weight=True)
    (ofa_mbv3.py:293-317, dynamic_layers.py:112-154)."""
    from ..ops.elastic import transform_kernel_chain
    from .materialize import _slice_bn

    wid = len(net.width_mult_list) - 1 if arch.wid is None else arch.wid
    ins, outs = net.active_block_channels(wid)
    fw = net.first_conv_widths[wid]
    fbo = net.first_block_outs[wid]
    fm_w = net.feature_mix_widths[wid]
    sp = net.space

    p, s = {}, {}
    bn_p, bn_s = _slice_bn(params["first_conv"]["bn"],
                           state["first_conv"]["bn"], fw)
    p["first_conv"] = {"conv": {"w": params["first_conv"]["conv"]["w"][
        :, :, :, :fw]}, "bn": bn_p}
    s["first_conv"] = {"bn": bn_s}

    # first block (static e1-k3) -> an MBInvertedConvLayer with
    # expand_ratio 1 (no inverted bottleneck)
    fbk, fbs = params["first_block"], state["first_block"]
    dwp, dws = _slice_bn(fbk["dw"]["bn"], fbs["dw"]["bn"], fw)
    plp, pls = _slice_bn(fbk["pl"]["bn"], fbs["pl"]["bn"], fbo)
    blocks_p = [{"depth_conv": {"conv": {"w": fbk["dw"]["w"][:, :, :, :fw]},
                                "bn": dwp},
                 "point_linear": {"conv": {"w": fbk["pl"]["w"][
                     :, :, :fw, :fbo]}, "bn": plp}}]
    blocks_s = [{"depth_conv": {"bn": dws}, "point_linear": {"bn": pls}}]

    bi = 0
    for si, spec in enumerate(net.stage_specs):
        for i in range(spec.n_block):
            if i == 0 or i < arch.d[si]:
                in_ch, out_ch = ins[bi], outs[bi]
                mid = make_divisible(round(in_ch * arch.e[bi]), 8)
                bp, bs = params["blocks"][bi], state["blocks"][bi]
                ibp, ibs = _slice_bn(bp["inverted_bottleneck"]["bn"],
                                     bs["inverted_bottleneck"]["bn"], mid)
                dwp, dws = _slice_bn(bp["depth_conv"]["bn"],
                                     bs["depth_conv"]["bn"], mid)
                plp, pls = _slice_bn(bp["point_linear"]["bn"],
                                     bs["point_linear"]["bn"], out_ch)
                w_dw = transform_kernel_chain(
                    bp["depth_conv"]["conv"]["w"], bp["depth_conv"].get("kt"),
                    sp.ks_list, arch.ks[bi],
                    use_transform="kt" in bp["depth_conv"])[:, :, :, :mid]
                nbp = {
                    "inverted_bottleneck": {
                        "conv": {"w": bp["inverted_bottleneck"]["conv"]["w"][
                            :, :, :in_ch, :mid]}, "bn": ibp},
                    "depth_conv": {"conv": {"w": w_dw}, "bn": dwp},
                    "point_linear": {
                        "conv": {"w": bp["point_linear"]["conv"]["w"][
                            :, :, :mid, :out_ch]}, "bn": plp},
                }
                nbs = {"inverted_bottleneck": {"bn": ibs},
                       "depth_conv": {"bn": dws},
                       "point_linear": {"bn": pls}}
                if "se" in bp:
                    se_mid = make_divisible(mid // 4, 8)
                    nbp["se"] = {
                        "reduce": {"w": bp["se"]["reduce"]["w"][
                            :, :, :mid, :se_mid],
                            "b": bp["se"]["reduce"]["b"][:se_mid]},
                        "expand": {"w": bp["se"]["expand"]["w"][
                            :, :, :se_mid, :mid],
                            "b": bp["se"]["expand"]["b"][:mid]},
                    }
                blocks_p.append(nbp)
                blocks_s.append(nbs)
            bi += 1
    p["blocks"], s["blocks"] = blocks_p, blocks_s

    head_in = outs[-1]
    if net.final_expand_width:
        p["final_expand_layer"] = {
            "conv": {"w": params["final_expand"]["conv"]["w"][
                :, :, :head_in, :]},
            "bn": dict(params["final_expand"]["bn"])}
        s["final_expand_layer"] = {"bn": dict(state["final_expand"]["bn"])}
        p["feature_mix_layer"] = {
            "conv": {"w": params["feature_mix"]["conv"]["w"]}}
        s["feature_mix_layer"] = {}
        cls_in = net.feature_mix_width
    else:
        fmp, fms = _slice_bn(params["feature_mix"]["bn"],
                             state["feature_mix"]["bn"], fm_w)
        p["feature_mix_layer"] = {
            "conv": {"w": params["feature_mix"]["conv"]["w"][
                :, :, :head_in, :fm_w]}, "bn": fmp}
        s["feature_mix_layer"] = {"bn": fms}
        cls_in = fm_w
    p["classifier"] = {"linear": {"w": params["classifier"]["w"][:cls_in, :],
                                  "b": params["classifier"]["b"]}}
    s["classifier"] = {}
    return p, s


def specialize(net, params, state, arch):
    """One-call deployment: (static_net, params, state) for the active
    subnet — the eval_ofa_net.py:58-79 materialization step."""
    static = build_from_config(get_active_net_config(net, arch))
    sp, ss = static_params_from_supernet(net, params, state, arch)
    return static, sp, ss


# ---------------------------------------------------------------------------
# Torch interop for specialized-net 'init' files (model_zoo.py:208-212)
# ---------------------------------------------------------------------------

def import_torch_static(path_or_sd, static_net: StaticNetFromConfig):
    """Load a reference specialized-net state_dict (the downloaded 'init'
    file) into the static net's param tree."""
    from ..train.checkpoint import (
        _bn_from,
        _dw_oihw_to_hwio,
        _load_torch_sd,
        _oihw_to_hwio,
    )
    sd = _load_torch_sd(path_or_sd)
    cfg = static_net.config
    p, s = {}, {}

    def conv_from(prefix, layer_cfg):
        lp = {"conv": {"w": _oihw_to_hwio(np.asarray(
            sd[prefix + ".conv.weight"], np.float32))}}
        if prefix + ".conv.bias" in sd:
            lp["conv"]["b"] = np.asarray(sd[prefix + ".conv.bias"],
                                         np.float32)
        ls = {}
        if layer_cfg.get("use_bn", True):
            lp["bn"], ls["bn"] = _bn_from(sd, prefix + ".bn")
        return lp, ls

    p["first_conv"], s["first_conv"] = conv_from("first_conv",
                                                 cfg["first_conv"])
    bp, bs = [], []
    for i, blk in enumerate(cfg["blocks"]):
        mic = blk["mobile_inverted_conv"]
        pre = "blocks.%d.mobile_inverted_conv" % i
        lp, ls = {}, {}
        if mic["expand_ratio"] != 1:
            w = _oihw_to_hwio(np.asarray(
                sd[pre + ".inverted_bottleneck.conv.weight"], np.float32))
            bn_p, bn_s = _bn_from(sd, pre + ".inverted_bottleneck.bn")
            lp["inverted_bottleneck"] = {"conv": {"w": w}, "bn": bn_p}
            ls["inverted_bottleneck"] = {"bn": bn_s}
        w = _dw_oihw_to_hwio(np.asarray(sd[pre + ".depth_conv.conv.weight"],
                                        np.float32))
        bn_p, bn_s = _bn_from(sd, pre + ".depth_conv.bn")
        lp["depth_conv"] = {"conv": {"w": w}, "bn": bn_p}
        ls["depth_conv"] = {"bn": bn_s}
        if mic.get("use_se"):
            sep = pre + ".depth_conv.se.fc"
            lp["se"] = {
                "reduce": {"w": _oihw_to_hwio(np.asarray(
                    sd[sep + ".reduce.weight"], np.float32)),
                    "b": np.asarray(sd[sep + ".reduce.bias"], np.float32)},
                "expand": {"w": _oihw_to_hwio(np.asarray(
                    sd[sep + ".expand.weight"], np.float32)),
                    "b": np.asarray(sd[sep + ".expand.bias"], np.float32)},
            }
        w = _oihw_to_hwio(np.asarray(sd[pre + ".point_linear.conv.weight"],
                                     np.float32))
        bn_p, bn_s = _bn_from(sd, pre + ".point_linear.bn")
        lp["point_linear"] = {"conv": {"w": w}, "bn": bn_p}
        ls["point_linear"] = {"bn": bn_s}
        bp.append(lp)
        bs.append(ls)
    p["blocks"], s["blocks"] = bp, bs

    if static_net.is_mbv3:
        p["final_expand_layer"], s["final_expand_layer"] = conv_from(
            "final_expand_layer", cfg["final_expand_layer"])
    if cfg.get("feature_mix_layer") is not None:
        p["feature_mix_layer"], s["feature_mix_layer"] = conv_from(
            "feature_mix_layer", cfg["feature_mix_layer"])
    p["classifier"] = {"linear": {
        "w": np.ascontiguousarray(np.asarray(
            sd["classifier.linear.weight"], np.float32).T),
        "b": np.asarray(sd["classifier.linear.bias"], np.float32)}}
    s["classifier"] = {}
    return jax.tree.map(jnp.asarray, (p, s))
