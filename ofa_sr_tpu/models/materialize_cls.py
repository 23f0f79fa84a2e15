"""Materialize a static classification subnet from an ElasticClassifierNet.

The reference deployment path (eval_ofa_net.py:58-79:
`get_active_subnet(preserve_weight=True)` -> BN recalibration -> validate;
MBV3's working get_active_subnet at ofa_mbv3.py:293-317). Slices the active
kernel (through the transform chain), middle channels, SE bottleneck, and BN
prefixes into a concrete pytree and jits the true small network — with
optional BN folding for inference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.activations import apply_act, h_sigmoid
from ..ops.conv import conv2d, depthwise_conv2d
from ..ops.elastic import transform_kernel_chain
from ..ops.norm import batch_norm
from ..utils.common import make_divisible
from .materialize import _fold_bn_into_conv, _slice_bn
from .ofa_cls import ClsArch, ElasticClassifierNet


def _conv_bn(p, s, *, fold_bn, eps):
    if fold_bn:
        w, b = _fold_bn_into_conv(p["conv"]["w"], p["bn"], s["bn"], eps)
        return {"w": w, "b": b}
    return {"w": p["conv"]["w"], "bn_p": dict(p["bn"]), "bn_s": dict(s["bn"])}


class StaticClsSubnet:
    def __init__(self, net: ElasticClassifierNet, params, state, arch: ClsArch,
                 *, fold_bn: bool = True):
        self.net = net
        self.arch = arch
        self.fold_bn = fold_bn
        self.eps = net.bn_cfg["eps"]
        fb = dict(fold_bn=fold_bn, eps=self.eps)
        sp = net.space

        # runtime elastic width: slice every layer to the wid's widths
        # (DynamicConvLayer/DynamicMBConvLayer.get_active_subnet,
        # dynamic_layers.py:254-269,112-154)
        wid = (len(net.width_mult_list) - 1 if arch.wid is None
               else arch.wid)
        fw = net.first_conv_widths[wid]
        fbo = net.first_block_outs[wid]
        ins, outs = net.active_block_channels(wid)
        self._head_in = outs[-1] if outs else fbo

        def slice_cb(p, s, n_out, n_in=None, dw=False):
            w = p["conv"]["w"]
            w = w[:, :, :, :n_out] if dw or n_in is None else \
                w[:, :, :n_in, :n_out]
            p_bn, s_bn = _slice_bn(p["bn"], s["bn"], n_out)
            return _conv_bn({"conv": {"w": w}, "bn": p_bn}, {"bn": s_bn}, **fb)

        m = {"first_conv": slice_cb(params["first_conv"],
                                    state["first_conv"], fw)}
        fbk = params["first_block"]
        fbs = state["first_block"]
        m["first_block"] = {
            "dw": slice_cb({"conv": {"w": fbk["dw"]["w"]},
                            "bn": fbk["dw"]["bn"]},
                           {"bn": fbs["dw"]["bn"]}, fw, dw=True),
            "pl": slice_cb({"conv": {"w": fbk["pl"]["w"]},
                            "bn": fbk["pl"]["bn"]},
                           {"bn": fbs["pl"]["bn"]}, fbo, n_in=fw),
        }

        stages, bi = [], 0
        for si, spec in enumerate(net.stage_specs):
            blocks = []
            for i in range(spec.n_block):
                active = i == 0 or i < arch.d[si]
                if active:
                    in_ch, out_ch = ins[bi], outs[bi]
                    mid = make_divisible(round(in_ch * arch.e[bi]), 8)
                    bp, bs = params["blocks"][bi], state["blocks"][bi]
                    blk = {"stride": spec.stride if i == 0 else 1,
                           "act": spec.act, "mid": mid,
                           "residual": i > 0}
                    w_ib = bp["inverted_bottleneck"]["conv"]["w"][
                        :, :, :in_ch, :mid]
                    p_bn, s_bn = _slice_bn(bp["inverted_bottleneck"]["bn"],
                                           bs["inverted_bottleneck"]["bn"], mid)
                    blk["ib"] = _conv_bn({"conv": {"w": w_ib}, "bn": p_bn},
                                         {"bn": s_bn}, **fb)
                    w_dw = transform_kernel_chain(
                        bp["depth_conv"]["conv"]["w"], bp["depth_conv"].get("kt"),
                        sp.ks_list, arch.ks[bi],
                        use_transform="kt" in bp["depth_conv"])[:, :, :, :mid]
                    p_bn, s_bn = _slice_bn(bp["depth_conv"]["bn"],
                                           bs["depth_conv"]["bn"], mid)
                    blk["dw"] = _conv_bn({"conv": {"w": w_dw}, "bn": p_bn},
                                         {"bn": s_bn}, **fb)
                    if "se" in bp:
                        se_mid = make_divisible(mid // 4, 8)
                        blk["se"] = {
                            "rw": bp["se"]["reduce"]["w"][:, :, :mid, :se_mid],
                            "rb": bp["se"]["reduce"]["b"][:se_mid],
                            "ew": bp["se"]["expand"]["w"][:, :, :se_mid, :mid],
                            "eb": bp["se"]["expand"]["b"][:mid],
                        }
                    w_pl = bp["point_linear"]["conv"]["w"][:, :, :mid, :out_ch]
                    pl_bn_p, pl_bn_s = _slice_bn(bp["point_linear"]["bn"],
                                                 bs["point_linear"]["bn"],
                                                 out_ch)
                    blk["pl"] = _conv_bn({"conv": {"w": w_pl}, "bn": pl_bn_p},
                                         {"bn": pl_bn_s}, **fb)
                    blocks.append(blk)
                bi += 1
            stages.append(blocks)
        m["stages"] = stages

        fm_w = net.feature_mix_widths[wid]
        if net.final_expand_width:
            fe = params["final_expand"]
            m["final_expand"] = _conv_bn(
                {"conv": {"w": fe["conv"]["w"][:, :, :self._head_in, :]},
                 "bn": fe["bn"]}, state["final_expand"], **fb)
            m["feature_mix"] = {"w": params["feature_mix"]["conv"]["w"]}
            m["classifier"] = dict(params["classifier"])
        else:
            m["feature_mix"] = slice_cb(
                {"conv": {"w": params["feature_mix"]["conv"]["w"][
                    :, :, :self._head_in, :]},
                 "bn": params["feature_mix"]["bn"]},
                state["feature_mix"], fm_w)
            m["classifier"] = {"w": params["classifier"]["w"][:fm_w, :],
                               "b": params["classifier"]["b"]}
        self.params = m

    def _post(self, lp, y, act=None):
        if self.fold_bn:
            y = y + lp["b"]
        else:
            y, _ = batch_norm(y, lp["bn_p"], lp["bn_s"], training=False,
                              eps=self.eps)
        return apply_act(y, act)

    def __call__(self, x):
        net, m = self.net, self.params
        y = conv2d(x, m["first_conv"]["w"], stride=2)
        y = self._post(m["first_conv"], y, net.first_conv_act)
        h = depthwise_conv2d(y, m["first_block"]["dw"]["w"])
        h = self._post(m["first_block"]["dw"], h, net.first_block_act)
        h = conv2d(h, m["first_block"]["pl"]["w"])
        h = self._post(m["first_block"]["pl"], h, None)
        y = y + h if net.first_block_out == net.first_conv_width else h

        for blocks in m["stages"]:
            for blk in blocks:
                z = conv2d(y, blk["ib"]["w"])
                z = self._post(blk["ib"], z, blk["act"])
                z = depthwise_conv2d(z, blk["dw"]["w"], stride=blk["stride"])
                z = self._post(blk["dw"], z, blk["act"])
                if "se" in blk:
                    g = jnp.mean(z, axis=(1, 2), keepdims=True)
                    g = conv2d(g, blk["se"]["rw"]) + blk["se"]["rb"]
                    g = jnp.maximum(g, 0)
                    g = conv2d(g, blk["se"]["ew"]) + blk["se"]["eb"]
                    z = z * h_sigmoid(g)
                z = conv2d(z, blk["pl"]["w"])
                z = self._post(blk["pl"], z, None)
                y = y + z if blk["residual"] else z

        if net.final_expand_width:
            y = conv2d(y, m["final_expand"]["w"])
            y = self._post(m["final_expand"], y, net.head_act)
            y = jnp.mean(y, axis=(1, 2), keepdims=True)
            y = apply_act(conv2d(y, m["feature_mix"]["w"]), net.head_act)
            y = y[:, 0, 0, :]
        else:
            y = conv2d(y, m["feature_mix"]["w"])
            y = self._post(m["feature_mix"], y, net.head_act)
            y = jnp.mean(y, axis=(1, 2))
        return y @ m["classifier"]["w"] + m["classifier"]["b"]


def get_active_cls_subnet(net, params, state, arch: ClsArch, *,
                          fold_bn: bool = True) -> StaticClsSubnet:
    return StaticClsSubnet(net, params, state, arch, fold_bn=fold_bn)
