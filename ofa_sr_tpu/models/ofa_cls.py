"""Elastic classification supernets — the upstream OFA ImageNet universe.

OFAMobileNetV3 (reference ofa/elastic_nn/networks/ofa_mbv3.py:16-140):
3x3 s2 conv 3->16 h_swish -> static e1-k3 MBConv(16->16, relu, identity
shortcut) -> 5 elastic stages (widths 24/40/80/112/160, strides 2/2/2/1/2,
acts relu/relu/h_swish/h_swish/h_swish, SE on stages 2,4,5) of up-to-4
elastic MBConv blocks -> 1x1 160->960 (+BN, h_swish) -> global avg pool ->
1x1 960->1280 (no BN, h_swish) -> dropout -> linear classifier.

OFAProxylessNASNets (ofa_proxyless.py:16-160): 3x3 s2 conv 3->32 relu6 ->
e1 block 32->16 -> 6 elastic stages (widths 24/40/80/96/192/320, strides
2/2/2/1/2/1, relu6, no SE; last stage 1 block) -> 1x1 320->1280 (+BN,
relu6) -> pool -> classifier.

Same masked-execution design as the SR nets: one compiled program serves all
(ks, e, d) subnets; `width_mult` scales stage widths at construction
(make_divisible(w*mult, 8)) — the reference never samples width at runtime
(sample_active_subnet sets width_mult_setting=None, ofa_mbv3.py:335).
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.activations import apply_act
from ..ops.conv import conv2d, conv_init, depthwise_conv2d, depthwise_conv_init
from ..ops.elastic import channel_mask
from ..ops.norm import batch_norm, bn_init
from ..utils.common import int2list, make_divisible
from .arch import SearchSpace
from .layers import mbconv_apply, mbconv_init


@dataclasses.dataclass(frozen=True)
class StageSpec:
    width: int
    stride: int
    act: str
    se: bool
    n_block: int


@dataclasses.dataclass(frozen=True)
class ClsArch:
    """A sampled classification subnet: ks/e per elastic block, depth per
    stage (pixel_d has no meaning here). `wid` indexes width_mult_list
    (runtime elastic width, ofa_mbv3.py:215-216); None = max width — the
    reference's own sampler always returns wid=None (ofa_mbv3.py:257-258)."""
    ks: tuple
    e: tuple
    d: tuple
    wid: Optional[int] = None

    def describe(self):
        s = "ks%s_e%s_d%s" % (list(self.ks), list(self.e), list(self.d))
        if self.wid is not None:
            s += "_w%d" % self.wid
        return s


class ElasticClassifierNet:
    def __init__(self, *, n_classes=1000, stage_specs: Sequence[StageSpec],
                 first_conv_width, first_conv_act, first_block_act,
                 final_expand_width=None, feature_mix_width=1280,
                 head_act="h_swish", ks_list=(3, 5, 7), expand_list=(3, 4, 6),
                 depth_list=(2, 3, 4), dropout_rate=0.1, bn_momentum=0.1,
                 bn_eps=1e-5, use_transform=True, width_mult=1.0,
                 width_mult_list=None, head_width_mode="mbv3"):
        # width_mult_list with >1 entries = runtime elastic width: weights
        # live at max width, arch['wid'] selects the active widths per
        # forward (ofa_mbv3.py:19-71; wid slot ofa_mbv3.py:215-216)
        wml = sorted(width_mult_list) if width_mult_list else [width_mult]
        self.width_mult_list = wml
        self.space = SearchSpace(ks_list=list(ks_list),
                                 expand_list=list(expand_list),
                                 depth_list=list(depth_list),
                                 pixel_d_list=[1],
                                 n_stages=len(stage_specs),
                                 width=first_conv_width)
        # per-entity width lists indexed by wid (width_list, ofa_mbv3.py:50-53)
        self.stage_width_lists = [
            [make_divisible(sp.width * wm, 8) for wm in wml]
            for sp in stage_specs]
        self.stage_specs = [dataclasses.replace(sp, width=max(wl))
                            for sp, wl in zip(stage_specs,
                                              self.stage_width_lists)]
        self.first_conv_widths = [make_divisible(first_conv_width * wm, 8)
                                  for wm in wml]
        self.first_conv_width = max(self.first_conv_widths)
        self.first_conv_act = first_conv_act
        self.first_block_act = first_block_act
        if head_width_mode == "mbv3":
            # MBV3 scales both head widths by max(width_mult_list) for every
            # entry — the head is NOT elastic (ofa_mbv3.py:34-39)
            self.final_expand_width = (
                make_divisible(final_expand_width * max(wml), 8)
                if final_expand_width else None)
            self.feature_mix_widths = [
                make_divisible(feature_mix_width * max(wml), 8)] * len(wml)
        else:
            # proxyless last_channel: scaled only when width_mult > 1
            # (ofa_proxyless.py:38-41) — elastic iff some entry exceeds 1.0
            self.final_expand_width = None
            self.feature_mix_widths = [
                make_divisible(feature_mix_width * wm, 8) if wm > 1.0
                else feature_mix_width for wm in wml]
        self.feature_mix_width = max(self.feature_mix_widths)
        self.head_act = head_act
        self.n_classes = n_classes
        self.dropout_rate = dropout_rate
        self.bn_cfg = {"momentum": bn_momentum, "eps": bn_eps}
        self.use_transform = use_transform
        self.n_trunks = 1

    # -- geometry ---------------------------------------------------------------

    @property
    def first_block_outs(self):
        fbo = getattr(self, "_first_block_outs", None)
        if fbo is None:  # nets built directly with a scalar _first_block_out
            fbo = [self._first_block_out] * len(self.width_mult_list)
        return fbo

    @property
    def _elastic_first(self):
        return len(set(self.first_conv_widths)) > 1

    @property
    def _elastic_fb(self):
        return len(set(self.first_block_outs)) > 1

    @property
    def _elastic_stages(self):
        return [len(set(wl)) > 1 for wl in self.stage_width_lists]

    @property
    def _elastic_fm(self):
        return len(set(self.feature_mix_widths)) > 1

    def active_block_channels(self, wid):
        """(in_ch, out_ch) per elastic block at width index `wid` — the
        widths the reference's sliced forward would see (x.size(1) input
        width, dynamic_layers.py:71-76)."""
        ins, outs = [], []
        in_ch = self.first_block_outs[wid]
        for si, sp in enumerate(self.stage_specs):
            w = self.stage_width_lists[si][wid]
            for _ in range(sp.n_block):
                ins.append(in_ch)
                outs.append(w)
                in_ch = w
        return ins, outs

    def block_layout(self):
        """[(in_ch, out_ch, stride, act, se, stage_idx, pos_in_stage)] over
        all elastic blocks, in network order."""
        layout = []
        in_ch = self.first_block_out
        for si, sp in enumerate(self.stage_specs):
            for i in range(sp.n_block):
                layout.append((in_ch, sp.width, sp.stride if i == 0 else 1,
                               sp.act, sp.se, si, i))
                in_ch = sp.width
        return layout

    @property
    def n_blocks(self):
        return sum(sp.n_block for sp in self.stage_specs)

    # -- arch sampling / conversion -----------------------------------------------

    def sample_arch(self, seed=None, ks_candidates=None, expand_candidates=None,
                    depth_candidates=None, wid_candidates=None) -> ClsArch:
        """Reference draw order (ofa_mbv3.py:320-366): (wid,) all ks, all e,
        then per-stage d. The reference sampler never draws wid
        (width_mult_setting=None, ofa_mbv3.py:257-258); pass wid_candidates
        to enable it."""
        if seed is not None:
            random.seed(seed)
        ks_c = ks_candidates or self.space.ks_list
        e_c = expand_candidates or self.space.expand_list
        d_c = depth_candidates or self.space.depth_list
        wid = random.choice(wid_candidates) if wid_candidates else None
        ks = [random.choice(ks_c) for _ in range(self.n_blocks)]
        e = [random.choice(e_c) for _ in range(self.n_blocks)]
        d = [random.choice(d_c) for _ in range(len(self.stage_specs))]
        return ClsArch(tuple(ks), tuple(e), tuple(d), wid)

    def max_arch(self) -> ClsArch:
        sp = self.space
        return ClsArch(tuple([sp.max_ks] * self.n_blocks),
                       tuple([sp.max_expand] * self.n_blocks),
                       tuple([sp.max_depth] * len(self.stage_specs)))

    def arch_to_device(self, a: ClsArch):
        ks_set = list(self.space.ks_list)
        wid = len(self.width_mult_list) - 1 if a.wid is None else a.wid
        ins, outs = self.active_block_channels(wid)
        mids, se_mids = [], []
        for in_ch, e in zip(ins, a.e):
            mid = make_divisible(round(in_ch * e), 8)
            mids.append(mid)
            se_mids.append(make_divisible(mid // 4, 8))
        return {
            "ks_idx": jnp.asarray([ks_set.index(k) for k in a.ks], jnp.int32),
            "mid": jnp.asarray(mids, jnp.int32),
            "se_mid": jnp.asarray(se_mids, jnp.int32),
            "depth": jnp.asarray(a.d, jnp.int32),
            # runtime elastic width (unused structurally when every width
            # list is a singleton)
            "out_ch": jnp.asarray(outs, jnp.int32),
            "first_w": jnp.asarray(self.first_conv_widths[wid], jnp.int32),
            "fb_out": jnp.asarray(self.first_block_outs[wid], jnp.int32),
            "fm_w": jnp.asarray(self.feature_mix_widths[wid], jnp.int32),
        }

    # -- init -------------------------------------------------------------------

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, self.n_blocks + 8)
        ki = iter(range(len(keys)))
        p, s = {}, {}

        # first conv 3->w s2
        w0 = self.first_conv_width
        bn_p, bn_s = bn_init(w0, dtype)
        p["first_conv"] = {"conv": {"w": conv_init(keys[next(ki)], 3, 3, w0, dtype)},
                           "bn": bn_p}
        s["first_conv"] = {"bn": bn_s}

        # static e1-k3 first block: depthwise(w0) + BN + act + 1x1 + BN
        bn1p, bn1s = bn_init(w0, dtype)
        bn2p, bn2s = bn_init(self.first_block_out, dtype)
        p["first_block"] = {
            "dw": {"w": depthwise_conv_init(keys[next(ki)], 3, w0, dtype), "bn": bn1p},
            "pl": {"w": conv_init(keys[next(ki)], 1, w0, self.first_block_out, dtype),
                   "bn": bn2p},
        }
        s["first_block"] = {"dw": {"bn": bn1s}, "pl": {"bn": bn2s}}

        blocks_p, blocks_s = [], []
        for (in_ch, out_ch, stride, act, se, _, _) in self.block_layout():
            bp, bs = mbconv_init(keys[next(ki)], self.space, dtype,
                                 self.use_transform, in_ch=in_ch,
                                 out_ch=out_ch, use_se=se)
            blocks_p.append(bp)
            blocks_s.append(bs)
        p["blocks"], s["blocks"] = blocks_p, blocks_s

        last_w = self.stage_specs[-1].width
        if self.final_expand_width:
            bn_p, bn_s = bn_init(self.final_expand_width, dtype)
            p["final_expand"] = {"conv": {"w": conv_init(
                keys[next(ki)], 1, last_w, self.final_expand_width, dtype)},
                "bn": bn_p}
            s["final_expand"] = {"bn": bn_s}
            mix_in = self.final_expand_width
            # feature_mix: 1x1, no BN (ofa_mbv3.py:104-107)
            p["feature_mix"] = {"conv": {"w": conv_init(
                keys[next(ki)], 1, mix_in, self.feature_mix_width, dtype)}}
        else:
            # proxyless head: 1x1 conv + BN then pool
            bn_p, bn_s = bn_init(self.feature_mix_width, dtype)
            p["feature_mix"] = {"conv": {"w": conv_init(
                keys[next(ki)], 1, last_w, self.feature_mix_width, dtype)},
                "bn": bn_p}
            s["feature_mix"] = {"bn": bn_s}

        # classifier (torch Linear init: U(-1/sqrt(in), 1/sqrt(in)))
        kin = self.feature_mix_width
        stdv = 1.0 / (kin ** 0.5)
        p["classifier"] = {
            "w": jax.random.uniform(keys[next(ki)], (kin, self.n_classes),
                                    dtype, -stdv, stdv),
            "b": jnp.zeros((self.n_classes,), dtype),
        }
        return p, s

    @property
    def first_block_out(self):
        # MBV3's first block keeps width (16->16); proxyless narrows 32->16 —
        # expressed as stage_specs[0] input channel in block_layout, so the
        # first *elastic* stage input == first_block_out.
        return max(self.first_block_outs)

    # -- forward ----------------------------------------------------------------

    def apply(self, params, state, x, arch, *, training=False,
              bn_training=None, dropout_rng=None, remat=False):
        bnt = bool(training if bn_training is None else bn_training)
        bn_cfg = self.bn_cfg
        new_s = {}

        # elastic-width masks (None wherever the width list is a singleton,
        # keeping the compiled program identical to the fixed-width one)
        fc_mask = (channel_mask(arch["first_w"], self.first_conv_width)
                   if self._elastic_first else None)
        fb_mask = (channel_mask(arch["fb_out"], self.first_block_out)
                   if self._elastic_fb else None)

        y = conv2d(x, params["first_conv"]["conv"]["w"], stride=2)
        y, bns = batch_norm(y, params["first_conv"]["bn"],
                            state["first_conv"]["bn"], training=bnt,
                            mask=fc_mask, **bn_cfg)
        y = apply_act(y, self.first_conv_act)
        new_s["first_conv"] = {"bn": bns}

        fb = params["first_block"]
        h = depthwise_conv2d(y, fb["dw"]["w"])
        h, bn1 = batch_norm(h, fb["dw"]["bn"], state["first_block"]["dw"]["bn"],
                            training=bnt, mask=fc_mask, **bn_cfg)
        h = apply_act(h, self.first_block_act)
        h = conv2d(h, fb["pl"]["w"])
        h, bn2 = batch_norm(h, fb["pl"]["bn"], state["first_block"]["pl"]["bn"],
                            training=bnt, mask=fb_mask, **bn_cfg)
        if self.first_block_out == self.first_conv_width:
            y = y + h  # identity shortcut (MBV3)
        else:
            y = h      # proxyless narrows: no shortcut
        new_s["first_block"] = {"dw": {"bn": bn1}, "pl": {"bn": bn2}}

        def block_fn(bp, bs, xx, k_i, m_i, sm_i, o_i, stride, act,
                     elastic_out):
            return mbconv_apply(bp, bs, xx, self.space, k_i, m_i,
                                act=act, training=bnt, bn_cfg=bn_cfg,
                                stride=stride, se_mid=sm_i,
                                out_ch=o_i if elastic_out else None,
                                ks_switch=getattr(self, "ks_switch", False),
                                dw_switch=getattr(self, "dw_switch", False),
                                dw_opts=getattr(self, "dw_opts", None))

        if remat:
            block_fn = jax.checkpoint(block_fn, static_argnums=(7, 8, 9))

        elastic_stages = self._elastic_stages
        blocks_new_s = []
        bi = 0
        for si, spc in enumerate(self.stage_specs):
            depth = arch["depth"][si]
            for i in range(spc.n_block):
                bp, bs = params["blocks"][bi], state["blocks"][bi]
                out, ns = block_fn(bp, bs, y, arch["ks_idx"][bi],
                                   arch["mid"][bi], arch["se_mid"][bi],
                                   arch["out_ch"][bi],
                                   spc.stride if i == 0 else 1, spc.act,
                                   elastic_stages[si])
                if i == 0:
                    # first block of a stage always runs (depth >= 1); no
                    # residual (stride/width change)
                    y = out
                else:
                    gate = i < depth
                    y = jnp.where(gate, out + y, y)
                    ns = jax.tree.map(lambda a, b: jnp.where(gate, a, b), ns, bs)
                blocks_new_s.append(ns)
                bi += 1
        new_s["blocks"] = blocks_new_s

        if self.final_expand_width:
            y = conv2d(y, params["final_expand"]["conv"]["w"])
            y, bns = batch_norm(y, params["final_expand"]["bn"],
                                state["final_expand"]["bn"], training=bnt,
                                **bn_cfg)
            y = apply_act(y, self.head_act)
            new_s["final_expand"] = {"bn": bns}
            y = jnp.mean(y, axis=(1, 2), keepdims=True)  # ofa_mbv3.py:156
            y = conv2d(y, params["feature_mix"]["conv"]["w"])
            y = apply_act(y, self.head_act)
            y = y[:, 0, 0, :]
        else:
            fm_mask = (channel_mask(arch["fm_w"], self.feature_mix_width)
                       if self._elastic_fm else None)
            y = conv2d(y, params["feature_mix"]["conv"]["w"])
            y, bns = batch_norm(y, params["feature_mix"]["bn"],
                                state["feature_mix"]["bn"], training=bnt,
                                mask=fm_mask, **bn_cfg)
            y = apply_act(y, self.head_act)
            if fm_mask is not None:
                y = y * fm_mask  # elastic classifier input == sliced weight
            new_s["feature_mix"] = {"bn": bns}
            y = jnp.mean(y, axis=(1, 2))  # ofa_proxyless.py:156

        if training and self.dropout_rate > 0 and dropout_rng is not None:
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(dropout_rng, keep, y.shape)
            y = jnp.where(mask, y / keep, 0.0)
        logits = y @ params["classifier"]["w"] + params["classifier"]["b"]
        return logits, new_s


def OFAMobileNetV3(n_classes=1000, ks_list=(3, 5, 7), expand_list=(3, 4, 6),
                   depth_list=(2, 3, 4), width_mult=1.0, dropout_rate=0.1,
                   bn_momentum=0.1, bn_eps=1e-5, use_transform=True,
                   width_mult_list=None):
    net = ElasticClassifierNet(
        n_classes=n_classes,
        stage_specs=[
            StageSpec(24, 2, "relu", False, max(depth_list)),
            StageSpec(40, 2, "relu", True, max(depth_list)),
            StageSpec(80, 2, "h_swish", False, max(depth_list)),
            StageSpec(112, 1, "h_swish", True, max(depth_list)),
            StageSpec(160, 2, "h_swish", True, max(depth_list)),
        ],
        first_conv_width=16, first_conv_act="h_swish", first_block_act="relu",
        final_expand_width=960, feature_mix_width=1280, head_act="h_swish",
        ks_list=ks_list, expand_list=expand_list, depth_list=depth_list,
        dropout_rate=dropout_rate, bn_momentum=bn_momentum, bn_eps=bn_eps,
        use_transform=use_transform, width_mult=width_mult,
        width_mult_list=width_mult_list, head_width_mode="mbv3")
    # MBV3's first block keeps the first-conv width (ofa_mbv3.py:57-72)
    net._first_block_outs = list(net.first_conv_widths)
    return net


def OFAProxylessNASNets(n_classes=1000, ks_list=(3, 5, 7),
                        expand_list=(3, 4, 6), depth_list=(2, 3, 4),
                        width_mult=1.0, dropout_rate=0.1, bn_momentum=0.1,
                        bn_eps=1e-3, use_transform=True,
                        width_mult_list=None):
    md = max(depth_list)
    net = ElasticClassifierNet(
        n_classes=n_classes,
        stage_specs=[
            StageSpec(24, 2, "relu6", False, md),
            StageSpec(40, 2, "relu6", False, md),
            StageSpec(80, 2, "relu6", False, md),
            StageSpec(96, 1, "relu6", False, md),
            StageSpec(192, 2, "relu6", False, md),
            StageSpec(320, 1, "relu6", False, 1),
        ],
        first_conv_width=32, first_conv_act="relu6", first_block_act="relu6",
        final_expand_width=None, feature_mix_width=1280, head_act="relu6",
        ks_list=ks_list, expand_list=expand_list, depth_list=depth_list,
        dropout_rate=dropout_rate, bn_momentum=bn_momentum, bn_eps=bn_eps,
        use_transform=use_transform, width_mult=width_mult,
        width_mult_list=width_mult_list, head_width_mode="proxyless")
    # proxyless first block narrows 32->16 (first_block_width,
    # ofa_proxyless.py:37)
    net._first_block_outs = [make_divisible(16 * wm, 8)
                             for wm in net.width_mult_list]
    return net
