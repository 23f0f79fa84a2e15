"""Closed-form FLOPs/params for subnets + the block-LUT FLOPs table.

Reference: the conv-only closed-form formulas special-cased on pixel_d
(imagenet_codebase/utils/pytorch_utils.py:72-124, valid only for singleton
nets — returns -1 otherwise) and the measured per-block LUT
(tutorial/flops_table.py:21-227). Here the closed form is general: any
(ks, e, d, pixel_d) subnet, computed from shapes. FLOPs = 2 * MACs... the
reference counts MACs (delta_ops = weight-ops per position); we report MACs
to match its published numbers and call the field 'flops' like it does.
"""

from __future__ import annotations

import numpy as np

from ..models.arch import SearchSpace, SubnetConfig


def _conv_macs(h, w, cin, cout, k, groups=1):
    return h * w * (cin // groups) * cout * k * k


def count_params(tree):
    import jax
    return sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(tree))


def s4_subnet_params(cfg: SubnetConfig, space: SearchSpace, conv_ks=5):
    """Parameter count of a materialized S4 subnet (mirrors the closed form
    at pytorch_utils.py:72-95, generalized)."""
    w = space.width
    p = conv_ks * conv_ks * 3 * w + 2 * w  # first conv + BN
    bi = 0
    for si in range(space.n_stages):
        for i in range(space.max_depth):
            if i < cfg.d[si]:
                mid = space.mid_channels(cfg.e[bi])
                k = cfg.ks[bi]
                p += w * mid + 2 * mid            # ib + BN
                p += k * k * mid + 2 * mid        # dw + BN
                p += mid * w + 2 * w              # pl + BN
            bi += 1
    p += 2 * (conv_ks * conv_ks * w * w + 2 * w)  # final convs
    for _ in range(cfg.pixel_d):
        p += conv_ks * conv_ks * w * (4 * w) + 2 * (4 * w)
    p += conv_ks * conv_ks * w * 3 + 2 * 3
    return p


def s4_subnet_flops(cfg: SubnetConfig, space: SearchSpace, hr_size=96,
                    conv_ks=5):
    """MACs of one forward of a materialized S4 subnet at the given HR
    output size (input = hr / 2^pixel_d). `hr_size` may be an int (square)
    or an (H, W) tuple."""
    w = space.width
    hr_h, hr_w = (hr_size, hr_size) if isinstance(hr_size, int) else hr_size
    lh, lw = hr_h // (2 ** cfg.pixel_d), hr_w // (2 ** cfg.pixel_d)
    f = _conv_macs(lh, lw, 3, w, conv_ks)
    bi = 0
    for si in range(space.n_stages):
        for i in range(space.max_depth):
            if i < cfg.d[si]:
                mid = space.mid_channels(cfg.e[bi])
                k = cfg.ks[bi]
                f += _conv_macs(lh, lw, w, mid, 1)
                f += _conv_macs(lh, lw, mid, mid, k, groups=mid)
                f += _conv_macs(lh, lw, mid, w, 1)
            bi += 1
    f += 2 * _conv_macs(lh, lw, w, w, conv_ks)
    hh, ww = lh, lw
    for _ in range(cfg.pixel_d):
        f += _conv_macs(hh, ww, w, 4 * w, conv_ks)
        hh *= 2
        ww *= 2
    f += _conv_macs(hh, ww, w, 3, conv_ks)
    return f


def cls_subnet_flops(net, arch, image_size=224):
    """MACs of a classification subnet (net: ElasticClassifierNet),
    honoring runtime elastic width (arch.wid) via the same
    active_block_channels widths the forward executes."""
    from ..utils.common import make_divisible
    wid = (len(net.width_mult_list) - 1 if getattr(arch, "wid", None) is None
           else arch.wid)
    ins, outs = net.active_block_channels(wid)
    fw = net.first_conv_widths[wid]
    fbo = net.first_block_outs[wid]
    fm_w = net.feature_mix_widths[wid]
    hw = image_size // 2
    f = _conv_macs(hw, hw, 3, fw, 3)
    # first block (e1, k3)
    f += _conv_macs(hw, hw, fw, fw, 3, groups=fw)
    f += _conv_macs(hw, hw, fw, fbo, 1)
    bi = 0
    for si, spec in enumerate(net.stage_specs):
        for i in range(spec.n_block):
            in_ch, out_ch = ins[bi], outs[bi]
            stride = spec.stride if i == 0 else 1
            if i < arch.d[si] or i == 0:
                mid = make_divisible(round(in_ch * arch.e[bi]), 8)
                k = arch.ks[bi]
                f += _conv_macs(hw, hw, in_ch, mid, 1)
                hw2 = hw // stride
                f += _conv_macs(hw2, hw2, mid, mid, k, groups=mid)
                if spec.se:
                    se_mid = make_divisible(mid // 4, 8)
                    f += mid * se_mid * 2
                f += _conv_macs(hw2, hw2, mid, out_ch, 1)
            if i == 0:
                hw //= stride
            bi += 1
    last_w = outs[-1]
    if net.final_expand_width:
        f += _conv_macs(hw, hw, last_w, net.final_expand_width, 1)
        f += net.final_expand_width * net.feature_mix_width
        f += net.feature_mix_width * net.n_classes
    else:
        f += _conv_macs(hw, hw, last_w, fm_w, 1)
        f += fm_w * net.n_classes
    return f


class FLOPsTable:
    """Per-dimension LUT (reference FLOPsTable builds one by measuring each
    block; the closed form above makes measuring unnecessary, so the table
    precomputes it per (stage, block, ks, e) for O(1) predict_efficiency)."""

    def __init__(self, space: SearchSpace, hr_size=96, conv_ks=5):
        self.space = space
        self.hr_size = hr_size
        self.conv_ks = conv_ks
        self._block_macs = {}
        for pd in space.pixel_d_list:
            lr = hr_size // (2 ** pd)
            for k in space.ks_list:
                for e in space.expand_list:
                    mid = space.mid_channels(e)
                    w = space.width
                    self._block_macs[(pd, k, e)] = (
                        _conv_macs(lr, lr, w, mid, 1)
                        + _conv_macs(lr, lr, mid, mid, k, groups=mid)
                        + _conv_macs(lr, lr, mid, w, 1))

    def predict_efficiency(self, cfg: SubnetConfig):
        sp = self.space
        lr = self.hr_size // (2 ** cfg.pixel_d)
        w, ck = sp.width, self.conv_ks
        f = _conv_macs(lr, lr, 3, w, ck)
        bi = 0
        for si in range(sp.n_stages):
            for i in range(sp.max_depth):
                if i < cfg.d[si]:
                    f += self._block_macs[(cfg.pixel_d, cfg.ks[bi], cfg.e[bi])]
                bi += 1
        f += 2 * _conv_macs(lr, lr, w, w, ck)
        hw = lr
        for _ in range(cfg.pixel_d):
            f += _conv_macs(hw, hw, w, 4 * w, ck)
            hw *= 2
        f += _conv_macs(hw, hw, w, 3, ck)
        return f
