"""OFAMobileNetS4 — the decoder-only 2x/4x super-resolution supernet.

Topology (reference ofa/elastic_nn/networks/ofa_mbs4.py:36-133, forward at
:142-178): 5x5 conv 3->64 -> long-skip save -> 4 elastic stages of up to
max_depth MBConv(64->64, relu6, identity shortcut) -> two 5x5 convs 64->64
with the long skip added after the first -> pixelshuffle head: `pixel_d`
blocks of [5x5 conv 64->256, BN, PixelShuffle(2)] -> 5x5 conv 64->3 (+BN).

pixel_d=1 gives 2x SR, pixel_d=2 gives 4x SR; the input is the matching
bicubic-downscaled image (progressive_shrinking.py:177-180).

TPU design: a single jitted masked-execution program serves all (ks, e, d)
subnets; `pixel_d` changes intermediate shapes, so it is a *static* argument
here — the train step wraps the two variants in `lax.cond` (SURVEY.md §7.0).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.elastic import spatial_valid_mask
from .arch import SearchSpace, SubnetConfig, max_subnet
from .layers import (
    conv_layer_apply,
    conv_layer_init,
    mbconv_init,
    residual_stage_apply,
)


class OFAMobileNetS4:
    """Functional supernet: `init` -> (params, state); `apply` is pure."""

    CONV_KS = 5           # all static convs are 5x5 (ofa_mbs4.py:65,105,113,123)
    IN_CH = 3

    def __init__(self, space: Optional[SearchSpace] = None,
                 bn_momentum=0.1, bn_eps=1e-5, use_transform=True,
                 icnr=False):
        self.space = space or SearchSpace()
        self.bn_cfg = {"momentum": bn_momentum, "eps": bn_eps}
        self.use_transform = use_transform
        self.n_trunks = 1
        # conv 64->256 before each PixelShuffle(2) (ofa_mbs4.py:37: width 256
        # = 4x trunk width so the shuffle lands back on the trunk width)
        self.shuffle_width = 4 * self.space.width
        # checkerboard-free sub-pixel init for the shuffle head
        # (ops/conv.icnr_conv_init); off by default = reference he_fout
        self.icnr = icnr

    # -- init ---------------------------------------------------------------

    def init(self, key, dtype=jnp.float32):
        sp = self.space
        n_mb = sp.blocks_per_trunk
        n_shuffle = max(sp.pixel_d_list)
        keys = jax.random.split(key, n_mb + n_shuffle + 4)
        ki = iter(range(len(keys)))

        p, s = {}, {}
        p["dec_first_conv_block"], s["dec_first_conv_block"] = conv_layer_init(
            keys[next(ki)], self.IN_CH, sp.width, self.CONV_KS, dtype)

        blocks_p, blocks_s = [], []
        for _ in range(n_mb):
            bp, bs = mbconv_init(keys[next(ki)], sp, dtype, self.use_transform)
            blocks_p.append(bp)
            blocks_s.append(bs)
        p["blocks"], s["blocks"] = blocks_p, blocks_s

        fin_p, fin_s = [], []
        for _ in range(2):
            lp, ls = conv_layer_init(keys[next(ki)], sp.width, sp.width, self.CONV_KS, dtype)
            fin_p.append(lp)
            fin_s.append(ls)
        p["dec_final_conv_blocks"], s["dec_final_conv_blocks"] = fin_p, fin_s

        shuf_p, shuf_s = [], []
        for _ in range(n_shuffle):
            k_sh = keys[next(ki)]
            lp, ls = conv_layer_init(k_sh, sp.width, self.shuffle_width, self.CONV_KS, dtype)
            if self.icnr:
                from ..ops.conv import icnr_conv_init
                lp["conv"]["w"] = icnr_conv_init(
                    k_sh, self.CONV_KS, sp.width, self.shuffle_width, r=2,
                    dtype=dtype)
            shuf_p.append(lp)
            shuf_s.append(ls)
        p["shuffle_blocks"], s["shuffle_blocks"] = shuf_p, shuf_s

        p["dec_final_output_conv_block"], s["dec_final_output_conv_block"] = conv_layer_init(
            keys[next(ki)], sp.width, self.IN_CH, self.CONV_KS, dtype)
        return p, s

    # -- forward ------------------------------------------------------------

    def apply(self, params, state, x, arch, *, pixel_d: int,
              training: bool = False, bn_training: Optional[bool] = None,
              remat: bool = False, valid_hw=None):
        """Forward the decoder. `arch` is a SubnetConfig.to_device() pytree
        (its 'pixel_d' entry is ignored here — pixel_d must be static).

        `bn_training=False` with `training=True` reproduces the SR trainer's
        frozen-BN mode (sr_run_manager.py:416-423).

        `valid_hw`: optional traced (h, w) of the real frame inside a
        zero-padded bucket input (shape-bucketed eval, SURVEY.md §5.7). The
        pad region is re-zeroed before every spatial conv, making the valid
        region bitwise identical to the unpadded execution. Eval-mode only
        (training BN moments would include pad pixels).
        """
        sp = self.space
        if bn_training is None:
            bn_training = training
        bnt = bool(bn_training)
        new_s = {}

        smask = None
        if valid_hw is not None:
            assert not bnt, "bucketed eval is eval-mode only"
            smask = spatial_valid_mask(valid_hw[0], valid_hw[1],
                                       x.shape[1], x.shape[2], x.dtype)

        def masked(t, m):
            return t if m is None else t * m

        x, new_s["dec_first_conv_block"] = conv_layer_apply(
            params["dec_first_conv_block"], state["dec_first_conv_block"], x,
            act=None, training=bnt, bn_cfg=self.bn_cfg)
        x = masked(x, smask)

        dec_big_skip = x

        # s2d trunk execution (ops/s2d.py): one relayout in, one out — the
        # residual adds and all block math run in the (H/2, W/2, 4C) layout
        use_s2d = (getattr(self, 's2d', False) and smask is None
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_s2d:
            from ..ops.s2d import s2d as to_s2d, un_s2d
            x = to_s2d(x)

        blocks_new_s = []
        d_max = sp.max_depth
        for stage in range(sp.n_stages):
            lo, hi = stage * d_max, (stage + 1) * d_max
            x, stage_s = residual_stage_apply(
                params["blocks"][lo:hi], state["blocks"][lo:hi], x, sp,
                arch["ks_idx"][lo:hi], arch["mid"][lo:hi], arch["depth"][stage],
                act="relu6", training=bnt, bn_cfg=self.bn_cfg, remat=remat,
                expand_switch=getattr(self, 'expand_switch', False),
                ks_switch=getattr(self, 'ks_switch', False),
                dw_switch=getattr(self, 'dw_switch', False),
                dw_opts=getattr(self, 'dw_opts', None),
                spatial_mask=smask, s2d=use_s2d)
            blocks_new_s.extend(stage_s)
        new_s["blocks"] = blocks_new_s
        if use_s2d:
            x = un_s2d(x)
        x = masked(x, smask)  # point-linear BN bias leaked into the pad

        fin_s = []
        for i in range(2):
            x, ls = conv_layer_apply(
                params["dec_final_conv_blocks"][i], state["dec_final_conv_blocks"][i],
                x, act=None, training=bnt, bn_cfg=self.bn_cfg)
            x = masked(x, smask)
            fin_s.append(ls)
            if i == 0:
                x = x + dec_big_skip
        new_s["dec_final_conv_blocks"] = fin_s

        shuf_s = list(state["shuffle_blocks"])
        for i in range(pixel_d):
            x, shuf_s[i] = conv_layer_apply(
                params["shuffle_blocks"][i], state["shuffle_blocks"][i], x,
                act=None, shuffle="shuffle", training=bnt, bn_cfg=self.bn_cfg)
            if smask is not None:
                # resolution doubled: rebuild the mask at the new shape
                smask = spatial_valid_mask(
                    valid_hw[0] * 2 ** (i + 1), valid_hw[1] * 2 ** (i + 1),
                    x.shape[1], x.shape[2], x.dtype)
                x = x * smask
        new_s["shuffle_blocks"] = shuf_s

        x, new_s["dec_final_output_conv_block"] = conv_layer_apply(
            params["dec_final_output_conv_block"], state["dec_final_output_conv_block"],
            x, act=None, training=bnt, bn_cfg=self.bn_cfg)
        x = masked(x, smask)
        return x, new_s

    # -- conveniences ---------------------------------------------------------

    def max_arch(self) -> SubnetConfig:
        return max_subnet(self.space, self.n_trunks)

    def scale_factor(self, pixel_d: int) -> int:
        return 2 ** pixel_d
