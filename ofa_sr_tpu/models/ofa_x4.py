"""OFAMobileNetX4 — joint learned-downscale + super-resolution autoencoder.

Topology (reference ofa/elastic_nn/networks/ofa_mbx4.py:36-260):

encoder: [3x3 conv 3->16 + PixelUnshuffle(2)] x pixel_d (the second unshuffle
block is 3x3 conv 64->16 + unshuffle; block_group_info[0]=[0,1] so pixel_d
selects 1 or 2 unshuffle stages = 2x or 4x downscale) -> big-skip save ->
4 elastic MBConv(64) stages -> three 3x3 convs 64->64, 64->64 (skip added
after the first), 64->3: a 3-channel learned downscaled image.

decoder: mirrors OFAMobileNetS4 with 3x3 static convs: conv 3->64 -> skip ->
4 elastic stages -> convs 64->64 x2 (+skip) -> pixel_d x [conv 64->256 +
PixelShuffle(2)] -> conv 64->3.

The same `pixel_d` drives both heads (set_active_subnet inserts it at
positions 0 and -1 of the depth list, ofa_mbx4.py:360-376).

Modes (replacing the reference's comment toggles, SURVEY.md §7.3 quirk 6):
- 'autoencoder': full encoder+decoder on an HR input (oracle/codec task).
- 'sr': decoder only, on a bicubic-downscaled input — how the DIV2K
  supernet that produced the README numbers was actually trained.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .arch import SearchSpace, SubnetConfig, max_subnet
from .layers import (
    conv_layer_apply,
    conv_layer_init,
    mbconv_init,
    residual_stage_apply,
)


class OFAMobileNetX4:
    CONV_KS = 3           # all static convs are 3x3 (ofa_mbx4.py:66-67,...)
    IN_CH = 3

    def __init__(self, space: Optional[SearchSpace] = None,
                 bn_momentum=0.1, bn_eps=1e-5, use_transform=True,
                 icnr=False):
        self.space = space or SearchSpace()
        self.bn_cfg = {"momentum": bn_momentum, "eps": bn_eps}
        self.use_transform = use_transform
        self.n_trunks = 2  # encoder trunk then decoder trunk
        # shuffle conv widens 4x so PixelShuffle(2) lands back on the trunk
        # width; unshuffle conv narrows 4x so PixelUnshuffle(2) does too
        # (ofa_mbx4.py:36: widths 256 and 16 for trunk width 64)
        self.shuffle_width = 4 * self.space.width
        self.unshuffle_width = self.space.width // 4
        # checkerboard-free sub-pixel init for the decoder shuffle head
        # (ops/conv.icnr_conv_init); off by default = reference he_fout
        self.icnr = icnr

    # -- init ---------------------------------------------------------------

    def init(self, key, dtype=jnp.float32):
        sp = self.space
        n_mb = sp.blocks_per_trunk
        n_pix = max(sp.pixel_d_list)
        n_keys = 2 * n_mb + 2 * n_pix + 8
        keys = jax.random.split(key, n_keys)
        ki = iter(range(n_keys))
        w = sp.width

        p, s = {}, {}

        # encoder unshuffle blocks: conv 3->16 (+unshuffle) then conv 64->16
        unshuf_p, unshuf_s = [], []
        in_chs = [self.IN_CH, self.unshuffle_width * 4]
        for i in range(n_pix):
            lp, ls = conv_layer_init(keys[next(ki)], in_chs[i],
                                     self.unshuffle_width, self.CONV_KS, dtype)
            unshuf_p.append(lp)
            unshuf_s.append(ls)
        p["enc_unshuffle_blocks"], s["enc_unshuffle_blocks"] = unshuf_p, unshuf_s

        def trunk():
            bp, bs = [], []
            for _ in range(n_mb):
                a, b = mbconv_init(keys[next(ki)], sp, dtype, self.use_transform)
                bp.append(a)
                bs.append(b)
            return bp, bs

        p["enc_blocks"], s["enc_blocks"] = trunk()

        # encoder final convs: 64->64, 64->64, 64->3 (ofa_mbx4.py:95-110)
        enc_fin_p, enc_fin_s = [], []
        for out_ch in (w, w, self.IN_CH):
            lp, ls = conv_layer_init(keys[next(ki)], w, out_ch, self.CONV_KS, dtype)
            enc_fin_p.append(lp)
            enc_fin_s.append(ls)
        p["enc_final_conv_blocks"], s["enc_final_conv_blocks"] = enc_fin_p, enc_fin_s

        p["dec_first_conv_block"], s["dec_first_conv_block"] = conv_layer_init(
            keys[next(ki)], self.IN_CH, w, self.CONV_KS, dtype)

        p["dec_blocks"], s["dec_blocks"] = trunk()

        dec_fin_p, dec_fin_s = [], []
        for _ in range(2):
            lp, ls = conv_layer_init(keys[next(ki)], w, w, self.CONV_KS, dtype)
            dec_fin_p.append(lp)
            dec_fin_s.append(ls)
        p["dec_final_conv_blocks"], s["dec_final_conv_blocks"] = dec_fin_p, dec_fin_s

        shuf_p, shuf_s = [], []
        for _ in range(n_pix):
            k_sh = keys[next(ki)]
            lp, ls = conv_layer_init(k_sh, w, self.shuffle_width, self.CONV_KS, dtype)
            if self.icnr:
                from ..ops.conv import icnr_conv_init
                lp["conv"]["w"] = icnr_conv_init(
                    k_sh, self.CONV_KS, w, self.shuffle_width, r=2,
                    dtype=dtype)
            shuf_p.append(lp)
            shuf_s.append(ls)
        p["shuffle_blocks"], s["shuffle_blocks"] = shuf_p, shuf_s

        p["dec_final_output_conv_block"], s["dec_final_output_conv_block"] = conv_layer_init(
            keys[next(ki)], w, self.IN_CH, self.CONV_KS, dtype)
        return p, s

    # -- forward pieces -------------------------------------------------------

    def _trunk(self, blocks_p, blocks_s, x, arch, trunk_idx, bnt, remat=False,
               spatial_mask=None):
        sp = self.space
        d_max = sp.max_depth
        base_b = trunk_idx * sp.blocks_per_trunk
        base_s = trunk_idx * sp.n_stages
        new_states = []
        for stage in range(sp.n_stages):
            lo, hi = stage * d_max, (stage + 1) * d_max
            x, stage_s = residual_stage_apply(
                blocks_p[lo:hi], blocks_s[lo:hi], x, sp,
                arch["ks_idx"][base_b + lo:base_b + hi],
                arch["mid"][base_b + lo:base_b + hi],
                arch["depth"][base_s + stage],
                act="relu6", training=bnt, bn_cfg=self.bn_cfg, remat=remat,
                expand_switch=getattr(self, 'expand_switch', False),
                ks_switch=getattr(self, 'ks_switch', False),
                dw_switch=getattr(self, 'dw_switch', False),
                dw_opts=getattr(self, 'dw_opts', None),
                spatial_mask=spatial_mask)
            new_states.extend(stage_s)
        return x, new_states

    def encode(self, params, state, x, arch, *, pixel_d: int,
               training: bool = False, bn_training: Optional[bool] = None,
               remat: bool = False, valid_hw=None):
        """HR image -> 3-channel learned downscaled image (2^pixel_d smaller).

        `valid_hw`: shape-bucketed eval masking at the HR input resolution
        (see OFAMobileNetS4.apply); each unshuffle halves the valid region."""
        from ..ops.elastic import spatial_valid_mask
        bnt = bool(training if bn_training is None else bn_training)
        new_s = {}

        smask = None
        if valid_hw is not None:
            assert not bnt, "bucketed eval is eval-mode only"

        unshuf_s = list(state["enc_unshuffle_blocks"])
        for i in range(pixel_d):
            x, unshuf_s[i] = conv_layer_apply(
                params["enc_unshuffle_blocks"][i], state["enc_unshuffle_blocks"][i],
                x, act=None, shuffle="unshuffle", training=bnt, bn_cfg=self.bn_cfg)
            if valid_hw is not None:
                smask = spatial_valid_mask(
                    valid_hw[0] // 2 ** (i + 1), valid_hw[1] // 2 ** (i + 1),
                    x.shape[1], x.shape[2], x.dtype)
                x = x * smask
        new_s["enc_unshuffle_blocks"] = unshuf_s

        enc_big_skip = x
        x, new_s["enc_blocks"] = self._trunk(
            params["enc_blocks"], state["enc_blocks"], x, arch, 0, bnt, remat,
            spatial_mask=smask)
        if smask is not None:
            x = x * smask

        fin_s = []
        for i in range(3):
            x, ls = conv_layer_apply(
                params["enc_final_conv_blocks"][i], state["enc_final_conv_blocks"][i],
                x, act=None, training=bnt, bn_cfg=self.bn_cfg)
            if smask is not None:
                x = x * smask
            fin_s.append(ls)
            if i == 0:
                x = x + enc_big_skip
        new_s["enc_final_conv_blocks"] = fin_s
        return x, new_s

    def decode(self, params, state, x, arch, *, pixel_d: int,
               training: bool = False, bn_training: Optional[bool] = None,
               remat: bool = False, valid_hw=None):
        """3-channel LR image -> HR reconstruction (2^pixel_d larger).

        `valid_hw`: shape-bucketed eval masking (see OFAMobileNetS4.apply)."""
        from ..ops.elastic import spatial_valid_mask
        bnt = bool(training if bn_training is None else bn_training)
        new_s = {}

        smask = None
        if valid_hw is not None:
            assert not bnt, "bucketed eval is eval-mode only"
            smask = spatial_valid_mask(valid_hw[0], valid_hw[1],
                                       x.shape[1], x.shape[2], x.dtype)

        def masked(t):
            return t if smask is None else t * smask

        x, new_s["dec_first_conv_block"] = conv_layer_apply(
            params["dec_first_conv_block"], state["dec_first_conv_block"], x,
            act=None, training=bnt, bn_cfg=self.bn_cfg)
        x = masked(x)

        dec_big_skip = x
        x, new_s["dec_blocks"] = self._trunk(
            params["dec_blocks"], state["dec_blocks"], x, arch, 1, bnt, remat,
            spatial_mask=smask)
        x = masked(x)

        fin_s = []
        for i in range(2):
            x, ls = conv_layer_apply(
                params["dec_final_conv_blocks"][i], state["dec_final_conv_blocks"][i],
                x, act=None, training=bnt, bn_cfg=self.bn_cfg)
            x = masked(x)
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
                smask = spatial_valid_mask(
                    valid_hw[0] * 2 ** (i + 1), valid_hw[1] * 2 ** (i + 1),
                    x.shape[1], x.shape[2], x.dtype)
                x = x * smask
        new_s["shuffle_blocks"] = shuf_s

        x, new_s["dec_final_output_conv_block"] = conv_layer_apply(
            params["dec_final_output_conv_block"], state["dec_final_output_conv_block"],
            x, act=None, training=bnt, bn_cfg=self.bn_cfg)
        x = masked(x)
        return x, new_s

    def apply(self, params, state, x, arch, *, pixel_d: int, mode: str = "sr",
              training: bool = False, bn_training: Optional[bool] = None,
              remat: bool = False, valid_hw=None):
        """mode='sr': decoder-only on a bicubic LR input (the live DIV2K
        config); mode='autoencoder': encoder+decoder on an HR input."""
        if mode == "sr":
            y, dec_s = self.decode(params, state, x, arch, pixel_d=pixel_d,
                                   training=training, bn_training=bn_training,
                                   remat=remat, valid_hw=valid_hw)
            new_s = dict(state)
            new_s.update(dec_s)
            return y, new_s
        elif mode == "autoencoder":
            lr, enc_s = self.encode(params, state, x, arch, pixel_d=pixel_d,
                                    training=training, bn_training=bn_training,
                                    remat=remat, valid_hw=valid_hw)
            dec_valid = None
            if valid_hw is not None:
                dec_valid = (valid_hw[0] // 2 ** pixel_d,
                             valid_hw[1] // 2 ** pixel_d)
            y, dec_s = self.decode(params, state, lr, arch, pixel_d=pixel_d,
                                   training=training, bn_training=bn_training,
                                   remat=remat, valid_hw=dec_valid)
            new_s = dict(state)
            new_s.update(enc_s)
            new_s.update(dec_s)
            return y, new_s
        else:
            raise ValueError("mode must be 'sr' or 'autoencoder', got %r" % mode)

    def max_arch(self) -> SubnetConfig:
        return max_subnet(self.space, self.n_trunks)
