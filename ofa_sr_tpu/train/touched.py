"""Per-leaf 'touched' masks for torch-exact optimizer semantics.

torch optimizers skip parameters whose grad is None (torch/optim/adam.py):
modules no sampled subnet executed in a step — depth-gated blocks, unused
kernel-transform matrices, shuffle stages beyond pixel_d, the entire encoder
in SR mode — receive no weight decay, no moment update, and no step-count
increment in the reference trainer. These helpers rebuild that structural
touched-ness host-side from the *effective* sampled SubnetConfigs (quirks
applied), producing a pytree of bools matching the params tree that
optim.TorchOpt gates on.
"""

from __future__ import annotations

import jax
import numpy as np


def _fill(tree, value):
    return jax.tree.map(lambda _: np.bool_(value), tree)


def _kt_touched(kt_params, ks_list, ks_used):
    """Which transform matrices the executed kernel sizes pull into the
    graph: the chain applies largest->smallest down to the target
    (ops/elastic.transform_kernel_chain / dynamic_op.py:46-71)."""
    ks_set = sorted(set(ks_list))
    used = set()
    for k in ks_used:
        idx = ks_set.index(k)
        for j in range(len(ks_set) - 1, idx, -1):
            used.add("%dto%d" % (ks_set[j], ks_set[j - 1]))
    return {name: np.bool_(name in used) for name in kt_params}


def _mb_touched(bp, ks_list, ks_used, on):
    out = _fill(bp, on)
    # kernel-transform matrices live under the depthwise conv
    # (models/layers.mbconv_init: p['depth_conv']['kt'])
    if on and "kt" in bp.get("depth_conv", {}):
        out["depth_conv"]["kt"] = _kt_touched(bp["depth_conv"]["kt"],
                                              ks_list, ks_used)
    return out


def _trunk_touched(blocks_p, space, cfgs, ks_offset, d_offset):
    """Touched masks for one trunk's MBConv block list: stage si's executed
    prefix is min(d[si], max_depth) per subnet, OR-ed over subnets."""
    md = space.max_depth
    out = []
    for bi, bp in enumerate(blocks_p):
        si, pos = bi // md, bi % md
        ks_used = set()
        on = False
        for cfg in cfgs:
            if pos < min(cfg.d[d_offset + si], md):
                on = True
                ks_used.add(cfg.ks[ks_offset + bi])
        out.append(_mb_touched(bp, space.ks_list, ks_used, on))
    return out


def sr_touched_mask(net, params, cfgs, mode="sr"):
    """Touched pytree for OFAMobileNetS4 / OFAMobileNetX4 params given the
    effective subnet configs executed this step. mode='sr' leaves the X4
    encoder untouched (the decoder-only published config); 'autoencoder'
    touches it by its stage depths."""
    sp = net.space
    is_x4 = "enc_blocks" in params
    out = {}
    max_pd = max(cfg.pixel_d for cfg in cfgs)

    if is_x4:
        n_stages = sp.n_stages
        enc_on = mode == "autoencoder"
        out["enc_unshuffle_blocks"] = [
            _fill(p, enc_on and i < max_pd)
            for i, p in enumerate(params["enc_unshuffle_blocks"])]
        if enc_on:
            out["enc_blocks"] = _trunk_touched(params["enc_blocks"], sp,
                                               cfgs, 0, 0)
        else:
            out["enc_blocks"] = [_fill(p, False)
                                 for p in params["enc_blocks"]]
        out["enc_final_conv_blocks"] = [
            _fill(p, enc_on) for p in params["enc_final_conv_blocks"]]
        dec_ks_off = sp.blocks_per_trunk
        dec_d_off = n_stages
        dec_key = "dec_blocks"
    else:
        dec_ks_off = dec_d_off = 0
        dec_key = "blocks"

    out["dec_first_conv_block"] = _fill(params["dec_first_conv_block"], True)
    out[dec_key] = _trunk_touched(params[dec_key], sp, cfgs, dec_ks_off,
                                  dec_d_off)
    out["dec_final_conv_blocks"] = [
        _fill(p, True) for p in params["dec_final_conv_blocks"]]
    out["shuffle_blocks"] = [
        _fill(p, i < max_pd) for i, p in enumerate(params["shuffle_blocks"])]
    out["dec_final_output_conv_block"] = _fill(
        params["dec_final_output_conv_block"], True)
    return out


def cls_touched_mask(net, params, archs):
    """Touched pytree for ElasticClassifierNet params given the sampled
    ClsArch list. Elastic-width slicing does NOT affect touched-ness: torch
    gives full-tensor (zero-padded) grads for sliced weights."""
    out = {k: _fill(params[k], True)
           for k in params if k != "blocks"}
    blocks = []
    bi = 0
    for si, spec in enumerate(net.stage_specs):
        for i in range(spec.n_block):
            ks_used = set()
            on = False
            for a in archs:
                if i == 0 or i < a.d[si]:
                    on = True
                    ks_used.add(a.ks[bi])
            blocks.append(_mb_touched(params["blocks"][bi],
                                      net.space.ks_list, ks_used, on))
            bi += 1
    out["blocks"] = blocks
    return out
