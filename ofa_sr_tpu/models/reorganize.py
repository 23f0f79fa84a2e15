"""Channel-importance reorganization before elastic-expand stages.

Reference `re_organize_middle_weights` (dynamic_layers.py:156-199): sort the
MBConv middle channels by the L1 importance of the point-linear weight (sum
of |w| over out/kh/kw), permute the depthwise conv, its BN, and the
inverted-bottleneck output accordingly. With expand_ratio_stage > 0, channels
beyond round(width * expand_list_desc[stage]) are forced to the bottom by
overwriting their importance with 0, -1, -2, ... (dynamic_layers.py:158-163)
so already-shrunk widths keep their channel identity across stages.

Network-level wrappers mirror ofa_mbs4.py:461-464 / ofa_mbx4.py:543-547
(X4 skips the unshuffle/shuffle blocks — here they live outside the trunks,
so both trunks reorganize in full).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .arch import SearchSpace


def reorganize_mbconv(block_p, block_s, space: SearchSpace,
                      expand_ratio_stage: int = 0):
    """Returns (new_block_params, new_block_state)."""
    w_pl = np.asarray(block_p["point_linear"]["conv"]["w"])  # [1,1,mid,out]
    importance = np.abs(w_pl).sum(axis=(0, 1, 3)).astype(np.float64)  # [mid]

    if expand_ratio_stage > 0:
        desc = sorted(space.expand_list, reverse=True)
        stage_idx = min(expand_ratio_stage, len(desc) - 1)
        target_width = round(space.width * desc[stage_idx])
        n = importance.shape[0]
        importance[target_width:] = np.arange(0, -(n - target_width), -1)

    idx = np.argsort(-importance, kind="stable")

    def perm(a, axis):
        return jnp.asarray(np.take(np.asarray(a), idx, axis=axis))

    p = {
        "inverted_bottleneck": {
            "conv": {"w": perm(block_p["inverted_bottleneck"]["conv"]["w"], 3)},
            "bn": {k: perm(v, 0) for k, v in block_p["inverted_bottleneck"]["bn"].items()},
        },
        "depth_conv": {
            "conv": {"w": perm(block_p["depth_conv"]["conv"]["w"], 3)},
            "bn": {k: perm(v, 0) for k, v in block_p["depth_conv"]["bn"].items()},
        },
        "point_linear": {
            "conv": {"w": perm(block_p["point_linear"]["conv"]["w"], 2)},
            "bn": dict(block_p["point_linear"]["bn"]),
        },
    }
    if "kt" in block_p["depth_conv"]:
        # transform matrices act on spatial dims only — channel-invariant
        p["depth_conv"]["kt"] = dict(block_p["depth_conv"]["kt"])
    s = {
        "inverted_bottleneck": {"bn": {k: perm(v, 0) for k, v in block_s["inverted_bottleneck"]["bn"].items()}},
        "depth_conv": {"bn": {k: perm(v, 0) for k, v in block_s["depth_conv"]["bn"].items()}},
        "point_linear": {"bn": dict(block_s["point_linear"]["bn"])},
    }
    return p, s


def reorganize_s4(params, state, space: SearchSpace, expand_ratio_stage: int = 0):
    p = dict(params)
    s = dict(state)
    blocks = [reorganize_mbconv(bp, bs, space, expand_ratio_stage)
              for bp, bs in zip(params["blocks"], state["blocks"])]
    p["blocks"] = [b[0] for b in blocks]
    s["blocks"] = [b[1] for b in blocks]
    return p, s


def reorganize_x4(params, state, space: SearchSpace, expand_ratio_stage: int = 0):
    p = dict(params)
    s = dict(state)
    for key in ("enc_blocks", "dec_blocks"):
        blocks = [reorganize_mbconv(bp, bs, space, expand_ratio_stage)
                  for bp, bs in zip(params[key], state[key])]
        p[key] = [b[0] for b in blocks]
        s[key] = [b[1] for b in blocks]
    return p, s


def zero_last_gamma(net, params):
    """Zero the point-linear BN scale of every MBConv block that has an
    identity shortcut — the residual-branch zero-init trick the reference
    nets expose (mobilenet_v3.py:80-85, proxyless_nets.py:135-139,
    mobilenet_s4.py:81-85, mobilenet_x4.py:97-101; defined on every net,
    never invoked by the scripts). Returns new params.

    Works for OFAMobileNetS4/X4 (every trunk block is stride-1
    same-width -> all get zeroed) and ElasticClassifierNet (blocks after
    the first of each stage)."""
    import jax

    params = jax.tree.map(lambda a: a, params)  # shallow copy of the tree

    def zero_pl(bp):
        bp = dict(bp)
        bn = dict(bp["point_linear"]["bn"])
        bn["scale"] = jnp.zeros_like(bn["scale"])
        bp["point_linear"] = dict(bp["point_linear"], bn=bn)
        return bp

    if hasattr(net, "stage_specs"):  # classification net
        new_blocks = []
        bi = 0
        ins, outs = net.active_block_channels(len(net.width_mult_list) - 1)
        for si, spec in enumerate(net.stage_specs):
            for i in range(spec.n_block):
                has_shortcut = (spec.stride if i == 0 else 1) == 1 and \
                    ins[bi] == outs[bi]
                new_blocks.append(zero_pl(params["blocks"][bi])
                                  if has_shortcut else params["blocks"][bi])
                bi += 1
        params["blocks"] = new_blocks
        return params

    for key in ("blocks", "enc_blocks", "dec_blocks"):
        if key in params:
            params[key] = [zero_pl(bp) for bp in params[key]]
    return params
