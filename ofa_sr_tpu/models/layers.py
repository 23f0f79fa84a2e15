"""Functional layer builders: static ConvLayer and the elastic MBConv block.

Static ConvLayer mirrors ofa/layers.py:120-187 (conv -> BN -> act, bias-free
conv when BN is used); the elastic MBConv mirrors DynamicMBConvLayer
(dynamic_layers.py:14-111): inverted-bottleneck 1x1 -> depthwise (elastic
kernel) -> point-linear 1x1, each with BN, relu6 after the first two.

Everything runs at max shape with masks (see ops/elastic.py); a layer is a
pair of pure functions (init, apply) over explicit param/state pytrees.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.activations import apply_act
from ..ops.conv import conv2d, conv_init, depthwise_conv2d, depthwise_conv_init
from ..ops.elastic import (
    channel_mask,
    kernel_candidates,
    select_kernel,
    transform_kernel_chain,
    transform_matrices_init,
)
from ..ops.norm import batch_norm, bn_init
from ..ops.pixelshuffle import pixel_shuffle, pixel_unshuffle
from .arch import SearchSpace


# ---------------------------------------------------------------------------
# Static ConvLayer (conv + BN + act, ofa/layers.py:120-187)
# ---------------------------------------------------------------------------

def conv_layer_init(key, in_ch, out_ch, kernel_size, dtype=jnp.float32):
    bn_p, bn_s = bn_init(out_ch, dtype)
    return (
        {"conv": {"w": conv_init(key, kernel_size, in_ch, out_ch, dtype)}, "bn": bn_p},
        {"bn": bn_s},
    )


def conv_layer_apply(p, s, x, *, act=None, training=False, bn_cfg=None,
                     shuffle=None, stride=1):
    """conv -> BN -> act; `shuffle` in {None,'shuffle','unshuffle'} applies
    the pixel(un)shuffle "activation" (ofa/utils.py:259-260,309-310 wiring:
    the shuffle comes *after* conv+BN, as the act slot)."""
    bn_cfg = bn_cfg or {}
    y = conv2d(x, p["conv"]["w"], stride=stride)
    y, new_bn = batch_norm(y, p["bn"], s["bn"], training=training, **bn_cfg)
    if shuffle == "shuffle":
        y = pixel_shuffle(y, 2)
    elif shuffle == "unshuffle":
        y = pixel_unshuffle(y, 2)
    y = apply_act(y, act)
    return y, {"bn": new_bn}


# ---------------------------------------------------------------------------
# Elastic MBConv block (DynamicMBConvLayer, dynamic_layers.py:14-111)
# ---------------------------------------------------------------------------

def mbconv_init(key, space: SearchSpace, dtype=jnp.float32, use_transform=True,
                in_ch=None, out_ch=None, use_se=False, max_expand=None):
    """Weight banks at max shape: 1x1 (in -> max_mid), depthwise
    (max_ks, max_mid), 1x1 (max_mid -> out), plus kernel-transform matrices
    and (for the classification nets) SE reduce/expand convs with bias
    (SEModule, ofa/utils.py:355-371; DynamicSE, dynamic_op.py:175-200)."""
    from ..utils.common import make_divisible
    c_in = in_ch if in_ch is not None else space.width
    c_out = out_ch if out_ch is not None else space.width
    me = max_expand if max_expand is not None else space.max_expand
    mid = round(c_in * me)
    k_ib, k_dw, k_pl, k_se1, k_se2 = jax.random.split(key, 5)
    p = {
        "inverted_bottleneck": {
            "conv": {"w": conv_init(k_ib, 1, c_in, mid, dtype)},
            "bn": None,
        },
        "depth_conv": {
            "conv": {"w": depthwise_conv_init(k_dw, space.max_ks, mid, dtype)},
            "bn": None,
        },
        "point_linear": {
            "conv": {"w": conv_init(k_pl, 1, mid, c_out, dtype)},
            "bn": None,
        },
    }
    p["inverted_bottleneck"]["bn"], s_ib = bn_init(mid, dtype)
    p["depth_conv"]["bn"], s_dw = bn_init(mid, dtype)
    p["point_linear"]["bn"], s_pl = bn_init(c_out, dtype)
    if use_transform and len(space.ks_list) > 1:
        p["depth_conv"]["kt"] = transform_matrices_init(space.ks_list, dtype)
    if use_se:
        se_mid = make_divisible(mid // 4, 8)
        p["se"] = {
            "reduce": {"w": conv_init(k_se1, 1, mid, se_mid, dtype),
                       "b": jnp.zeros((se_mid,), dtype)},
            "expand": {"w": conv_init(k_se2, 1, se_mid, mid, dtype),
                       "b": jnp.zeros((mid,), dtype)},
        }
    s = {"inverted_bottleneck": {"bn": s_ib}, "depth_conv": {"bn": s_dw},
         "point_linear": {"bn": s_pl}}
    return p, s


def _sliced_mbconv_branch(p, s, x, space, ks_idx, mid_k, *, act, training,
                          bn_cfg, stride, ks_switch=False):
    """One expand-switch branch: the block computed with *statically sliced*
    weights at middle width mid_k (identical numerics to masking — slicing
    is what the reference does). Returns (y, new_state at full width: the
    updated prefix concatenated with the untouched suffix)."""
    bn_cfg = bn_cfg or {}

    def slice_bn(bp, bs):
        return ({k: v[:mid_k] for k, v in bp.items()},
                {k: v[:mid_k] for k, v in bs.items()})

    def pad_bn(new, old):
        return {k: jnp.concatenate([new[k], old[k][mid_k:]]) for k in new}

    new_s = {}
    y = conv2d(x, p["inverted_bottleneck"]["conv"]["w"][:, :, :, :mid_k])
    bp, bs = slice_bn(p["inverted_bottleneck"]["bn"], s["inverted_bottleneck"]["bn"])
    y, bn_ib = batch_norm(y, bp, bs, training=training, **bn_cfg)
    y = apply_act(y, act)
    new_s["inverted_bottleneck"] = {"bn": pad_bn(bn_ib, s["inverted_bottleneck"]["bn"])}

    use_t = "kt" in p["depth_conv"]
    ks_set = sorted(set(space.ks_list))
    if ks_switch and len(ks_set) > 1:
        # per-ks branches inside the sliced-expand branch (advisor r2: without
        # this, --ks_switch + expand_switch silently kept the window-masked
        # max-ks depthwise); same exactness argument as the masked path
        def dw_branch(ks):
            eff = transform_kernel_chain(
                p["depth_conv"]["conv"]["w"], p["depth_conv"].get("kt"),
                space.ks_list, ks, use_t).astype(
                    p["depth_conv"]["conv"]["w"].dtype)[:, :, :, :mid_k]
            return lambda yy: depthwise_conv2d(yy, eff, stride=stride)
        y = lax.switch(ks_idx, [dw_branch(k) for k in ks_set], y)
    else:
        cands = kernel_candidates(p["depth_conv"]["conv"]["w"],
                                  p["depth_conv"].get("kt"), space.ks_list,
                                  use_transform=use_t)
        w_dw = select_kernel(cands, ks_idx)[:, :, :, :mid_k]
        y = depthwise_conv2d(y, w_dw, stride=stride)
    bp, bs = slice_bn(p["depth_conv"]["bn"], s["depth_conv"]["bn"])
    y, bn_dw = batch_norm(y, bp, bs, training=training, **bn_cfg)
    y = apply_act(y, act)
    new_s["depth_conv"] = {"bn": pad_bn(bn_dw, s["depth_conv"]["bn"])}

    y = conv2d(y, p["point_linear"]["conv"]["w"][:, :, :mid_k, :])
    y, bn_pl = batch_norm(y, p["point_linear"]["bn"], s["point_linear"]["bn"],
                          training=training, **bn_cfg)
    new_s["point_linear"] = {"bn": bn_pl}
    return y, new_s


def mbconv_apply(p, s, x, space: SearchSpace, ks_idx, mid, *,
                 act="relu6", training=False, bn_cfg=None, stride=1,
                 se_mid=None, expand_switch=False, out_ch=None,
                 spatial_mask=None, remat_pair=False, ks_switch=False,
                 dw_switch=False, dw_opts=None):
    if out_ch is not None or spatial_mask is not None:
        # elastic output width / bucketed-eval spatial masking: masked
        # execution only
        assert not expand_switch, "needs masked execution"
        return _masked_mbconv_apply(p, s, x, space, ks_idx, mid, act=act,
                                    training=training, bn_cfg=bn_cfg,
                                    stride=stride, se_mid=se_mid,
                                    out_ch=out_ch, spatial_mask=spatial_mask,
                                    remat_pair=remat_pair,
                                    ks_switch=ks_switch, dw_switch=dw_switch,
                                    dw_opts=dw_opts)
    if expand_switch and "se" not in p and len(space.expand_list) > 1:
        # compile one branch per expand option: only the sampled width's
        # FLOPs execute (masking always pays the max width). Inside a
        # sliced branch the width is already static, so dw_switch
        # degenerates to ks_switch exactly — forward it rather than
        # silently dropping the promised per-ks depthwise saving
        # (advisor r2's ks_switch note, same class).
        mids = space.mid_candidates()
        idx = jnp.searchsorted(jnp.asarray(mids), mid)
        ks_sw = ks_switch or bool(dw_switch)
        branches = [
            (lambda mk: (lambda xx: _sliced_mbconv_branch(
                p, s, xx, space, ks_idx, mk, act=act, training=training,
                bn_cfg=bn_cfg, stride=stride, ks_switch=ks_sw)))(mk)
            for mk in mids
        ]
        return lax.switch(idx, branches, x)
    return _masked_mbconv_apply(p, s, x, space, ks_idx, mid, act=act,
                                training=training, bn_cfg=bn_cfg,
                                stride=stride, se_mid=se_mid,
                                remat_pair=remat_pair, ks_switch=ks_switch,
                                dw_switch=dw_switch, dw_opts=dw_opts)


def _dw_mid_candidates(p, space: SearchSpace, e_list=None, align=None):
    """Static middle-width candidates for this block, from its own weight
    shapes (reference mid rule make_divisible(round(in*e), 8),
    dynamic_layers.py:75-77), capped at the bank width.

    `e_list` narrows the enumeration to the live expand options (shrink-phase
    `set_constraint`, progressive_shrinking.py:295-307): fewer compiled
    branches, same exactness for archs sampled under the same constraint.
    `align` rounds each candidate UP to a multiple (e.g. 128 = the TPU lane
    tile): branches with mk above `mid` stay exact (channels >= mid are
    zero), candidates collapse together (fewer branches) and the switch-seam
    buffers land on tile boundaries — the r3 trace attributed 27% of the
    step to seam formatting copies (DESIGN.md §7.1)."""
    from ..utils.common import make_divisible
    in_ch = p["inverted_bottleneck"]["conv"]["w"].shape[2]
    max_mid = p["depth_conv"]["conv"]["w"].shape[-1]
    es = space.expand_list if e_list is None else e_list
    mids = {min(make_divisible(round(in_ch * e), 8), max_mid) for e in es}
    if align:
        mids = {min(-(-m // align) * align, max_mid) for m in mids}
    return sorted(mids)


def _dw_live_lists(p, space: SearchSpace, dw_live, align=None):
    """Resolve the (kernel sizes, mid widths, ks index remap) the dw switch
    enumerates. `dw_live = (ks_list, e_list)` (either may be None) narrows
    the branch set to a shrink phase's live constraint lists
    (set_constraint, progressive_shrinking.py:295-307). Exactness contract:
    every sampled arch's (ks, mid) must come from the same lists — the run
    manager derives both the sampler candidates and dw_live from one
    constraints dict, so they cannot disagree. Off-list values are clamped
    to the nearest branch (lax.switch semantics), which is only exact for
    mids below a live candidate (the zero-channel argument)."""
    ks_all = sorted(set(space.ks_list))
    live_ks, live_e = (dw_live or (None, None))
    ks_set = (sorted(set(live_ks) & set(ks_all)) or ks_all) if live_ks \
        else ks_all
    mids = _dw_mid_candidates(p, space, e_list=live_e, align=align)
    if ks_set == ks_all:
        remap = None
    else:
        remap = jnp.asarray([ks_all.index(k) for k in ks_set])
    return ks_set, mids, remap


def _dw_switched(p, y, space: SearchSpace, ks_idx, mid, use_t, stride,
                 dw_live=None, seam="pad", align=None):
    """lax.switch over (kernel size x middle width) for the depthwise conv
    only: the sampled branch runs k x k taps on the first `mk` channels and
    zero-pads back to the bank width. See the call site for the exactness
    argument; equivalence pinned by tests/test_dw_switch.py.

    `dw_live` narrows the enumerated branches to a shrink phase's live
    (ks, e) lists; `align` rounds width candidates up to a lane-tile
    multiple; `seam` picks how the narrow branch output rejoins the bank
    width ('pad' = jnp.pad, 'dus' = dynamic_update_slice into zeros) —
    three levers on the switch-seam copies the r3 trace measured at 27% of
    the step (DESIGN.md §7.1)."""
    w_bank = p["depth_conv"]["conv"]["w"]
    max_mid = w_bank.shape[-1]
    ks_set, mids, remap = _dw_live_lists(p, space, dw_live, align=align)
    e_idx = jnp.searchsorted(jnp.asarray(mids),
                             jnp.minimum(mid, mids[-1]))
    k_idx = ks_idx if remap is None else jnp.searchsorted(remap, ks_idx)

    def dw_branch(ks, mk):
        eff = transform_kernel_chain(
            w_bank, p["depth_conv"].get("kt"), space.ks_list, ks,
            use_t).astype(w_bank.dtype)[:, :, :, :mk]

        def run(yy):
            out = depthwise_conv2d(yy[:, :, :, :mk], eff, stride=stride)
            if mk == max_mid:
                return out
            if seam == "dus":
                buf = jnp.zeros(out.shape[:3] + (max_mid,), out.dtype)
                return lax.dynamic_update_slice(buf, out, (0, 0, 0, 0))
            return jnp.pad(out, ((0, 0), (0, 0), (0, 0),
                                 (0, max_mid - mk)))
        return run

    branches = [dw_branch(ks, mk) for ks in ks_set for mk in mids]
    if len(branches) == 1:
        return branches[0](y)
    return lax.switch(k_idx * len(mids) + e_idx, branches, y)


def _dwp_switched(p, s, y, space: SearchSpace, ks_idx, mid, use_t, stride, *,
                  act, training, bn_cfg, dw_live=None):
    """lax.switch over (kernel size x middle width) covering depthwise ->
    BN -> act -> project 1x1 — `dw_switch="project"`. Versus `_dw_switched`
    the branch result is the block-width projection (e.g. 64 ch) instead of
    the zero-padded bank-width dw activation (e.g. 384 ch), so the switch
    seam materializes ~mid/out_ch x fewer bytes, and the project contracts
    only the mk prefix.

    MEASURED NEGATIVE (kept opt-in as the record, DESIGN.md §7): equal-n
    HW race 2026-08-17, bf16 remat=all_save_bn bs16/96px n_inner=32 —
    dwp 38.5 ms vs dw-only 26.7 ms (+44%). Pulling the MXU-bound 1x1 out
    of XLA's straight-line schedule into per-branch callees costs more
    than the seam-buffer traffic it saves (same family as the
    expand_switch whole-block loss); the switch boundary that wins is
    exactly one VPU-bound op wide (_dw_switched).

    Exactness, on top of _dw_switched's argument: BN over the mk prefix
    with the active-`mid` mask updates/normalizes exactly the channels the
    masked full-width BN does (per-channel stats are independent; suffix
    state is re-attached untouched), and the masked project over all
    max_mid channels equals the sliced project over the mk prefix because
    channels >= mid are zero after the mask. Pinned by
    tests/test_dw_switch.py (dwp variants)."""
    bn_cfg = bn_cfg or {}
    w_bank = p["depth_conv"]["conv"]["w"]
    w_pl = p["point_linear"]["conv"]["w"]
    ks_set, mids, remap = _dw_live_lists(p, space, dw_live)
    e_idx = jnp.searchsorted(jnp.asarray(mids), jnp.minimum(mid, mids[-1]))
    k_idx = ks_idx if remap is None else jnp.searchsorted(remap, ks_idx)
    bn_p, bn_s = p["depth_conv"]["bn"], s["depth_conv"]["bn"]
    use_kt = use_t

    def branch(ks, mk):
        eff = transform_kernel_chain(
            w_bank, p["depth_conv"].get("kt"), space.ks_list, ks,
            use_kt).astype(w_bank.dtype)[:, :, :, :mk]

        def run(yy):
            z = depthwise_conv2d(yy[:, :, :, :mk], eff, stride=stride)
            mask_k = channel_mask(jnp.minimum(mid, mk), mk, z.dtype)
            bp = {k: v[:mk] for k, v in bn_p.items()}
            bs_ = {k: v[:mk] for k, v in bn_s.items()}
            z, bn_new = batch_norm(z, bp, bs_, training=training,
                                   mask=mask_k, **bn_cfg)
            z = apply_act(z, act)
            out = conv2d(z, w_pl[:, :, :mk, :])
            bn_full = {k: jnp.concatenate([bn_new[k], bn_s[k][mk:]])
                       for k in bn_new}
            return out, bn_full
        return run

    branches = [branch(ks, mk) for ks in ks_set for mk in mids]
    if len(branches) == 1:
        return branches[0](y)
    return lax.switch(k_idx * len(mids) + e_idx, branches, y)


def _masked_mbconv_apply(p, s, x, space: SearchSpace, ks_idx, mid, *,
                         act="relu6", training=False, bn_cfg=None, stride=1,
                         se_mid=None, out_ch=None, spatial_mask=None,
                         remat_pair=False, ks_switch=False, dw_switch=False,
                         dw_opts=None):
    """Masked-execution MBConv. `ks_idx` indexes sorted(set(ks_list)); `mid`
    is the active middle width (both traced int32 scalars); `se_mid` the
    active SE bottleneck width when the block has squeeze-excite.

    Numerically identical to the reference's sliced execution
    (dynamic_layers.py:70-84): masking the bottleneck output zeroes the
    inactive channel suffix, so the depthwise and point-linear convs see
    exactly the sliced computation; BN statistics over active channels are
    unaffected by zeroed inactive channels (ops/norm.py). SE equivalence:
    the reduce output is masked to se_mid, so expand sees only active
    contributions; inactive mid channels of x are zero so the h_sigmoid gate
    on them is irrelevant (DynamicSE, dynamic_op.py:175-200).
    """
    bn_cfg = bn_cfg or {}
    dw_opts = dw_opts or {}
    max_mid = p["depth_conv"]["conv"]["w"].shape[-1]
    mask = channel_mask(mid, max_mid, x.dtype)
    new_s = {}
    # dw_switch="project": branch depthwise + BN + act + project together
    # (_dwp_switched). SE / elastic output width / bucketed-eval masking
    # need the project outside the branch — fall back to dw-only branching.
    use_dwp = (dw_switch == "project" and "se" not in p and out_ch is None
               and spatial_mask is None)
    if dw_switch == "project" and not use_dwp:
        dw_switch = True

    def expand_and_depthwise(xx):
        """inverted bottleneck 1x1 -> BN/act -> depthwise -> BN/act: the two
        wide (max_mid-channel) activations live here. Under remat='pair' this
        is the checkpoint boundary (VERDICT r1 item 2a): the backward pass
        recomputes only this pair from the 64-ch block input, while the
        point-linear below keeps its residuals — ~half the recompute FLOPs of
        whole-block checkpointing at nearly the same activation memory."""
        y = conv2d(xx, p["inverted_bottleneck"]["conv"]["w"])
        y, bn_ib = batch_norm(y, p["inverted_bottleneck"]["bn"],
                              s["inverted_bottleneck"]["bn"],
                              training=training, mask=mask, **bn_cfg)
        y = apply_act(y, act)

        use_t = "kt" in p["depth_conv"]
        if spatial_mask is not None:
            # shape-bucketed eval: re-zero the pad so the k x k depthwise
            # conv's valid-border outputs equal the unpadded SAME execution
            # (the BN bias made the pad region nonzero)
            y = y * spatial_mask
        ks_set = sorted(set(space.ks_list))
        if use_dwp:
            y = _dwp_switched(p, s, y, space, ks_idx, mid, use_t, stride,
                              act=act, training=training, bn_cfg=bn_cfg,
                              dw_live=dw_opts.get("live"))
            # y is (out, bn_dw_state): block-width projection + dw BN state
            return y[0], (bn_ib, y[1])
        if dw_switch:
            # branch the DEPTHWISE op (and only it) over the sampled
            # (kernel size, middle width): the r3 device trace shows the
            # masked dw7x7 stack — always 49 taps x max_mid channels — is
            # 54% of the production step at VPU-class rates (DESIGN.md §7),
            # while the mean sampled subnet needs E[e]/e_max * E[k^2]/49
            # ~ 0.41 of that work. Unlike expand_switch (which branches
            # the whole block and lost to the remat buffers + narrowed
            # matmuls it forces), the MXU-bound 1x1s stay masked at full
            # width; only the per-channel dw is sliced. Exact: channels
            # >= mid of `y` are zero (BN mask above), depthwise is
            # per-channel, so dropping zero channels and zero-padding the
            # output equals the full-width conv; the tap argument is
            # ks_switch's. `mk` is the smallest candidate >= mid
            # (searchsorted left), so runtime widths off the candidate
            # grid (cls width_mult) stay exact, just with less savings.
            y = _dw_switched(p, y, space, ks_idx, mid, use_t, stride,
                             dw_live=dw_opts.get("live"),
                             seam=dw_opts.get("seam", "pad"),
                             align=dw_opts.get("align"))
        elif ks_switch and len(ks_set) > 1:
            # compile one depthwise branch per kernel size: the sampled ks
            # executes only its own k x k taps instead of the window-masked
            # max-ks conv (7x7 costs 49 VPU MACs/px/ch; the r2 HW profile
            # found the depthwise VPU time a dominant step cost). Exact:
            # a k x k kernel at pad k//2 equals the zero-embedded max-ks
            # kernel at pad max_ks//2 for any stride, and gradients flow
            # only into the executed branch's transform chain — the same
            # semantics as the one-hot select_kernel.
            def dw_branch(ks):
                eff = transform_kernel_chain(
                    p["depth_conv"]["conv"]["w"], p["depth_conv"].get("kt"),
                    space.ks_list, ks, use_t).astype(
                        p["depth_conv"]["conv"]["w"].dtype)
                return lambda yy: depthwise_conv2d(yy, eff, stride=stride)
            y = lax.switch(ks_idx, [dw_branch(k) for k in ks_set], y)
        else:
            cands = kernel_candidates(
                p["depth_conv"]["conv"]["w"],
                p["depth_conv"].get("kt"),
                space.ks_list,
                use_transform=use_t,
            )
            w_dw = select_kernel(cands, ks_idx)
            y = depthwise_conv2d(y, w_dw, stride=stride)
        y, bn_dw = batch_norm(y, p["depth_conv"]["bn"], s["depth_conv"]["bn"],
                              training=training, mask=mask, **bn_cfg)
        y = apply_act(y, act)
        return y, (bn_ib, bn_dw)

    pair_fn = jax.checkpoint(expand_and_depthwise) if remat_pair \
        else expand_and_depthwise
    y, (bn_ib, bn_dw) = pair_fn(x)
    new_s["inverted_bottleneck"] = {"bn": bn_ib}
    new_s["depth_conv"] = {"bn": bn_dw}

    if "se" in p:
        from ..ops.activations import h_sigmoid
        se = p["se"]
        se_max = se["reduce"]["w"].shape[-1]
        se_mask = channel_mask(se_mid, se_max, y.dtype)
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = conv2d(g, se["reduce"]["w"]) + se["reduce"]["b"]
        g = jnp.maximum(g * se_mask, 0)
        g = conv2d(g, se["expand"]["w"]) + se["expand"]["b"]
        y = y * h_sigmoid(g) * mask

    # point linear 1x1 (+BN, no act); out_mask = runtime elastic output
    # width (the masked equivalent of weight[:active_out_channel] slicing,
    # dynamic_op.py:104-112). Under dwp the projection already happened
    # inside the switch branch — only its BN remains.
    out_mask = None
    if out_ch is not None:
        max_out = p["point_linear"]["conv"]["w"].shape[-1]
        out_mask = channel_mask(out_ch, max_out, x.dtype)
    if not use_dwp:
        y = conv2d(y, p["point_linear"]["conv"]["w"])
    y, bn_pl = batch_norm(y, p["point_linear"]["bn"], s["point_linear"]["bn"],
                          training=training, mask=out_mask, **bn_cfg)
    new_s["point_linear"] = {"bn": bn_pl}
    return y, new_s


def _masked_mbconv_apply_s2d(p, s, x4, space: SearchSpace, ks_idx, mid, *,
                             act="relu6", training=False, bn_cfg=None,
                             remat_pair=False):
    """The masked MBConv executed in space-to-depth layout (ops/s2d.py):
    x4 is (B,H/2,W/2,4*width) phase-major. Window-exact vs
    _masked_mbconv_apply on un_s2d(x4): block-diagonal 1x1s (4x-deep
    contraction for the MXU), phase-pair depthwise (same MACs), and BN
    moments over phases-folded-to-spatial (identical value set, identical
    (C,)-state threading). Elastic ks via the same window-masked candidate
    select; elastic width via the phase-tiled channel mask."""
    from ..ops.s2d import (block_diag_1x1, depthwise_s2d, merge_phases,
                           split_phases)
    bn_cfg = bn_cfg or {}
    max_mid = p["depth_conv"]["conv"]["w"].shape[-1]
    mask = channel_mask(mid, max_mid, x4.dtype)
    new_s = {}

    def bn_merged(y4, c, bn_p, bn_s, m):
        ym = merge_phases(y4, c)
        ym, ns = batch_norm(ym, bn_p, bn_s, training=training, mask=m,
                            **bn_cfg)
        return split_phases(ym, c), ns

    def expand_and_depthwise(xx):
        y = conv2d(xx, block_diag_1x1(p["inverted_bottleneck"]["conv"]["w"]))
        y, bn_ib = bn_merged(y, max_mid, p["inverted_bottleneck"]["bn"],
                             s["inverted_bottleneck"]["bn"], mask)
        y = apply_act(y, act)
        use_t = "kt" in p["depth_conv"]
        cands = kernel_candidates(p["depth_conv"]["conv"]["w"],
                                  p["depth_conv"].get("kt"), space.ks_list,
                                  use_transform=use_t)
        w_dw = select_kernel(cands, ks_idx)
        y = depthwise_s2d(y, w_dw)
        y, bn_dw = bn_merged(y, max_mid, p["depth_conv"]["bn"],
                             s["depth_conv"]["bn"], mask)
        y = apply_act(y, act)
        return y, (bn_ib, bn_dw)

    pair_fn = jax.checkpoint(expand_and_depthwise) if remat_pair \
        else expand_and_depthwise
    y, (bn_ib, bn_dw) = pair_fn(x4)
    new_s["inverted_bottleneck"] = {"bn": bn_ib}
    new_s["depth_conv"] = {"bn": bn_dw}

    y = conv2d(y, block_diag_1x1(p["point_linear"]["conv"]["w"]))
    out_c = p["point_linear"]["conv"]["w"].shape[-1]
    y, bn_pl = bn_merged(y, out_c, p["point_linear"]["bn"],
                         s["point_linear"]["bn"], None)
    new_s["point_linear"] = {"bn": bn_pl}
    return y, new_s


def residual_stage_apply(blocks_p, blocks_s, x, space: SearchSpace,
                         ks_idx, mid, depth, *, act="relu6", training=False,
                         bn_cfg=None, remat=False, expand_switch=False,
                         spatial_mask=None, ks_switch=False, dw_switch=False,
                         dw_opts=None, s2d=False):
    """One elastic stage: up to max_depth MBConv blocks with identity
    shortcuts (MobileInvertedResidualBlock, proxyless_nets.py:36-72), the
    first `depth` of them active (runtime_depth truncation,
    ofa_mbs4.py:152-156).

    Elastic depth compiles as a `lax.switch` over the stage's depth options:
    only the selected prefix of blocks *executes* (the reference skips them
    too; a where-gate would burn max_depth blocks of MXU time every step).
    Skipped blocks' params get zero gradient and their BN states pass
    through untouched, matching the reference exactly.
    """
    if s2d:
        assert not (expand_switch or ks_switch or dw_switch
                    or spatial_mask is not None), \
            "s2d composes with masked execution only"

        def plain_block_fn(bp, bs, xx, k_i, m_i):
            return _masked_mbconv_apply_s2d(
                bp, bs, xx, space, k_i, m_i, act=act, training=training,
                bn_cfg=bn_cfg, remat_pair=(remat == "pair"))
    else:
        def plain_block_fn(bp, bs, xx, k_i, m_i):
            return mbconv_apply(bp, bs, xx, space, k_i, m_i,
                                act=act, training=training, bn_cfg=bn_cfg,
                                expand_switch=expand_switch,
                                spatial_mask=spatial_mask,
                                remat_pair=(remat == "pair"),
                                ks_switch=ks_switch, dw_switch=dw_switch,
                                dw_opts=dw_opts)

    # rematerialize block activations in the backward pass. Modes:
    #   False          — keep everything (full residuals x 16 blocks exceed
    #                    HBM at batch 16/96px f32: ~17.3G vs 15.75G)
    #   True           — alternate blocks (default: halves the recompute of
    #                    checkpointing all while fitting comfortably)
    #   "pair"         — checkpoint the expand+depthwise pair inside every
    #                    block (saves the 64-ch block input + point-linear
    #                    residuals, recomputes only the two wide activations:
    #                    ~half the recompute of "all" at similar memory)
    #   "all"          — checkpoint every block (minimum memory, ~33% extra
    #                    FLOPs; the right setting for bigger batches/frames)
    #   "all_save_bn"  — "all" + save the (C,)-sized BN batch moments across
    #                    the boundary (ops/norm.py checkpoint_name): the
    #                    backward recompute skips re-reducing the full
    #                    activations for statistics (profiled at ~30% of
    #                    step time) at ~zero memory cost
    if remat == "all_save_bn":
        remat_block_fn = jax.checkpoint(
            plain_block_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "bn_moments"))
    elif remat and not (remat == "pair" and not expand_switch):
        remat_block_fn = jax.checkpoint(plain_block_fn)
    else:
        remat_block_fn = plain_block_fn

    def block_fn(i, *args):
        # expand-switch branches multiply live buffers: checkpoint every
        # block there (pair-granularity doesn't apply to sliced branches);
        # otherwise follow the requested mode
        if expand_switch or remat in ("all", "all_save_bn"):
            return remat_block_fn(*args)
        if remat == "pair":
            return plain_block_fn(*args)  # the pair inside is checkpointed
        return (remat_block_fn if i % 2 == 1 else plain_block_fn)(*args)

    n = len(blocks_p)
    # branch set: every depth a runtime arch can request. The reference's
    # runtime_depth indexing quirk routes pixel_d values into stage depths
    # (see arch.reference_quirk_arch_*), so those are included too.
    cand = set(space.depth_list) | set(space.pixel_d_list)
    depth_options = sorted(d for d in cand if d <= n)
    if n not in depth_options:
        depth_options.append(n)

    def run_prefix(d):
        def f(xx):
            states = []
            for i in range(n):
                if i < d:
                    out, ns = block_fn(i, blocks_p[i], blocks_s[i], xx,
                                       ks_idx[i], mid[i])
                    xx = out + xx
                else:
                    # untouched: state passes through; params see zero grad
                    # because this branch never reads them
                    ns = blocks_s[i]
                states.append(ns)
            return xx, states
        return f

    if len(depth_options) == 1:
        return run_prefix(depth_options[0])(x)
    idx = jnp.searchsorted(jnp.asarray(depth_options), depth)
    return lax.switch(idx, [run_prefix(d) for d in depth_options], x)
