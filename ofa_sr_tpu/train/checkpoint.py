"""Checkpoint store + reference-.pth.tar interop.

Native format: one msgpack file per checkpoint holding
{epoch, best_acc, params, state, opt_state} — the same contract as the
reference's torch.save dict (sr_run_manager.py:253-273) — plus:
- `latest.txt` pointing at the newest file (run_manager.py:264-268)
- `model_best.ckpt` holding params+state only (sr_run_manager.py:271-273)

Torch interop (`import_torch_*` / `export_torch_*`) remaps the reference
state_dict keys (incl. the `.bn.bn.` / `.conv.conv.weight` variants that
load_weights_from_net translates, ofa_mbs4.py:221-259) and transposes
OIHW -> HWIO, so reference-trained supernets can be evaluated here for
bit-parity PSNR checks (SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


# ---------------------------------------------------------------------------
# Native store
# ---------------------------------------------------------------------------

def save_checkpoint(save_dir, tree, *, name="checkpoint.ckpt",
                    is_best=False, best_name="model_best.ckpt"):
    os.makedirs(save_dir, exist_ok=True)
    # to_state_dict converts optax namedtuple states etc. into plain dicts
    sd = serialization.to_state_dict(jax.tree.map(np.asarray, tree))
    path = os.path.join(save_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(sd))
    with open(os.path.join(save_dir, "latest.txt"), "w") as f:
        f.write(path + "\n")
    if is_best:
        best = {k: sd[k] for k in ("params", "state") if k in sd}
        with open(os.path.join(save_dir, best_name), "wb") as f:
            f.write(serialization.msgpack_serialize(best))
    return path


def save_weights(save_dir, params, state, name):
    """Weights-only sidecar checkpoint (per-corner best gating,
    RunConfig.corner_gate). Unlike save_checkpoint it does NOT touch
    latest.txt, so rolling-resume semantics are unaffected."""
    os.makedirs(save_dir, exist_ok=True)
    sd = serialization.to_state_dict(
        jax.tree.map(np.asarray, {"params": params, "state": state}))
    path = os.path.join(save_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(sd))
    return path


def load_checkpoint(path_or_dir, template=None):
    """Load a checkpoint; directories resolve through latest.txt
    (run_manager.py:264-268). `template` (a pytree of arrays) restores exact
    list/tuple structure and dtypes; without it, raw msgpack trees (dicts
    with int keys for lists) are returned."""
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        latest = os.path.join(path_or_dir, "latest.txt")
        with open(latest) as f:
            path = f.read().strip()
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template is not None:
        raw = serialization.from_state_dict(template, raw)
    return raw


def _lenient_merge(tpl_sd, raw):
    """Recursive overlay of a raw msgpack state-dict tree onto a template
    state dict: keys missing from raw keep the template value, keys the
    template lacks are dropped, and leaf shape mismatches keep the
    template. Returns (merged, n_kept_template, n_dropped_raw)."""
    if isinstance(tpl_sd, dict):
        rawd = raw if isinstance(raw, dict) else {}
        out, kept, dropped = {}, 0, 0
        for k, v in tpl_sd.items():
            if k in rawd:
                m, ke, dr = _lenient_merge(v, rawd[k])
                out[k] = m
                kept += ke
                dropped += dr
            else:
                out[k] = v
                kept += 1
        dropped += sum(1 for k in rawd if k not in tpl_sd)
        return out, kept, dropped
    tshape = getattr(tpl_sd, "shape", None)
    rshape = getattr(raw, "shape", None)
    if raw is None or (tshape is not None and rshape is not None
                       and tuple(tshape) != tuple(rshape)):
        return tpl_sd, 1, 0
    return raw, 0, 0


def load_weights_lenient(path_or_dir, params, state):
    """Warm-start load with the reference's load_weights_from_net semantics
    (ofa_mbx4.py:303-341, load_state_dict strict=False): parameters present
    in both checkpoint and net are taken from the checkpoint; the rest keep
    their fresh init. This is how the reference chains checkpoints across
    *different* elastic spaces — e.g. its kernel phase warm-starts from the
    max-net pretrain (train_ofa_net_sr_simple.py:236-240), whose ks_list=[7]
    net has no kernel-transform matrices.

    Returns (params, state, stats) with stats = {kept_template, dropped}."""
    raw = load_checkpoint(path_or_dir)
    merged, kept, dropped = _lenient_merge(
        serialization.to_state_dict(
            jax.tree.map(np.asarray, {"params": params, "state": state})),
        {k: raw.get(k) for k in ("params", "state")})
    tree = serialization.from_state_dict({"params": params, "state": state},
                                         merged)
    return tree["params"], tree["state"], {"kept_template": kept,
                                           "dropped": dropped}


# ---------------------------------------------------------------------------
# Torch (reference) interop
# ---------------------------------------------------------------------------

def _strip_prefixes(sd):
    """Normalize reference state_dict keys: strip 'module.' and collapse the
    dynamic-layer '.bn.bn.' / '.conv.conv.' nestings (the variants
    load_weights_from_net maps, ofa_mbs4.py:226-259)."""
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        k = k.replace(".bn.bn.", ".bn.")
        k = k.replace(".conv.conv.", ".conv.")
        k = k.replace(".linear.linear.", ".linear.")
        out[k] = v
    return out


def _oihw_to_hwio(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dw_oihw_to_hwio(w):
    # torch depthwise [C,1,k,k] -> HWIO [k,k,1,C]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _bn_from(sd, prefix):
    p = {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
         "bias": np.asarray(sd[prefix + ".bias"], np.float32)}
    s = {"mean": np.asarray(sd[prefix + ".running_mean"], np.float32),
         "var": np.asarray(sd[prefix + ".running_var"], np.float32)}
    return p, s


def _conv_layer_from(sd, prefix):
    w = _oihw_to_hwio(np.asarray(sd[prefix + ".conv.weight"], np.float32))
    bn_p, bn_s = _bn_from(sd, prefix + ".bn")
    return {"conv": {"w": w}, "bn": bn_p}, {"bn": bn_s}


def _mbconv_from(sd, prefix, ks_list):
    micp = prefix + ".mobile_inverted_conv"
    p, s = {}, {}
    w_ib = _oihw_to_hwio(np.asarray(
        sd[micp + ".inverted_bottleneck.conv.weight"], np.float32))
    bn_p, bn_s = _bn_from(sd, micp + ".inverted_bottleneck.bn")
    p["inverted_bottleneck"] = {"conv": {"w": w_ib}, "bn": bn_p}
    s["inverted_bottleneck"] = {"bn": bn_s}

    w_dw = _dw_oihw_to_hwio(np.asarray(
        sd[micp + ".depth_conv.conv.weight"], np.float32))
    bn_p, bn_s = _bn_from(sd, micp + ".depth_conv.bn")
    dw = {"conv": {"w": w_dw}, "bn": bn_p}
    kt = {}
    ks_set = sorted(set(ks_list))
    for i in range(len(ks_set) - 1):
        name = "%dto%d" % (ks_set[i + 1], ks_set[i])
        key = micp + ".depth_conv.conv.%s_matrix" % name
        if key in sd:
            kt[name] = np.asarray(sd[key], np.float32)
    if kt:
        dw["kt"] = kt
    p["depth_conv"] = dw
    s["depth_conv"] = {"bn": bn_s}

    w_pl = _oihw_to_hwio(np.asarray(
        sd[micp + ".point_linear.conv.weight"], np.float32))
    bn_p, bn_s = _bn_from(sd, micp + ".point_linear.bn")
    p["point_linear"] = {"conv": {"w": w_pl}, "bn": bn_p}
    s["point_linear"] = {"bn": bn_s}
    return p, s


def import_torch_s4(path_or_sd, net):
    """Reference OFAMobileNetS4 .pth.tar (or its state_dict) -> (params,
    state) for models.OFAMobileNetS4. Reference blocks list layout:
    [MBConv x (4*max_depth), shuffle ConvLayer x max_pixel_d]
    (ofa_mbs4.py:73-120)."""
    sd = _load_torch_sd(path_or_sd)
    sp = net.space
    n_mb = sp.blocks_per_trunk
    p, s = {}, {}
    p["dec_first_conv_block"], s["dec_first_conv_block"] = _conv_layer_from(
        sd, "dec_first_conv_block")
    bp, bs = [], []
    for i in range(n_mb):
        a, b = _mbconv_from(sd, "blocks.%d" % i, sp.ks_list)
        bp.append(a)
        bs.append(b)
    p["blocks"], s["blocks"] = bp, bs
    fp, fs = [], []
    for i in range(2):
        a, b = _conv_layer_from(sd, "dec_final_conv_blocks.%d" % i)
        fp.append(a)
        fs.append(b)
    p["dec_final_conv_blocks"], s["dec_final_conv_blocks"] = fp, fs
    shp, shs = [], []
    for i in range(max(sp.pixel_d_list)):
        a, b = _conv_layer_from(sd, "blocks.%d" % (n_mb + i))
        shp.append(a)
        shs.append(b)
    p["shuffle_blocks"], s["shuffle_blocks"] = shp, shs
    p["dec_final_output_conv_block"], s["dec_final_output_conv_block"] = \
        _conv_layer_from(sd, "dec_final_output_conv_block")
    return jax.tree.map(jnp.asarray, (p, s))


def import_torch_x4(path_or_sd, net):
    """Reference OFAMobileNetX4 layout: blocks =
    [unshuffle x2, enc MBConv x16, dec MBConv x16, shuffle x2]
    (ofa_mbx4.py:70-166)."""
    sd = _load_torch_sd(path_or_sd)
    sp = net.space
    n_mb = sp.blocks_per_trunk
    n_pix = max(sp.pixel_d_list)
    p, s = {}, {}

    up, us = [], []
    for i in range(n_pix):
        a, b = _conv_layer_from(sd, "blocks.%d" % i)
        up.append(a)
        us.append(b)
    p["enc_unshuffle_blocks"], s["enc_unshuffle_blocks"] = up, us

    def trunk(base):
        bp, bs = [], []
        for i in range(n_mb):
            a, b = _mbconv_from(sd, "blocks.%d" % (base + i), sp.ks_list)
            bp.append(a)
            bs.append(b)
        return bp, bs

    p["enc_blocks"], s["enc_blocks"] = trunk(n_pix)
    ep, es = [], []
    for i in range(3):
        a, b = _conv_layer_from(sd, "enc_final_conv_blocks.%d" % i)
        ep.append(a)
        es.append(b)
    p["enc_final_conv_blocks"], s["enc_final_conv_blocks"] = ep, es
    p["dec_first_conv_block"], s["dec_first_conv_block"] = _conv_layer_from(
        sd, "dec_first_conv_block")
    p["dec_blocks"], s["dec_blocks"] = trunk(n_pix + n_mb)
    fp, fs = [], []
    for i in range(2):
        a, b = _conv_layer_from(sd, "dec_final_conv_blocks.%d" % i)
        fp.append(a)
        fs.append(b)
    p["dec_final_conv_blocks"], s["dec_final_conv_blocks"] = fp, fs
    shp, shs = [], []
    for i in range(n_pix):
        a, b = _conv_layer_from(sd, "blocks.%d" % (n_pix + 2 * n_mb + i))
        shp.append(a)
        shs.append(b)
    p["shuffle_blocks"], s["shuffle_blocks"] = shp, shs
    p["dec_final_output_conv_block"], s["dec_final_output_conv_block"] = \
        _conv_layer_from(sd, "dec_final_output_conv_block")
    return jax.tree.map(jnp.asarray, (p, s))


def import_torch_mbv3(path_or_sd, net):
    """Reference OFAMobileNetV3 .pth.tar/state_dict -> (params, state) for
    models.ofa_cls.OFAMobileNetV3 (layout: first_conv, e1-k3 first block,
    5 elastic stages with SE on stages 2/4/5, final_expand, feature_mix
    (no BN), linear classifier — ofa_mbv3.py:55-120)."""
    sd = _load_torch_sd(path_or_sd)
    p, s = {}, {}

    p["first_conv"], s["first_conv"] = _conv_layer_from(sd, "first_conv")

    fb = "blocks.0.mobile_inverted_conv"
    dw_w = _dw_oihw_to_hwio(np.asarray(sd[fb + ".depth_conv.conv.weight"],
                                       np.float32))
    bn1p, bn1s = _bn_from(sd, fb + ".depth_conv.bn")
    pl_w = _oihw_to_hwio(np.asarray(sd[fb + ".point_linear.conv.weight"],
                                    np.float32))
    bn2p, bn2s = _bn_from(sd, fb + ".point_linear.bn")
    p["first_block"] = {"dw": {"w": dw_w, "bn": bn1p},
                        "pl": {"w": pl_w, "bn": bn2p}}
    s["first_block"] = {"dw": {"bn": bn1s}, "pl": {"bn": bn2s}}

    blocks_p, blocks_s = [], []
    for i in range(net.n_blocks):
        bp, bs = _mbconv_from(sd, "blocks.%d" % (i + 1), net.space.ks_list)
        sep = "blocks.%d.mobile_inverted_conv.depth_conv.se.fc" % (i + 1)
        if sep + ".reduce.weight" in sd:
            bp["se"] = {
                "reduce": {"w": _oihw_to_hwio(np.asarray(
                    sd[sep + ".reduce.weight"], np.float32)),
                    "b": np.asarray(sd[sep + ".reduce.bias"], np.float32)},
                "expand": {"w": _oihw_to_hwio(np.asarray(
                    sd[sep + ".expand.weight"], np.float32)),
                    "b": np.asarray(sd[sep + ".expand.bias"], np.float32)},
            }
        blocks_p.append(bp)
        blocks_s.append(bs)
    p["blocks"], s["blocks"] = blocks_p, blocks_s

    if net.final_expand_width:
        # MBV3 head: final_expand (+BN) -> pool -> feature_mix (no BN)
        p["final_expand"], s["final_expand"] = _conv_layer_from(
            sd, "final_expand_layer")
        p["feature_mix"] = {"conv": {"w": _oihw_to_hwio(np.asarray(
            sd["feature_mix_layer.conv.weight"], np.float32))}}
    else:
        # proxyless head: feature_mix (+BN) -> pool
        p["feature_mix"], s["feature_mix"] = _conv_layer_from(
            sd, "feature_mix_layer")
    p["classifier"] = {
        "w": np.ascontiguousarray(
            np.asarray(sd["classifier.linear.weight"], np.float32).T),
        "b": np.asarray(sd["classifier.linear.bias"], np.float32),
    }
    return jax.tree.map(jnp.asarray, (p, s))


def _load_torch_sd(path_or_sd):
    if isinstance(path_or_sd, dict) and not _looks_like_ckpt(path_or_sd):
        return _strip_prefixes(_to_numpy_sd(path_or_sd))
    if isinstance(path_or_sd, dict):
        return _strip_prefixes(_to_numpy_sd(path_or_sd["state_dict"]))
    import torch
    ckpt = torch.load(path_or_sd, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return _strip_prefixes(_to_numpy_sd(sd))


def _looks_like_ckpt(d):
    return "state_dict" in d


def _to_numpy_sd(sd):
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out
