"""Model zoo (reference ofa/model_zoo.py:191-243).

`ofa_net(net_id)` builds the named OFA supernet; `ofa_specialized(net_id)`
returns (net, arch, expected_metrics) for the published specialized subnets
(the catalog embedded in eval_specialized_net.py:19-81). The reference
downloads pretrained torch weights; this environment has no egress, so both
accept a local checkpoint (native .ckpt via train.checkpoint, or a reference
.pth.tar via the torch importers) and otherwise return fresh-initialized
parameters.
"""

from __future__ import annotations

from typing import Optional

from .models.ofa_cls import OFAMobileNetV3, OFAProxylessNASNets

def _catalog():
    """The published specialized-net catalog (the 44 net ids embedded at
    eval_specialized_net.py:19-81). Each id encodes its own published top-1
    and deployment constraint: '<device>@<constraint>_top1@<acc>_finetune@<ep>'."""
    ids = ["flops@595M_top1@80.0_finetune@75",
           "flops@482M_top1@79.6_finetune@75",
           "flops@389M_top1@79.1_finetune@75"]
    for dev, entries in {
        "pixel1_lat": ["143ms:80.1:75", "132ms:79.8:75", "79ms:78.7:75",
                       "58ms:76.9:75", "40ms:74.9:25", "28ms:73.3:25",
                       "20ms:71.4:25"],
        "pixel2_lat": ["62ms:75.8:25", "50ms:74.7:25", "35ms:73.4:25",
                       "25ms:71.5:25"],
        "note10_lat": ["64ms:80.2:75", "50ms:79.7:75", "41ms:79.3:75",
                       "30ms:78.4:75", "22ms:76.6:25", "16ms:75.5:25",
                       "11ms:73.6:25", "8ms:71.4:25"],
        "note8_lat": ["65ms:76.1:25", "49ms:74.9:25", "31ms:72.8:25",
                      "22ms:70.4:25"],
        "s7edge_lat": ["88ms:76.3:25", "58ms:74.7:25", "41ms:73.1:25",
                       "29ms:70.5:25"],
        "LG-G8_lat": ["24ms:76.4:25", "16ms:74.7:25", "11ms:73.0:25",
                      "8ms:71.1:25"],
        "1080ti_gpu64": ["27ms:76.4:25", "22ms:75.3:25", "15ms:73.8:25",
                         "12ms:72.6:25"],
        "v100_gpu64": ["11ms:76.1:25", "9ms:75.3:25", "6ms:73.0:25",
                       "5ms:71.6:25"],
        "tx2_gpu16": ["96ms:75.8:25", "80ms:75.4:25", "47ms:72.9:25",
                      "35ms:70.3:25"],
        "cpu_lat": ["17ms:75.7:25", "15ms:74.6:25", "11ms:72.0:25",
                    "10ms:71.1:25"],
    }.items():
        for e in entries:
            ms, acc, ft = e.split(":")
            ids.append("%s@%s_top1@%s_finetune@%s" % (dev, ms, acc, ft))
    table = {}
    for nid in ids:
        top1 = float(nid.split("_top1@")[1].split("_")[0])
        note = nid.split("_top1@")[0].replace("@", " ")
        table[nid] = (top1, note)
    return table


SPECIALIZED_CATALOG = _catalog()


def ofa_net(net_id: str = "ofa_mbv3_d234_e346_k357_w1.0",
            checkpoint: Optional[str] = None):
    """Build a named supernet (reference ofa_net, model_zoo.py:216-242).

    Beyond the reference's three classification ids, the SR supernets get
    ids too: 'ofa_s4_d234_e346_k357_pd12' (decoder-only SR) and
    'ofa_x4_d234_e346_k357_pd12' (downscale+SR autoencoder). `checkpoint`
    accepts a native .ckpt dir/file or a reference .pth.tar (detected by
    extension and routed through the torch importers)."""
    if net_id.startswith(("ofa_s4", "ofa_x4")):
        import jax

        from .models import OFAMobileNetS4, OFAMobileNetX4, SearchSpace

        if net_id not in ("ofa_s4_d234_e346_k357_pd12",
                          "ofa_x4_d234_e346_k357_pd12"):
            raise ValueError(
                "unknown SR supernet id %r (supported: "
                "ofa_s4_d234_e346_k357_pd12, ofa_x4_d234_e346_k357_pd12; "
                "build OFAMobileNetS4/X4 with a custom SearchSpace "
                "directly for other spaces)" % net_id)
        space = SearchSpace()  # ks 3/5/7, e 3/4/6, d 2/3/4, pixel_d 1/2
        net = (OFAMobileNetS4(space) if net_id.startswith("ofa_s4")
               else OFAMobileNetX4(space))
        params, state = net.init(jax.random.PRNGKey(0))
        if checkpoint:
            if checkpoint.endswith((".pth.tar", ".pth", ".tar")):
                from .train.checkpoint import import_torch_s4, import_torch_x4
                imp = (import_torch_s4 if net_id.startswith("ofa_s4")
                       else import_torch_x4)
                params, state = imp(checkpoint, net)
            else:
                from .train.checkpoint import load_checkpoint
                ckpt = load_checkpoint(checkpoint, template={
                    "params": params, "state": state})
                params, state = ckpt["params"], ckpt["state"]
        return net, params, state

    if net_id.startswith("ofa_proxyless"):
        # e.g. ofa_proxyless_d234_e346_k357_w1.3
        wm = float(net_id.split("_w")[-1]) if "_w" in net_id else 1.0
        net = OFAProxylessNASNets(ks_list=(3, 5, 7), expand_list=(3, 4, 6),
                                  depth_list=(2, 3, 4), width_mult=wm)
    elif net_id.startswith("ofa_mbv3"):
        wm = float(net_id.split("_w")[-1]) if "_w" in net_id else 1.0
        net = OFAMobileNetV3(ks_list=(3, 5, 7), expand_list=(3, 4, 6),
                             depth_list=(2, 3, 4), width_mult=wm)
    else:
        raise ValueError("unknown net_id: %s" % net_id)

    import jax
    params, state = net.init(jax.random.PRNGKey(0))
    if checkpoint:
        from .train.checkpoint import load_checkpoint
        ckpt = load_checkpoint(checkpoint,
                               template={"params": params, "state": state})
        params, state = ckpt["params"], ckpt["state"]
    return net, params, state


def ofa_specialized(net_id: str, root: Optional[str] = None,
                    net_config=None, init: Optional[str] = None,
                    supernet=None, arch=None):
    """Build the *actual specialized architecture* and return
    (static_net, params, state, expected) — the reference ofa_specialized
    path (model_zoo.py:191-213: download net.config -> build_from_config ->
    load 'init' weights). No egress here, so the config comes from one of:

    - `root`: a local mirror of .torch/ofa_specialized/ — reads
      <root>/<net_id>/net.config (+ run.config image_size, + 'init' torch
      weights if present);
    - `net_config`: a net.config dict or JSON path (+ optional `init`
      torch-weights path);
    - `supernet`=(elastic_net, params, state) and `arch`: slice the subnet
      out of a trained supernet (get_active_subnet deployment,
      ofa_mbv3.py:293-317).
    """
    import json
    import os

    import jax

    from .models.net_config import (
        build_from_config,
        import_torch_static,
        specialize,
    )

    if net_id not in SPECIALIZED_CATALOG:
        raise ValueError("unknown specialized net: %s\nknown: %s"
                         % (net_id, sorted(SPECIALIZED_CATALOG)))
    expected_top1, note = SPECIALIZED_CATALOG[net_id]
    expected = {"top1": expected_top1, "note": note, "image_size": 224}

    if root is not None:
        base = os.path.join(root, net_id)
        with open(os.path.join(base, "net.config")) as f:
            net_config = json.load(f)
        run_cfg = os.path.join(base, "run.config")
        if os.path.exists(run_cfg):
            with open(run_cfg) as f:
                expected["image_size"] = json.load(f).get("image_size", 224)
        init_path = os.path.join(base, "init")
        if init is None and os.path.exists(init_path):
            init = init_path

    if net_config is not None:
        if isinstance(net_config, str):
            with open(net_config) as f:
                net_config = json.load(f)
        static = build_from_config(net_config)
        if init is not None:
            params, state = import_torch_static(init, static)
        else:
            params, state = static.init(jax.random.PRNGKey(0))
        return static, params, state, expected

    if supernet is not None and arch is not None:
        e_net, e_params, e_state = supernet
        static, params, state = specialize(e_net, e_params, e_state, arch)
        return static, params, state, expected

    raise ValueError(
        "ofa_specialized needs an architecture source: pass root= (a local "
        "mirror of the reference's .torch/ofa_specialized download dir), "
        "net_config= (a net.config dict/JSON path), or supernet=+arch= "
        "(slice from a trained supernet). The reference downloads these "
        "from hanlab.mit.edu (model_zoo.py:191-213); this environment has "
        "no egress.")
