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
    """Build a named supernet (reference ofa_net, model_zoo.py:216-242)."""
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


def ofa_specialized(net_id: str, checkpoint: Optional[str] = None):
    """Return (net, params, state, expected) for a catalog entry. Without a
    checkpoint the weights are fresh (the reference downloads them)."""
    if net_id not in SPECIALIZED_CATALOG:
        raise ValueError("unknown specialized net: %s\nknown: %s"
                         % (net_id, sorted(SPECIALIZED_CATALOG)))
    net, params, state = ofa_net("ofa_mbv3_d234_e346_k357_w1.0", checkpoint)
    expected_top1, note = SPECIALIZED_CATALOG[net_id]
    return net, params, state, {"top1": expected_top1, "note": note}
