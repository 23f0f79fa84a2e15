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

# the published specialized-net catalog (eval_specialized_net.py:19-81),
# net_id -> (top1, metric_note)
SPECIALIZED_CATALOG = {
    "flops@595M_top1@80.0_finetune@75": (80.0, "595M FLOPs"),
    "flops@482M_top1@79.6_finetune@75": (79.6, "482M FLOPs"),
    "flops@389M_top1@79.1_finetune@75": (79.1, "389M FLOPs"),
    "pixel1_lat@143ms_top1@80.1_finetune@75": (80.1, "Pixel1 143ms"),
    "pixel1_lat@132ms_top1@79.8_finetune@75": (79.8, "Pixel1 132ms"),
    "note10_lat@64ms_top1@80.2_finetune@75": (80.2, "Note10 64ms"),
    "v100_gpu64@11ms_top1@76.1_finetune@25": (76.1, "V100 bs64 11ms"),
    "cpu_lat@17ms_top1@75.7_finetune@25": (75.7, "Xeon bs1 17ms"),
}


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
