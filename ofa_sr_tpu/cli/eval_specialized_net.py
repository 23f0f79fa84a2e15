"""Validate a named specialized net from the catalog.

Mirrors /root/reference/eval_specialized_net.py: pick a net_id from the
published catalog (embedded at :19-81 there, model_zoo.SPECIALIZED_CATALOG
here), build the *actual specialized architecture* from its net.config
(reference downloads it, model_zoo.py:191-213; here --config_root points at
a local mirror, --net_config at a config JSON, or --supernet_checkpoint +
--arch_config slices it from a trained supernet), validate, and report
measured vs published top-1.

Run: python -m ofa_sr_tpu.cli.eval_specialized_net \
       --net flops@595M_top1@80.0_finetune@75 --net_config x.json [--synthetic]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from ..data.cls_providers import ImagenetProvider, SyntheticClsProvider
from ..model_zoo import SPECIALIZED_CATALOG, ofa_specialized
from ..train.cls_trainer import cross_entropy, topk_accuracy
from ..utils.common import AverageMeter
from .common import set_seeds


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", type=str, default="exp/cls/eval_specialized")
    p.add_argument("--net", type=str,
                   default="flops@595M_top1@80.0_finetune@75",
                   choices=sorted(SPECIALIZED_CATALOG))
    p.add_argument("--config_root", type=str, default=None,
                   help="local mirror of .torch/ofa_specialized/")
    p.add_argument("--net_config", type=str, default=None,
                   help="net.config JSON path")
    p.add_argument("--init", type=str, default=None,
                   help="torch 'init' weights for the specialized net")
    p.add_argument("--supernet_checkpoint", type=str, default=None,
                   help="native supernet .ckpt to slice the subnet from")
    p.add_argument("--arch_config", type=str, default=None,
                   help="JSON with {ks, e, d[, wid]} when slicing from a "
                        "supernet")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--manual_seed", type=int, default=0)
    p.add_argument("--export", type=str, default=None,
                   help="write an AOT serving artifact (jax.export "
                        "StableHLO, cpu+tpu) of the specialized net")
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    set_seeds(args.manual_seed)

    supernet = arch = None
    if args.supernet_checkpoint:
        from ..model_zoo import ofa_net
        from ..models.ofa_cls import ClsArch
        e_net, e_params, e_state = ofa_net(checkpoint=args.supernet_checkpoint)
        supernet = (e_net, e_params, e_state)
        with open(args.arch_config) as f:
            a = json.load(f)
        arch = ClsArch(tuple(a["ks"]), tuple(a["e"]), tuple(a["d"]),
                       a.get("wid"))

    net, params, state, expected = ofa_specialized(
        args.net, root=args.config_root, net_config=args.net_config,
        init=args.init, supernet=supernet, arch=arch)
    image_size = args.image_size or expected["image_size"]
    n_classes = net.config["classifier"]["out_features"]

    if args.synthetic:
        provider = SyntheticClsProvider(n_train=64, n_test=32,
                                        image_size=image_size,
                                        n_classes=n_classes,
                                        train_batch_size=32,
                                        test_batch_size=32)
    else:
        provider = ImagenetProvider(root=args.data_root,
                                    image_size=image_size)

    if args.export:
        from ..models.export import export_fn
        blob = export_fn(
            lambda x: net.apply(params, state, x, training=False)[0],
            (1, image_size, image_size, 3), path=args.export)
        print("exported %s (%d bytes, %dpx)"
              % (args.export, len(blob), image_size))

    @jax.jit
    def eval_step(x, labels):
        logits, _ = net.apply(params, state, x, training=False)
        return (cross_entropy(logits, labels, 0.0),
                topk_accuracy(logits, labels, 1),
                topk_accuracy(logits, labels, 5))

    losses, top1s, top5s = AverageMeter(), AverageMeter(), AverageMeter()
    for batch in provider.test:
        x = jnp.asarray(batch["image"])
        labels = jnp.asarray(batch["label"])
        loss, t1, t5 = eval_step(x, labels)
        n = x.shape[0]
        losses.update(float(loss), n)
        top1s.update(float(t1), n)
        top5s.update(float(t5), n)
    print("%s: measured top1 %.2f top5 %.2f loss %.4f / published %.1f (%s)"
          % (args.net, top1s.avg, top5s.avg, losses.avg,
             expected["top1"], expected["note"]))
    return top1s.avg


if __name__ == "__main__":
    main()
