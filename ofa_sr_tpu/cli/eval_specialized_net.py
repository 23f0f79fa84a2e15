"""Validate a named specialized net from the catalog.

Mirrors /root/reference/eval_specialized_net.py: pick a net_id from the
published catalog (embedded at :19-81 there, model_zoo.SPECIALIZED_CATALOG
here), build it, validate, and report measured vs published top-1. Weights
come from --checkpoint (the reference downloads them; no egress here).

Run: python -m ofa_sr_tpu.cli.eval_specialized_net \
       --net flops@595M_top1@80.0_finetune@75 [--synthetic]
"""

from __future__ import annotations

import argparse

from ..data.cls_providers import ImagenetProvider, SyntheticClsProvider
from ..model_zoo import SPECIALIZED_CATALOG, ofa_specialized
from ..train.cls_run_manager import ClsRunManager
from ..train.run_manager import RunConfig
from .common import set_seeds


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", type=str, default="exp/cls/eval_specialized")
    p.add_argument("--net", type=str,
                   default="flops@595M_top1@80.0_finetune@75",
                   choices=sorted(SPECIALIZED_CATALOG))
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--manual_seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    set_seeds(args.manual_seed)
    net, params, state, expected = ofa_specialized(args.net, args.checkpoint)
    if args.synthetic:
        provider = SyntheticClsProvider(n_train=64, n_test=32,
                                        image_size=args.image_size,
                                        n_classes=net.n_classes,
                                        train_batch_size=32,
                                        test_batch_size=32)
    else:
        provider = ImagenetProvider(root=args.data_root,
                                    image_size=args.image_size)
    rm = ClsRunManager(args.path, net, RunConfig(), provider, init=False,
                       params=params, state=state)
    loss, top1, top5 = rm.validate(net.max_arch())
    rm.write_log("%s: measured top1 %.2f / published %.1f (%s)"
                 % (args.net, top1, expected["top1"], expected["note"]),
                 "valid")
    return top1


if __name__ == "__main__":
    main()
