"""Evaluate a (sampled) subnet of a classification OFA supernet.

Mirrors /root/reference/eval_ofa_net.py:58-79 — the canonical OFA deployment
eval: sample/set a subnet, recalibrate BN on a calibration subset
(reset_running_statistics), then validate top-1/top-5.

Run: python -m ofa_sr_tpu.cli.eval_ofa_net --net ofa_mbv3_d234_e346_k357_w1.0 \
       [--checkpoint <dir>] [--synthetic]
"""

from __future__ import annotations

import argparse

from ..data.cls_providers import (
    Cifar10Provider,
    ImagenetProvider,
    SyntheticClsProvider,
)
from ..model_zoo import ofa_net
from ..train.cls_run_manager import ClsRunManager
from ..train.run_manager import RunConfig
from .common import set_seeds


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", type=str, default="exp/cls/eval")
    p.add_argument("--net", type=str, default="ofa_mbv3_d234_e346_k357_w1.0")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--dataset", type=str, default="imagenet",
                   choices=["imagenet", "cifar10"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--arch_seed", type=int, default=0,
                   help="seed for sample_arch; -1 = max subnet")
    p.add_argument("--materialize", action="store_true",
                   help="slice + jit the static subnet (deployment path, "
                        "get_active_subnet equivalent)")
    p.add_argument("--manual_seed", type=int, default=0)
    p.add_argument("--export", type=str, default=None,
                   help="write an AOT serving artifact (jax.export "
                        "StableHLO, cpu+tpu) of the BN-recalibrated subnet")
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    set_seeds(args.manual_seed)
    net, params, state = ofa_net(args.net, checkpoint=args.checkpoint)
    if args.synthetic:
        provider = SyntheticClsProvider(n_train=64, n_test=32,
                                        image_size=args.image_size,
                                        n_classes=net.n_classes,
                                        train_batch_size=32,
                                        test_batch_size=32)
    elif args.dataset == "cifar10":
        provider = Cifar10Provider(root=args.data_root,
                                   image_size=args.image_size)
    else:
        provider = ImagenetProvider(root=args.data_root,
                                    image_size=args.image_size)

    rm = ClsRunManager(args.path, net, RunConfig(), provider, init=False,
                       params=params, state=state)

    arch = (net.max_arch() if args.arch_seed < 0
            else net.sample_arch(seed=args.arch_seed))
    # the canonical deployment path: BN recalibration before eval
    rm.reset_running_statistics(arch, n_images=min(2000, 64), batch_size=32)
    if args.export:
        from ..models.export import export_cls_subnet
        blob = export_cls_subnet(net, rm.params, rm.state, arch,
                                 image_size=args.image_size,
                                 path=args.export)
        rm.write_log("exported %s (%d bytes, %dpx)"
                     % (args.export, len(blob), args.image_size), "valid")
    if args.materialize:
        import jax
        import jax.numpy as jnp
        import numpy as np
        from ..models.materialize_cls import get_active_cls_subnet
        from ..train.cls_trainer import topk_accuracy
        sub = jax.jit(get_active_cls_subnet(net, rm.params, rm.state, arch))
        top1s = []
        for batch in provider.test:
            logits = sub(jnp.asarray(batch["image"]))
            top1s.append(float(topk_accuracy(logits, jnp.asarray(batch["label"]), 1)))
        top1 = float(np.mean(top1s))
        rm.write_log("materialized %s: top1 %.2f" % (arch.describe()[:50], top1),
                     "valid")
        return top1
    loss, top1, top5 = rm.validate(arch)
    rm.write_log("eval %s: loss %.4f top1 %.2f top5 %.2f"
                 % (arch.describe()[:60], loss, top1, top5), "valid")
    return top1


if __name__ == "__main__":
    main()
