"""CIFAR-10 elastic-kernel supernet (the repaired single-host variant).

The reference train_ofa_net_cifar10_simple.py is non-runnable (its horovod
import is commented out while hvd.* calls remain — SURVEY.md §2.6 marks it
vestigial/broken). This is the working equivalent: OFAMobileNetV3 on
CIFAR-10 with elastic kernel (3/5/7), optional KD from a teacher checkpoint,
multi-subnet gradient accumulation — BASELINE.json config[1].

Run: python -m ofa_sr_tpu.cli.train_ofa_net_cifar10_simple [--synthetic]
"""

from __future__ import annotations

import argparse

import jax

from ..data.cls_providers import Cifar10Provider, SyntheticClsProvider
from ..models.ofa_cls import OFAMobileNetV3
from ..train.cls_run_manager import ClsRunManager
from ..train.run_manager import RunConfig
from .common import add_perf_args, perf_config_kw, set_seeds


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", type=str, default="exp/cls/cifar10_ofa_kernel")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n_epochs", type=int, default=120)
    p.add_argument("--base_lr", type=float, default=3e-2)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--base_batch_size", type=int, default=256)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--dynamic_batch_size", type=int, default=1)
    p.add_argument("--kd_ratio", type=float, default=0.0)
    p.add_argument("--teacher_ckpt", type=str, default=None)
    p.add_argument("--warmstart", type=str, default=None)
    p.add_argument("--manual_seed", type=int, default=0)
    add_perf_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    set_seeds(args.manual_seed)
    net = OFAMobileNetV3(n_classes=10, ks_list=[3, 5, 7], expand_list=[6],
                         depth_list=[4])
    if args.synthetic:
        provider = SyntheticClsProvider(
            n_train=args.base_batch_size * 2, n_test=64,
            image_size=args.image_size, n_classes=10,
            train_batch_size=args.base_batch_size)
    else:
        provider = Cifar10Provider(root=args.data_root,
                                   image_size=args.image_size,
                                   train_batch_size=args.base_batch_size)

    teacher, kd_ratio = None, args.kd_ratio
    if kd_ratio > 0 and args.teacher_ckpt:
        t_net = OFAMobileNetV3(n_classes=10, ks_list=[7], expand_list=[6],
                               depth_list=[4])
        tp, ts = t_net.init(jax.random.PRNGKey(0))
        from ..train.checkpoint import load_checkpoint
        ck = load_checkpoint(args.teacher_ckpt,
                             template={"params": tp, "state": ts})
        teacher = (t_net, ck["params"], ck["state"], t_net.max_arch())
    else:
        kd_ratio = 0.0

    cfg = RunConfig(**perf_config_kw(args),
                    n_epochs=args.n_epochs, base_lr=args.base_lr,
                    warmup_epochs=args.warmup_epochs, opt_type="sgd",
                    weight_decay=3e-5,
                    train_batch_size=args.base_batch_size,
                    dynamic_batch_size=args.dynamic_batch_size,
                    kd_ratio=kd_ratio, kd_type="ce",
                    manual_seed=args.manual_seed)
    rm = ClsRunManager(args.path, net, cfg, provider, teacher=teacher)
    if args.warmstart:
        rm.load_weights(args.warmstart)
    best = rm.train()
    rm.write_log("cifar10 ofa kernel supernet: best top1 %.2f" % best, "valid")
    return best


if __name__ == "__main__":
    main()
