"""ImageNet OFA progressive shrinking (the Horovod universe).

Mirrors /root/reference/train_ofa_net.py: OFAMobileNetV3 supernet with KD
from a pretrained D4-E6-K7 teacher (kd_ratio 1.0), task/phase schedule over
kernel -> depth -> expand, elastic resolution 128-224, LR scaled by world
size (:150). Data parallelism is a jax.sharding.Mesh over all local devices
(built here, passed to ClsRunManager) instead of Horovod: params/optimizer
replicate, the global batch shards over the 'data' axis, and XLA inserts
the gradient all-reduce (parallel/mesh.py).

Run: python -m ofa_sr_tpu.cli.train_ofa_net --task kernel [--synthetic]
"""

from __future__ import annotations

import argparse

import jax

from ..data.cls_providers import ImagenetProvider, SyntheticClsProvider
from ..data.providers import ElasticResolution
from ..models.ofa_cls import OFAMobileNetV3
from ..train.cls_run_manager import ClsRunManager
from ..train.run_manager import RunConfig
from .common import add_perf_args, perf_config_kw, set_seeds

# reference task table (train_ofa_net.py:33-106)
TASK_PHASES = {
    ("kernel", 1): dict(path="exp/cls/normal2kernel", dynamic_batch_size=1,
                        n_epochs=120, base_lr=3e-2, warmup_epochs=5,
                        ks_list=[3, 5, 7], expand_list=[6], depth_list=[4]),
    ("depth", 1): dict(path="exp/cls/kernel2kernel_depth/phase1",
                       dynamic_batch_size=2, n_epochs=25, base_lr=2.5e-3,
                       warmup_epochs=0, ks_list=[3, 5, 7], expand_list=[6],
                       depth_list=[3, 4]),
    ("depth", 2): dict(path="exp/cls/kernel2kernel_depth/phase2",
                       dynamic_batch_size=2, n_epochs=120, base_lr=7.5e-3,
                       warmup_epochs=5, ks_list=[3, 5, 7], expand_list=[6],
                       depth_list=[2, 3, 4]),
    ("expand", 1): dict(path="exp/cls/kernel_depth2kernel_depth_width/phase1",
                        dynamic_batch_size=4, n_epochs=25, base_lr=2.5e-3,
                        warmup_epochs=0, ks_list=[3, 5, 7],
                        expand_list=[4, 6], depth_list=[2, 3, 4]),
    ("expand", 2): dict(path="exp/cls/kernel_depth2kernel_depth_width/phase2",
                        dynamic_batch_size=4, n_epochs=120, base_lr=7.5e-3,
                        warmup_epochs=5, ks_list=[3, 5, 7],
                        expand_list=[3, 4, 6], depth_list=[2, 3, 4]),
}


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", type=str, default="kernel",
                   choices=["kernel", "depth", "expand"])
    p.add_argument("--phase", type=int, default=1, choices=[1, 2])
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--path", type=str, default=None)
    p.add_argument("--base_batch_size", type=int, default=64,
                   help="per-device batch (reference :109); global = x devices")
    p.add_argument("--image_size", type=str, default="128,160,192,224")
    p.add_argument("--kd_ratio", type=float, default=1.0)
    p.add_argument("--teacher_ckpt", type=str, default=None)
    p.add_argument("--manual_seed", type=int, default=0)
    p.add_argument("--warmstart", type=str, default=None)
    p.add_argument("--n_epochs", type=int, default=None)
    add_perf_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    preset = TASK_PHASES[(args.task, args.phase)]
    set_seeds(args.manual_seed)

    n_dev = jax.device_count()
    global_bs = args.base_batch_size * n_dev
    # init_lr = base_lr * num_devices (train_ofa_net.py:150)
    base_lr = preset["base_lr"] * n_dev

    net = OFAMobileNetV3(ks_list=preset["ks_list"],
                         expand_list=preset["expand_list"],
                         depth_list=preset["depth_list"])

    sizes = [int(s) for s in args.image_size.split(",")]
    if args.synthetic:
        provider = SyntheticClsProvider(n_train=global_bs * 4, n_test=64,
                                        image_size=max(sizes),
                                        n_classes=1000,
                                        train_batch_size=global_bs)
    else:
        provider = ImagenetProvider(
            root=args.data_root, image_size=max(sizes),
            train_batch_size=global_bs,
            elastic=ElasticResolution(sizes, sync_distributed=True))

    teacher = None
    kd_ratio = args.kd_ratio
    if kd_ratio > 0 and args.teacher_ckpt:
        t_net = OFAMobileNetV3(ks_list=[7], expand_list=[6], depth_list=[4])
        tp, ts = t_net.init(jax.random.PRNGKey(0))
        from ..train.checkpoint import load_checkpoint
        ck = load_checkpoint(args.teacher_ckpt,
                             template={"params": tp, "state": ts})
        teacher = (t_net, ck["params"], ck["state"], t_net.max_arch())
    elif kd_ratio > 0:
        kd_ratio = 0.0  # no teacher checkpoint available

    n_epochs = args.n_epochs if args.n_epochs is not None else preset["n_epochs"]
    cfg = RunConfig(
        **perf_config_kw(args),
        n_epochs=n_epochs, base_lr=base_lr,
        warmup_epochs=preset["warmup_epochs"], opt_type="sgd",
        weight_decay=3e-5, train_batch_size=global_bs,
        dynamic_batch_size=preset["dynamic_batch_size"],
        kd_ratio=kd_ratio, kd_type="ce", manual_seed=args.manual_seed)
    mesh = None
    if n_dev > 1:
        from ..parallel import make_mesh
        mesh = make_mesh()
    rm = ClsRunManager(args.path or preset["path"], net, cfg, provider,
                       teacher=teacher, mesh=mesh)
    if args.warmstart:
        rm.load_weights(args.warmstart)
    best = rm.train()
    rm.write_log("task %s phase %d: best top1 %.2f"
                 % (args.task, args.phase, best), "valid")
    return best


if __name__ == "__main__":
    main()
