"""SR supernet progressive shrinking.

Mirrors /root/reference/train_ofa_net_sr_simple.py: an OFAMobileNetX4
supernet shrunk task by task — kernel -> depth(p1,p2) -> expand(p1,p2) ->
pixelshuffle_depth — each warm-starting from the previous task's best
checkpoint; per-task hyperparameters from the script's phase table (:28-93).

Run: python -m ofa_sr_tpu.cli.train_ofa_net_sr_simple \
       --task pixelshuffle_depth --phase 2 [--synthetic]
"""

from __future__ import annotations

import argparse

from ..data import Div2KSetXXProvider
from ..models import OFAMobileNetX4, SearchSpace
from ..train import RunConfig, SRRunManager
from ..train.shrink import supporting_elastic
from .common import add_common_args, make_sr_provider, set_seeds, perf_config_kw

# the reference phase table (train_ofa_net_sr_simple.py:28-93)
TASK_PHASES = {
    # the max-net pretraining that produces the checkpoint the kernel phase
    # warm-starts from (train_ofa_net_sr_simple.py:236-240 loads
    # 'sr_bn_mse_normal2pixelshuffle/checkpoint/model_best.pth.tar'; that
    # run's own hyperparameters are not in the repo — kernel-phase values
    # reused here)
    ("pretrain", 1): dict(path="exp/sr/normal2pixelshuffle",
                          dynamic_batch_size=1, n_epochs=120, base_lr=3e-2,
                          warmup_epochs=5, ks_list=[7], expand_list=[6],
                          depth_list=[4], pixel_d_list=[2]),
    ("kernel", 1): dict(path="exp/sr/normal2kernel", dynamic_batch_size=1,
                        n_epochs=120, base_lr=3e-2, warmup_epochs=5,
                        ks_list=[3, 5, 7], expand_list=[6], depth_list=[4],
                        pixel_d_list=[2]),
    ("depth", 1): dict(path="exp/sr/kernel2kernel_depth/phase1",
                       dynamic_batch_size=2, n_epochs=25, base_lr=2.5e-3,
                       warmup_epochs=0, ks_list=[3, 5, 7], expand_list=[6],
                       depth_list=[3, 4], pixel_d_list=[2]),
    ("depth", 2): dict(path="exp/sr/kernel2kernel_depth/phase2",
                       dynamic_batch_size=2, n_epochs=120, base_lr=7.5e-3,
                       warmup_epochs=5, ks_list=[3, 5, 7], expand_list=[6],
                       depth_list=[2, 3, 4], pixel_d_list=[2]),
    ("expand", 1): dict(path="exp/sr/kernel_depth2kernel_depth_width/phase1",
                        dynamic_batch_size=4, n_epochs=25, base_lr=2.5e-3,
                        warmup_epochs=0, ks_list=[3, 5, 7], expand_list=[4, 6],
                        depth_list=[2, 3, 4], pixel_d_list=[2]),
    ("expand", 2): dict(path="exp/sr/kernel_depth2kernel_depth_width/phase2",
                        dynamic_batch_size=4, n_epochs=120, base_lr=7.5e-3,
                        warmup_epochs=5, ks_list=[3, 5, 7],
                        expand_list=[3, 4, 6], depth_list=[2, 3, 4],
                        pixel_d_list=[2]),
    ("pixelshuffle_depth", 1): dict(
        path="exp/sr/sr_bn_mse_4xLarge2pixelShuffle", dynamic_batch_size=1,
        n_epochs=25, base_lr=1e-4, warmup_epochs=5, ks_list=[7],
        expand_list=[6], depth_list=[4], pixel_d_list=[1, 2]),
}
TASK_PHASES[("pixelshuffle_depth", 2)] = TASK_PHASES[("pixelshuffle_depth", 1)]


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", type=str, default="pixelshuffle_depth",
                   choices=["pretrain", "kernel", "depth", "expand",
                            "pixelshuffle_depth"])
    p.add_argument("--phase", type=int, default=2, choices=[1, 2])
    p.add_argument("--warmstart", type=str, default=None,
                   help="checkpoint dir/file of the previous task's best")
    p.add_argument("--reference_quirks", action="store_true",
                   help="train the architectures the reference *actually "
                        "executes* (its runtime_depth indexing quirks, "
                        "models/arch.reference_quirk_arch_*) — for exact "
                        "side-by-side runs against the torch reference")
    p.add_argument("--mode", type=str, default="sr",
                   choices=["sr", "autoencoder"],
                   help="sr: decoder-only on bicubic LR (the README config); "
                        "autoencoder: learned downscale + SR")
    p.add_argument("--sandwich", action="store_true",
                   help="sandwich rule: pin sampled subnet k=0 of every "
                        "step to the max corner within the stage's "
                        "constraints (Universally Slimmable Networks). "
                        "Stops the max/PD2 corner decaying through the "
                        "shrink phases (both backends measured it sinking "
                        "below bicubic-x4 under the reference's uniform "
                        "sampling). Needs --dynamic_batch_size >= 2")
    p.add_argument("--corner_gate", action="store_true",
                   help="snapshot per-corner best weights during periodic "
                        "validation (best_<corner>.ckpt + corner_best.json "
                        "provenance). The reference gates each phase on "
                        "best mean validation PSNR and deploys per-subnet "
                        "checkpoints from the history; this makes that "
                        "per-corner. Needs --validation_frequency <= "
                        "n_epochs to ever fire")
    p.add_argument("--kd_teacher", type=str, default=None,
                   help="checkpoint dir/file of a trained max-net "
                        "(ks7/e6/d4/pd2 X4) used as the KD teacher when "
                        "--kd_ratio > 0 — the working version of the "
                        "reference's intended supernet-phase KD "
                        "(progressive_shrinking.py:182-192, bugged there "
                        "with a `labels` NameError; SURVEY.md §7.3)")
    # warmup_epochs/dynamic_batch_size default to None so the TASK_PHASES
    # preset values apply unless explicitly overridden on the CLI
    add_common_args(p, path=None, n_epochs=None, base_lr=None, batch_size=16,
                    warmup_epochs=None, dynamic_batch_size=None)
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    preset = TASK_PHASES[(args.task, args.phase)]
    for key in ("path", "n_epochs", "base_lr", "warmup_epochs",
                "dynamic_batch_size"):
        if getattr(args, key, None) is None:
            setattr(args, key, preset[key])
    set_seeds(args.manual_seed)

    space = SearchSpace(ks_list=preset["ks_list"],
                        expand_list=preset["expand_list"],
                        depth_list=preset["depth_list"],
                        pixel_d_list=preset["pixel_d_list"])
    net = OFAMobileNetX4(space, bn_momentum=args.bn_momentum,
                         bn_eps=args.bn_eps,
                         use_transform=args.dy_conv_scaling_mode == 1)
    provider = make_sr_provider(args, Div2KSetXXProvider)

    teacher = None
    kd_ratio = args.kd_ratio
    if kd_ratio > 0 and args.kd_teacher:
        import jax
        from flax import serialization
        from ..models.arch import reference_quirk_arch_x4, uniform_subnet
        from ..train.checkpoint import load_checkpoint
        t_space = SearchSpace(ks_list=[7], expand_list=[6], depth_list=[4],
                              pixel_d_list=[2])
        t_net = OFAMobileNetX4(t_space, bn_momentum=args.bn_momentum,
                               bn_eps=args.bn_eps,
                               use_transform=args.dy_conv_scaling_mode == 1)
        tp, ts = t_net.init(jax.random.PRNGKey(0))
        raw = load_checkpoint(args.kd_teacher)
        t_params = serialization.from_state_dict(tp, raw["params"])
        t_state = serialization.from_state_dict(ts, raw["state"])
        t_cfg = uniform_subnet(t_space, 7, 6, 4, 2, n_trunks=t_net.n_trunks)
        if args.reference_quirks:
            # the teacher checkpoint was trained on the as-executed quirk
            # architecture — score/teach with the same net
            t_cfg = reference_quirk_arch_x4(t_cfg)
        teacher = (t_net, t_params, t_state, t_cfg)
    elif kd_ratio > 0:
        kd_ratio = 0.0  # no teacher checkpoint available

    cfg = RunConfig(
        **perf_config_kw(args),
        n_epochs=args.n_epochs, base_lr=args.base_lr,
        warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
        opt_type=args.opt_type, weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm or None,
        train_batch_size=args.base_batch_size,
        dynamic_batch_size=args.dynamic_batch_size,
        validation_frequency=args.validation_frequency,
        print_frequency=args.print_frequency,
        save_frequency=args.save_frequency, kd_ratio=kd_ratio,
        manual_seed=args.manual_seed, mode=args.mode,
        bn_momentum=args.bn_momentum, bn_eps=args.bn_eps,
        image_size=args.image_size,
        reference_quirks=args.reference_quirks,
        sandwich_rule=args.sandwich, corner_gate=args.corner_gate)
    rm = SRRunManager(args.path, net, cfg, provider, teacher=teacher)

    # eval grid pinned to min/max of each dimension
    # (train_ofa_net_sr_simple.py:227-232)
    validate_lists = {
        "ks_list": sorted({min(space.ks_list), max(space.ks_list)}),
        "expand_list": sorted({min(space.expand_list), max(space.expand_list)}),
        "depth_list": sorted({min(space.depth_list), max(space.depth_list)}),
        "pixel_d_list": sorted(space.pixel_d_list),
    }
    best = supporting_elastic(rm, args.task, warmstart_path=args.warmstart,
                              validate_lists=validate_lists)
    rm.write_log("task %s phase %d done: best psnr %.3f"
                 % (args.task, args.phase, best), "valid")
    return best


if __name__ == "__main__":
    main()
