"""Per-video oracle specialization.

Mirrors /root/reference/train_ofa_net_sr_oracle_video.py: overfit one
(sampled or given) architecture of the X4 supernet on one video's frames —
448px center crops, batch 4, Adam 1e-5, 5 epochs, BN frozen in eval mode
(the oracle config, sr_run_manager.py:416-423) — using the codec-decoded
LR/HR pair dataset (--task one_arch_overfit, script :93-103,268-277).

Run: python -m ofa_sr_tpu.cli.train_ofa_net_sr_oracle_video [--synthetic]
"""

from __future__ import annotations

import argparse

from ..data import CodecDecoderProvider, OracleVideoProvider
from ..models import OFAMobileNetX4, SearchSpace, sample_subnet
from ..models.arch import uniform_subnet
from ..train import RunConfig, SRRunManager
from .common import add_common_args, make_sr_provider, set_seeds, perf_config_kw


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", type=str, default="one_arch_overfit",
                   choices=["one_arch_overfit"])
    add_common_args(p, path="exp/sr/oracle_video", n_epochs=5, base_lr=1e-5,
                    batch_size=4, image_size=448)
    p.add_argument("--warmstart", type=str, default=None,
                   help="supernet checkpoint to specialize from")
    p.add_argument("--dataset", type=str, default="codec",
                   choices=["codec", "oracle_video"])
    p.add_argument("--arch_seed", type=int, default=None,
                   help="sample the overfit arch with this seed")
    p.add_argument("--ks", type=int, default=7)
    p.add_argument("--expand", type=int, default=3)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--pixel_d", type=int, default=1)
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    set_seeds(args.manual_seed)

    space = SearchSpace()  # full space; one arch selected below
    net = OFAMobileNetX4(space, bn_momentum=args.bn_momentum,
                         bn_eps=args.bn_eps,
                         use_transform=args.dy_conv_scaling_mode == 1)
    provider_cls = (CodecDecoderProvider if args.dataset == "codec"
                    else OracleVideoProvider)
    provider = make_sr_provider(args, provider_cls)

    if args.arch_seed is not None:
        cfg_arch = sample_subnet(space, seed=args.arch_seed, n_trunks=2)
    else:
        cfg_arch = uniform_subnet(space, args.ks, args.expand, args.depth,
                                  args.pixel_d, n_trunks=2)

    cfg = RunConfig(
        **perf_config_kw(args),
        n_epochs=args.n_epochs, base_lr=args.base_lr,
        opt_type=args.opt_type, weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm or None,
        train_batch_size=args.base_batch_size, dynamic_batch_size=1,
        validation_frequency=args.validation_frequency,
        print_frequency=args.print_frequency,
        manual_seed=args.manual_seed, mode="sr", bn_frozen=True,
        bn_momentum=args.bn_momentum, bn_eps=args.bn_eps,
        image_size=args.image_size)
    rm = SRRunManager(args.path, net, cfg, provider)
    if args.warmstart:
        rm.load_weights(args.warmstart)

    # pin every training step to the single exact overfit arch (the
    # reference one_arch_overfit trains exactly one architecture, including
    # mixed per-block ks/e when sampled)
    best = rm.train(validate_cfgs=[cfg_arch], fixed_cfg=cfg_arch)
    rm.write_log("oracle overfit done (%s): best psnr %.3f"
                 % (cfg_arch.describe()[:60], best), "valid")
    return best


if __name__ == "__main__":
    main()
