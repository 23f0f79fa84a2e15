"""Shared CLI plumbing for the entry points (SURVEY.md §2.6).

The reference hardcodes every hyperparameter as args.* in each script body
with only --task/--phase on the CLI; here each script exposes the same
preset as defaults and lets any of them be overridden. `--synthetic` swaps
the dataset for the synthetic provider so every entry point is runnable
without the DIV2K/UVG trees."""

from __future__ import annotations

import argparse
import random

import numpy as np


def add_common_args(parser: argparse.ArgumentParser, *, path, n_epochs,
                    base_lr, warmup_epochs=0, batch_size=16, image_size=96,
                    dynamic_batch_size=1):
    parser.add_argument("--path", type=str, default=path)
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="use the synthetic dataset (no image tree needed)")
    parser.add_argument("--n_epochs", type=int, default=n_epochs)
    parser.add_argument("--base_lr", type=float, default=base_lr)
    parser.add_argument("--warmup_epochs", type=int, default=warmup_epochs)
    parser.add_argument("--warmup_lr", type=float, default=-1)
    parser.add_argument("--base_batch_size", type=int, default=batch_size)
    parser.add_argument("--image_size", type=int, default=image_size)
    parser.add_argument("--opt_type", type=str, default="adam")
    parser.add_argument("--weight_decay", type=float, default=3e-5)
    parser.add_argument("--clip_grad_norm", type=float, default=0,
                        help="global-norm gradient clipping; 0 = off (the "
                             "reference never clips). Guard for long "
                             "frozen-BN SR schedules, which can blow up "
                             "mid-run (optim.TorchOpt).")
    parser.add_argument("--manual_seed", type=int, default=0)
    parser.add_argument("--validation_frequency", type=int, default=1)
    parser.add_argument("--print_frequency", type=int, default=10)
    parser.add_argument("--save_frequency", type=int, default=1,
                        help="epochs between checkpoint saves on non-"
                             "validation epochs (final epoch always saves). "
                             "Raise on a relay-attached chip: a save fetches "
                             "the full params+opt_state from device, which "
                             "can dwarf the epoch compute.")
    parser.add_argument("--n_worker", type=int, default=8)
    parser.add_argument("--bn_momentum", type=float, default=0.1)
    parser.add_argument("--bn_eps", type=float, default=1e-5)
    parser.add_argument("--dy_conv_scaling_mode", type=int, default=1,
                        help="1: learned kernel-transform matrices; 0: plain slice")
    parser.add_argument("--kd_ratio", type=float, default=0.0)
    parser.add_argument("--dynamic_batch_size", type=int,
                        default=dynamic_batch_size)
    add_perf_args(parser)
    return parser


def add_perf_args(parser: argparse.ArgumentParser):
    """Precision/remat flags shared by all training CLIs (the classification
    models implement remat as all-or-nothing, so alt/pair/all are
    equivalent there)."""
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=["f32", "bf16"],
                        help="bf16: mixed precision (f32 master params, BN "
                             "stats, transform matrices)")
    parser.add_argument("--remat", type=str, default="auto",
                        choices=["auto", "off", "alt", "pair", "all", "allbn"],
                        help="activation rematerialization: auto (= allbn "
                             "while training, the HW-measured fastest and "
                             "smallest mode), off, alternating blocks, the "
                             "expand+depthwise pair, every block, or every "
                             "block with BN moments saved (allbn)")
    parser.add_argument("--ks_switch", action="store_true",
                        help="compile a depthwise branch per kernel size so "
                             "a sampled ks executes only its own k x k taps "
                             "(exact vs masking; ~3x compile time)")
    parser.add_argument("--dw_switch", nargs="?", const="dw", default="off",
                        choices=["off", "dw", "project"],
                        help="branch the depthwise op over (kernel size x "
                             "middle width): the sampled subnet's dw runs "
                             "only its own taps and channels (exact vs "
                             "masking; supersedes --ks_switch; ~9x dw "
                             "branch count in compile). 'project' also "
                             "pulls dw-BN/act/project-1x1 into the branch "
                             "so the switch seam carries block-width "
                             "buffers (models/layers.py _dwp_switched)")
    parser.add_argument("--dw_align", type=int, default=0,
                        help="round the dw switch's width candidates up to "
                             "this lane tile (128 = the v5e lane width): "
                             "fewer branches, tile-aligned seam buffers, "
                             "still exact. Measured -3.5%% step time on HW "
                             "(DW_SEAM_RACE_r04.json). 0 = off")
    return parser


_REMAT_MAP = {"auto": None, "off": False, "alt": True, "pair": "pair",
              "all": "all", "allbn": "all_save_bn"}


def perf_config_kw(args):
    # RunConfig kwargs for the precision/remat/ks-switch CLI flags
    kw = {"compute_dtype": args.compute_dtype,
          "remat": _REMAT_MAP[args.remat]}
    if getattr(args, "ks_switch", False):
        kw["ks_switch"] = True
    dws = getattr(args, "dw_switch", "off")
    if dws and dws != "off":
        kw["dw_switch"] = True if dws == "dw" else dws
    if getattr(args, "dw_align", 0):
        kw["dw_align"] = args.dw_align
    return kw


def set_seeds(seed: int):
    """Reference preamble (train_*_sr_simple.py:144-154)."""
    random.seed(seed)
    np.random.seed(seed)


def make_sr_provider(args, provider_cls, **kw):
    from ..data import SyntheticSRProvider
    if args.synthetic:
        return SyntheticSRProvider(
            n_train=64, n_valid=4, hr_size=args.image_size,
            train_batch_size=args.base_batch_size)
    return provider_cls(root=args.data_root,
                        image_size=args.image_size,
                        train_batch_size=args.base_batch_size,
                        num_workers=args.n_worker, **kw)
