"""Evaluate a subnet of a trained SR supernet.

Mirrors /root/reference/eval_ofa_net_sr.py: load a checkpoint, pick a subnet
(default ks=7, e=6, d=2, pixel_d=2, :218-220), validate frame by frame at
batch 1 with PSNR-Y. Adds the canonical OFA deployment options the SR
reference disabled: --materialize (jit the sliced static subnet,
eval_ofa_net.py:58-79) and --bn_recalib.

Run: python -m ofa_sr_tpu.cli.eval_ofa_net_sr --checkpoint <dir> [--synthetic]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Div2KSetXXProvider, OracleVideoProvider
from ..models import OFAMobileNetS4, SearchSpace
from ..models.arch import uniform_subnet
from ..models.materialize import get_active_subnet
from ..train import RunConfig, SRRunManager
from ..utils.metrics import psnr_y_device
from .common import add_common_args, make_sr_provider, set_seeds


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, path="exp/sr/eval", n_epochs=1, base_lr=1e-4,
                    batch_size=1, image_size=720)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--dataset", type=str, default="oracle_video",
                   choices=["oracle_video", "div2k"])
    p.add_argument("--ks", type=int, default=7)
    p.add_argument("--expand", type=int, default=6)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--pixel_d", type=int, default=2)
    p.add_argument("--no_fold_tail", action="store_true",
                   help="with --materialize: disable folding the output "
                        "conv through the last pixel_shuffle (the fold is "
                        "exact and ~2x on TPU; this flag is the measured "
                        "escape hatch)")
    p.add_argument("--materialize", action="store_true",
                   help="slice + jit the static subnet (deployment path)")
    p.add_argument("--bn_recalib", action="store_true")
    p.add_argument("--export", type=str, default=None,
                   help="write an AOT serving artifact (jax.export StableHLO"
                        " with folded weights, cpu+tpu) for the test-set "
                        "frame shape, then continue with the evaluation")
    p.add_argument("--frame_log", type=str, default=None,
                   help="JSONL path for per-frame loss/PSNR scalars (the "
                        "reference's tensorboardX per-frame logging toggle, "
                        "sr_run_manager.py:324-326,374-375)")
    p.add_argument("--tile", type=int, default=None,
                   help="with --materialize: overlap-tiled inference with "
                        "this LR tile size (1080p+ VMEM strategy; halo "
                        "auto-sized to the subnet's receptive field)")
    p.add_argument("--tile_mesh", action="store_true",
                   help="with --tile: shard the window batch over all "
                        "devices (one frame's tiles run on the whole slice "
                        "in parallel)")
    p.add_argument("--spatial_mesh", action="store_true",
                   help="with --materialize: shard each frame's rows over "
                        "the device mesh with ICI halo exchange "
                        "(parallel/spatial.py; alternative to --tile)")
    p.add_argument("--x4_autoencoder", action="store_true",
                   help="evaluate an OFAMobileNetX4 in autoencoder mode "
                        "(learned downscale + SR): the net consumes the HR "
                        "frame itself. --tile/--spatial_mesh work here too "
                        "(HR-unit halos aligned to the unshuffle grid).")
    return p.parse_args(argv)


def main(argv=None):
    args = build_args(argv)
    set_seeds(args.manual_seed)

    space = SearchSpace()
    if args.x4_autoencoder:
        from ..models import OFAMobileNetX4
        net = OFAMobileNetX4(space,
                             use_transform=args.dy_conv_scaling_mode == 1)
    else:
        net = OFAMobileNetS4(space,
                             use_transform=args.dy_conv_scaling_mode == 1)
    provider_cls = (OracleVideoProvider if args.dataset == "oracle_video"
                    else Div2KSetXXProvider)
    provider = make_sr_provider(args, provider_cls)
    cfg = RunConfig(test_batch_size=1, image_size=args.image_size,
                    bn_recalib_before_eval=args.bn_recalib,
                    mode="autoencoder" if args.x4_autoencoder else "sr")
    rm = SRRunManager(args.path, net, cfg, provider)
    if args.checkpoint:
        rm.load_weights(args.checkpoint)

    sub_cfg = uniform_subnet(space, args.ks, args.expand, args.depth,
                             args.pixel_d,
                             n_trunks=2 if args.x4_autoencoder else 1)
    if args.bn_recalib:
        rm.reset_running_statistics(sub_cfg, n_images=64, batch_size=16)

    if args.export:
        # AOT serving artifact (models/export.py): StableHLO with the
        # folded weights embedded, cpu+tpu lowerings
        from ..models.export import export_subnet
        b = next(iter(provider.test))
        lr = b["x%d" % (2 ** sub_cfg.pixel_d)]
        blob = export_subnet(net, rm.params, rm.state, sub_cfg,
                             (lr.shape[1], lr.shape[2]), path=args.export)
        rm.write_log("exported %s (%d bytes, input %dx%d)"
                     % (args.export, len(blob), lr.shape[1], lr.shape[2]),
                     "valid")

    if args.materialize:
        import json

        ae = args.x4_autoencoder
        subnet = get_active_subnet(net, rm.params, rm.state, sub_cfg,
                                   mode="autoencoder" if ae else "sr",
                                   fold_tail=not args.no_fold_tail)
        jsub = jax.jit(subnet)
        infer = jsub
        if args.spatial_mesh:
            from ..parallel import make_mesh
            from ..parallel.spatial import make_spatial_infer
            from ..train.tiled_infer import (
                receptive_field_radius, receptive_field_radius_autoencoder)
            if ae:
                halo = receptive_field_radius_autoencoder(sub_cfg, space)
                scale, align = 1, 2 ** sub_cfg.pixel_d
            else:
                halo = receptive_field_radius(sub_cfg, space)
                scale, align = 2 ** sub_cfg.pixel_d, 1
            run_sp = make_spatial_infer(subnet, make_mesh(), halo=halo,
                                        scale=scale, align=align)

            def infer(x):  # noqa: F811 — mesh-spatial path
                return jnp.asarray(run_sp(np.asarray(x)))
        elif args.tile:
            from ..train.tiled_infer import (
                receptive_field_radius,
                receptive_field_radius_autoencoder,
                tiled_sr_infer,
                tiled_sr_infer_mesh,
            )
            if ae:
                # HR-unit tile/halo aligned to the unshuffle grid
                sc = 2 ** sub_cfg.pixel_d
                halo = receptive_field_radius_autoencoder(sub_cfg, space)
                scale = 1
                args.tile = -(-args.tile // sc) * sc
            else:
                halo = receptive_field_radius(sub_cfg, space)
                scale = 2 ** sub_cfg.pixel_d

            if args.tile_mesh:
                from ..parallel.mesh import make_mesh
                mesh = make_mesh()

                def infer(x):  # noqa: F811 — mesh-tiled path
                    return jnp.asarray(tiled_sr_infer_mesh(
                        lambda t: jsub(jnp.asarray(t)), np.asarray(x),
                        tile=args.tile, halo=halo, scale=scale, mesh=mesh))
            else:
                def infer(x):  # noqa: F811 — tiled path replaces direct jit
                    return jnp.asarray(tiled_sr_infer(
                        lambda t: jsub(jnp.asarray(t)), np.asarray(x),
                        tile=args.tile, halo=halo, scale=scale))
        key = "image" if ae else "x%d" % (2 ** sub_cfg.pixel_d)
        log_f = open(args.frame_log, "a") if args.frame_log else None
        psnrs, times = [], []
        for fi, batch in enumerate(provider.test):
            x = jnp.asarray(batch[key])
            t0 = time.perf_counter()
            out = infer(x)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
            p = float(psnr_y_device(out, jnp.asarray(batch["image"])))
            psnrs.append(p)
            if log_f is not None:
                log_f.write(json.dumps(
                    {"frame": fi, "psnr": p, "sec": times[-1]}) + "\n")
        if log_f is not None:
            log_f.close()
        # first time includes compile
        fps = len(times[1:]) / sum(times[1:]) if len(times) > 1 else 0.0
        rm.write_log("materialized subnet: psnr %.3f  %.1f frames/s"
                     % (float(np.mean(psnrs)), fps), "valid")
        return float(np.mean(psnrs))

    loss, psnr = rm.validate(sub_cfg, frame_log=args.frame_log)
    rm.write_log("eval %s: loss %.5f psnr %.3f"
                 % (sub_cfg.describe()[:60], loss, psnr), "valid")
    return psnr


if __name__ == "__main__":
    main()
