"""Progressive-shrinking orchestration (SURVEY.md §2.3 L6).

Reference: ofa/elastic_nn/training/progressive_shrinking.py — the validate
grid (:24-91), and the supporting_elastic_{depth,expand,pixelshuffle_depth}
stage machines (:266-461): load a prior-phase checkpoint, walk shrink stages
largest->smallest under `set_constraint`, retrain, persist a `<task>.stage`
JSON so the curriculum resumes at stage granularity (SURVEY.md §5.3).

Here constraints are plain candidate lists handed to the sampler, the stage
state is the same JSON file, and `re_organize_middle_weights` runs before
and between expand stages (progressive_shrinking.py:356,388) as a pure
pytree transform.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from ..models.arch import uniform_subnet
from ..models.reorganize import reorganize_s4, reorganize_x4
from .run_manager import SRRunManager


def validate_grid(run_manager: SRRunManager, *, ks_list=None, expand_list=None,
                  depth_list=None, pixel_d_list=None, loader=None,
                  gate_where=None):
    """Cartesian grid of uniform subnet settings, each validated
    (progressive_shrinking.py:45-91). Returns (mean_loss, mean_psnr, log).
    `gate_where` (a provenance string) additionally feeds the grid into
    per-corner best gating (RunConfig.corner_gate)."""
    sp = run_manager.net.space
    # default grid pins each dimension to its min/max corners, like the
    # reference's validate_func_dict (train_ofa_net_sr_simple.py:227-232)
    ks_list = ks_list or _min_max(sp.ks_list)
    expand_list = expand_list or _min_max(sp.expand_list)
    depth_list = depth_list or _min_max(sp.depth_list)
    pixel_d_list = pixel_d_list or sorted(sp.pixel_d_list)

    losses, psnrs, log = [], [], ""
    gated = []
    for pd in pixel_d_list:
        for d in depth_list:
            for e in expand_list:
                for k in ks_list:
                    name = "PD%s-D%s-E%s-K%s" % (pd, d, e, k)
                    cfg = uniform_subnet(sp, k, e, d, pd,
                                         n_trunks=run_manager.net.n_trunks)
                    loss, psnr = run_manager.validate(
                        run_manager._quirk_cfg(cfg), loader=loader)
                    losses.append(loss)
                    psnrs.append(psnr)
                    gated.append(("K%d-E%d-D%d-PD%d" % (k, e, d, pd), psnr))
                    log += "%s (%.3f), " % (name, psnr)
    if gate_where is not None:
        run_manager.gate_corners(gated, where=gate_where)
    return float(np.mean(losses)), float(np.mean(psnrs)), log


def _named_grid_cfgs(run_manager, vl):
    """(name, cfg) pairs for the current validation grid — the same corners
    validate_grid walks, named like the curriculum report keys so
    per-corner gating and the final grid eval agree on identity."""
    sp = run_manager.net.space
    out = []
    for pd in (vl.get("pixel_d_list") or sorted(sp.pixel_d_list)):
        for d in (vl.get("depth_list") or _min_max(sp.depth_list)):
            for e in (vl.get("expand_list") or _min_max(sp.expand_list)):
                for k in (vl.get("ks_list") or _min_max(sp.ks_list)):
                    out.append(("K%d-E%d-D%d-PD%d" % (k, e, d, pd),
                                uniform_subnet(
                                    sp, k, e, d, pd,
                                    n_trunks=run_manager.net.n_trunks)))
    return out


def _stage_file(run_manager, task):
    return os.path.join(run_manager.path, "%s.stage" % task)


def load_stage_info(run_manager, task):
    """Missing file -> fresh curriculum; a *corrupt* file fails loudly
    rather than silently restarting at stage 0 (a silent restart would
    retrain finished stages and overwrite their checkpoints)."""
    path = _stage_file(run_manager, task)
    if not os.path.exists(path):
        return {"stage": 0}
    with open(path) as f:
        try:
            info = json.load(f)
        except ValueError as e:
            raise RuntimeError(
                "corrupt stage file %s: %s — delete it to restart the %s "
                "curriculum from stage 0" % (path, e, task))
    if not isinstance(info, dict) or "stage" not in info:
        raise RuntimeError(
            "stage file %s has no 'stage' key — delete it to restart the "
            "%s curriculum from stage 0" % (path, task))
    return info


def save_stage_info(run_manager, task, info):
    with open(_stage_file(run_manager, task), "w") as f:
        json.dump(info, f, indent=4)


def _min_max(vals):
    return sorted({min(vals), max(vals)})


def supporting_elastic(run_manager: SRRunManager, task: str, *,
                       warmstart_path: Optional[str] = None,
                       validate_lists: Optional[dict] = None):
    """Generic stage machine for task in
    {'pretrain', 'kernel', 'depth', 'expand', 'pixelshuffle_depth'}.

    pretrain: single stage on a singleton (max) space — the reference's
    full-net pretraining that produces the checkpoint its kernel phase
    loads (train_ofa_net_sr_simple.py:236-240,
    'sr_bn_mse_normal2pixelshuffle/.../model_best.pth.tar').
    kernel: single stage training the full ks list (the script's plain
    train(), train_ofa_net_sr_simple.py:236-246). depth/expand/
    pixelshuffle_depth: walk candidate prefixes largest->smallest; expand
    reorganizes middle channels before each stage
    (progressive_shrinking.py:356,388).
    """
    sp = run_manager.net.space
    vl = dict(validate_lists or {})

    if warmstart_path is not None and os.path.exists(
            warmstart_path if os.path.isfile(warmstart_path)
            else os.path.join(warmstart_path, "latest.txt")):
        run_manager.load_weights(warmstart_path)
        loss, psnr, log = validate_grid(run_manager, **vl,
                                        gate_where="warmstart")
        run_manager.write_log("warmstart: %.3f\t%.3f\t%s" % (loss, psnr, log), "valid")

    if task in ("kernel", "pretrain"):
        # Mid-phase resume: a relay wedge kills the process between epochs
        # (DESIGN.md §6) and only a fresh process recovers the chip, so a
        # rerun must pick up the per-epoch checkpoint instead of retraining
        # from the warmstart. Missing checkpoint -> no-op (fresh phase).
        run_manager.load_model()
        best = run_manager.train(
            validate_cfgs=_named_grid_cfgs(run_manager, vl))
        save_stage_info(run_manager, task, {"stage": 1})
        return best

    dim_lists = {
        "depth": sorted(sp.depth_list, reverse=True),
        "expand": sorted(sp.expand_list, reverse=True),
        "pixelshuffle_depth": sorted(sp.pixel_d_list, reverse=True),
    }
    stage_list = dim_lists[task]
    n_stages = len(stage_list) - 1
    info = load_stage_info(run_manager, task)
    start_stage = int(info.get("stage", 0))

    is_x4 = run_manager.net.n_trunks == 2
    best = -1e9
    for current_stage in range(start_stage, n_stages):
        supported = stage_list[:current_stage + 2]
        run_manager.write_log(
            "-" * 30 + " Elastic %s: %s -> %s " %
            (task, stage_list[:current_stage + 1], supported) + "-" * 30,
            "valid")

        if task == "expand":
            reorg = reorganize_x4 if is_x4 else reorganize_s4
            run_manager.params, run_manager.state = reorg(
                run_manager.params, run_manager.state, sp,
                expand_ratio_stage=current_stage + 1)

        constraints = {}
        if task == "depth":
            constraints["depth_candidates"] = supported
            vl["depth_list"] = (_min_max(supported)
                                if len(sp.ks_list) > 1 or len(sp.expand_list) > 1
                                else sorted(supported))
        elif task == "expand":
            constraints["expand_candidates"] = supported
            vl["expand_list"] = _min_max(supported)
        else:
            constraints["pixel_d_candidates"] = supported
            vl["pixel_d_list"] = sorted(supported)

        run_manager.start_epoch = 0
        run_manager.best_acc = -1e9
        if int(info.get("running_stage", -1)) == current_stage:
            # Mid-stage resume: this stage wrote the phase checkpoint
            # (epoch -1 at entry, then every epoch), so restore params/
            # opt_state/start_epoch from it. The reorg above is harmlessly
            # overwritten — the checkpoint holds post-reorg weights.
            run_manager.load_model()
        else:
            info["running_stage"] = current_stage
            save_stage_info(run_manager, task, info)
            # Stage-entry checkpoint (epoch -1 -> start_epoch 0 on reload):
            # without it, a crash during epoch 0 would resume from the
            # PREVIOUS stage's last checkpoint, whose epoch count would make
            # load_model skip this stage entirely.
            run_manager.save_model(epoch=-1)
        best = run_manager.train(
            constraints=constraints,
            validate_cfgs=_named_grid_cfgs(run_manager, vl))

        info.pop("running_stage", None)
        info["stage"] = current_stage + 1
        run_manager.save_model(epoch=run_manager.run_config.n_epochs - 1,
                               name="%s_stage%d.ckpt" % (task, info["stage"]))
        save_stage_info(run_manager, task, info)
        loss, psnr, log = validate_grid(run_manager, **vl,
                                        gate_where="stage %d end"
                                                   % info["stage"])
        run_manager.write_log("stage %d: %.3f\t%.3f\t%s"
                              % (info["stage"], loss, psnr, log), "valid")
    return best
