"""Full-curriculum convergence run with the torch reference as the oracle
(VERDICT r2 item 4).

Executes the reference's complete SR curriculum end-to-end through the real
CLIs on a generated PNG image tree — teacher
(cli/train_teacher_net_sr_simple) -> supernet kernel -> depth -> expand ->
pixelshuffle_depth (cli/train_ofa_net_sr_simple, warm-start chained the way
/root/reference/train_ofa_net_sr_simple.py:236-255 chains its tasks) — and
runs the live torch reference (its OFAMobileNetS4/X4 modules, its seed
contract progressive_shrinking.py:161-165, its BN/optimizer semantics) on
the *identical* data stream from the *identical* init, then compares the
per-phase validation-grid PSNRs.

Scaled down (tiny patches / few epochs) to fit this container; every
mechanism of the full curriculum executes: warm-start key remapping, stage
JSONs, set_constraint shrink walks, channel reorganization before expand
stages, the quirk architectures the reference actually trains
(--reference_quirks), BN-frozen teacher training, grid validation.

Run: python exp/curriculum.py --out /tmp/ofa_curriculum [--scale tiny]
Writes <out>/report.json with per-phase {jax, torch, delta} PSNRs.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # script lives in exp/; make the package importable
    sys.path.insert(0, REPO)
REF = "/root/reference"
SEED = 0
TORCH_INIT_SEED = 42


# ---------------------------------------------------------------------------
# synthetic image tree (SR-learnable: smooth textures + hard edges)
# ---------------------------------------------------------------------------

def gen_tree(root, n_train=32, n_val=4, size=64, seed=0, style="lowpass"):
    """Two dataset styles:

    'lowpass' (r3): tiny noise bicubically upscaled + 4 thin edges. NB this
    is nearly the *best case for bicubic* — the HR content below the edges
    is literally bicubic-upscaled low-pass noise, so bicubic-x2 rebuilds it
    almost perfectly (measured 31.96 dB at img 96) and the only learnable
    margin is a handful of random strokes. Kept for r3-artifact
    reproducibility.

    'sharp' (r4): dense piecewise-constant structure — filled shapes,
    strokes, text glyphs, checker patches at several scales — the content
    class where SR genuinely beats interpolation (bicubic blurs every
    edge; a trained net re-sharpens them from learned priors). Bicubic-x2
    on this measures far lower, and the teacher has real headroom.
    """
    from PIL import Image, ImageDraw
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            # low-pass texture: tiny noise bicubically upscaled
            base = rng.rand(size // 8, size // 8, 3) * 255
            img = Image.fromarray(base.astype(np.uint8)).resize(
                (size, size), Image.BICUBIC)
            draw = ImageDraw.Draw(img)
            if style == "lowpass":
                n_shapes = 4
            else:
                n_shapes = 24 + rng.randint(0, 16)
            for _ in range(n_shapes):
                x0, y0 = rng.randint(0, size - 8, 2)
                w, h = rng.randint(4, size // 2, 2)
                col = tuple(int(c) for c in rng.randint(0, 255, 3))
                x1, y1 = min(x0 + w, size - 1), min(y0 + h, size - 1)
                kind = rng.rand()
                if style == "lowpass":
                    if kind < 0.5:
                        draw.rectangle([x0, y0, x1, y1], outline=col,
                                       width=rng.randint(1, 3))
                    else:
                        draw.line([x0, y0, x1, y1], fill=col,
                                  width=rng.randint(1, 3))
                    continue
                if kind < 0.25:    # filled rectangle (hard edges, flat fill)
                    draw.rectangle([x0, y0, x1, y1], fill=col)
                elif kind < 0.45:  # filled ellipse (curved hard edge)
                    draw.ellipse([x0, y0, x1, y1], fill=col)
                elif kind < 0.65:  # stroke
                    draw.line([x0, y0, x1, y1], fill=col,
                              width=rng.randint(1, 3))
                elif kind < 0.85:  # text glyphs (natural SR content)
                    txt = "".join(chr(rng.randint(33, 126))
                                  for _ in range(rng.randint(2, 6)))
                    draw.text((x0, y0), txt, fill=col)
                else:              # checker patch (maximal high frequency)
                    c = int(rng.randint(2, 5))
                    for yy in range(y0, y1, c):
                        for xx in range(x0 + ((yy - y0) // c % 2) * c,
                                        x1, 2 * c):
                            draw.rectangle(
                                [xx, yy, min(xx + c - 1, x1),
                                 min(yy + c - 1, y1)], fill=col)
            img.save(os.path.join(d, "img_%04d.png" % i))


# ---------------------------------------------------------------------------
# shared schedule/metric helpers (both sides use the same)
# ---------------------------------------------------------------------------

def phase_table(a):
    """The curriculum, scaled. Space lists come from the CLI's own
    TASK_PHASES table (so the driver and the CLIs can never disagree);
    epochs/LR are the scaled-down knobs. Phase 2 of depth/expand walks both
    shrink stages in one invocation (the stage JSON machine), which covers
    the reference's phase1+phase2 split; the pixelshuffle phase pins
    k7/e6/d4 like the reference (train_ofa_net_sr_simple.py:81-91)."""
    from ofa_sr_tpu.cli.train_ofa_net_sr_simple import TASK_PHASES
    out = []
    for task, phase, dyn_bs in (("kernel", 1, 1), ("depth", 2, 2),
                                ("expand", 2, 2),
                                ("pixelshuffle_depth", 1, 1)):
        if a.sandwich:
            # the sandwich anchor needs at least one random sample next to
            # it — phases the reference runs at dynamic_batch_size=1
            # (kernel, pixelshuffle_depth) train 2 subnets/step here
            dyn_bs = max(2, dyn_bs)
        preset = TASK_PHASES[(task, phase)]
        out.append((task, dict(
            phase=phase,
            ks_list=preset["ks_list"], expand_list=preset["expand_list"],
            depth_list=preset["depth_list"],
            pixel_d_list=preset["pixel_d_list"],
            n_epochs=a.phase_epochs, base_lr=a.phase_lr,
            dynamic_batch_size=dyn_bs)))
    return out


def grid_corners(spec):
    """min/max corners per dimension (train_ofa_net_sr_simple.py:227-232)."""
    mm = lambda v: sorted({min(v), max(v)})
    out = []
    for pd in sorted(spec["pixel_d_list"]):
        for d in mm(spec["depth_list"]):
            for e in mm(spec["expand_list"]):
                for k in mm(spec["ks_list"]):
                    out.append((k, e, d, pd))
    return out


# ---------------------------------------------------------------------------
# jax side: the real CLIs
# ---------------------------------------------------------------------------

def jax_common(a):
    # gate_frequency > 0 turns on periodic in-training validation (and with
    # it per-corner gating in the shrink phases); otherwise validation is
    # end-of-phase only — every eval through the relay costs real seconds
    gf = getattr(a, "gate_frequency", 0)
    return ["--data_root", a.data_root, "--image_size", str(a.crop),
            "--base_batch_size", str(a.bs), "--n_worker", "2",
            "--manual_seed", str(getattr(a, "seed", SEED)),
            "--print_frequency", "1000",
            "--validation_frequency", str(gf if gf > 0 else 1000000),
            # per-epoch saves fetch the full 32 MB params+opt_state through
            # the relay (~90 s measured vs 1.3 s epoch compute) — save every
            # 20 epochs; a supervisor restart replays at most 20 cheap epochs
            "--save_frequency", "20",
            "--clip_grad_norm", str(a.clip_grad_norm)]


def save_init_checkpoint(torch_sd, which, net, out_dir):
    """Write the torch init as one of our checkpoints so the jax CLIs start
    from the identical parameters (the load_weights_from_net interop path,
    train/checkpoint.import_torch_*)."""
    from ofa_sr_tpu.train.checkpoint import (import_torch_s4,
                                             import_torch_x4,
                                             save_checkpoint)
    from ofa_sr_tpu.train.train_step import SRTrainer
    imp = import_torch_s4 if which == "s4" else import_torch_x4
    params, state = imp(torch_sd, net)
    opt_state = SRTrainer(net, opt_type="adam",
                          weight_decay=3e-5).init_opt_state(params)
    save_checkpoint(out_dir, {"epoch": 0, "best_acc": -1e9, "params": params,
                              "state": state, "opt_state": opt_state})
    return out_dir


_PARTIAL_BASELINE = {}
_ARG_DEFAULTS = {}  # argparse defaults; filled by main() for resume checks


def write_partial(a, side, results):
    """Checkpoint the finished phases of one half to
    <out>/report_partial_<side>.json after every phase, shaped exactly like
    a finished half-report so merge_curriculum_reports can join whatever
    both halves reached if the run is cut off (the v2 run lost 6 h of torch
    results to a container wipe because report.json was only written at the
    very end)."""
    if "baseline" not in _PARTIAL_BASELINE:
        _PARTIAL_BASELINE["baseline"] = bicubic_baseline(a)
    partial = {"config": vars(a),
               "baseline_bicubic": _PARTIAL_BASELINE["baseline"],
               side: dict(results), "partial": True}
    path = os.path.join(a.out, "report_partial_%s.json" % side)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(partial, f, indent=2)
    os.replace(tmp, path)
    _mirror(a, path)


def _mirror(a, path):
    """Copy a freshly written report JSON into --mirror_dir (e.g. the git
    repo) so a container wipe between sessions can never lose a finished
    phase: the r5b sandwich run completed entirely under /tmp and its
    report was wiped before it was ever committed."""
    d = getattr(a, "mirror_dir", None)
    if not d:
        return
    try:
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, "%s_%s" % (
            os.path.basename(os.path.normpath(a.out)),
            os.path.basename(path)))
        tmp = dst + ".tmp"
        with open(path) as src, open(tmp, "w") as out:
            out.write(src.read())
        os.replace(tmp, dst)
    except OSError as e:  # mirroring is belt-and-braces, never a blocker
        print("mirror to %s failed: %s" % (d, e), flush=True)


# config keys a phase's numbers depend on — a resume report whose config
# differs on a phase's keys must NOT donate that phase's numbers (ADVICE r4:
# a differently-configured run could merge silently into a report claiming
# the current config). Keys absent from an older report compare against the
# current argparse default (e.g. r4 reports predate kd_ratio=0.0).
_DATA_KEYS = ("n_train", "n_val", "img", "crop", "bs", "style",
              "clip_grad_norm", "seed")
_PHASE_CONFIG_KEYS = {
    "teacher": _DATA_KEYS + ("teacher_epochs", "teacher_lr"),
    "pretrain": _DATA_KEYS + ("pretrain_epochs", "pretrain_lr"),
}
_SHRINK_KEYS = _DATA_KEYS + ("pretrain_epochs", "pretrain_lr",
                             "phase_epochs", "phase_lr", "kd_ratio",
                             "sandwich", "gate_frequency")
for _t in ("kernel", "depth", "expand", "pixelshuffle_depth"):
    _PHASE_CONFIG_KEYS[_t] = _SHRINK_KEYS


def _resumable_results(a, side="jax"):
    """Phases whose numbers are already known — from a prior (possibly
    committed) report via --{side}_resume_report, and from this out-dir's
    own partial report. A phase is donated only when the report's config
    matches the current run on every key that phase depends on
    (_PHASE_CONFIG_KEYS). A known phase is then skipped only when re-running
    it is unnecessary for the warm-start chain: 'teacher' is
    chain-independent (pretrain warm-starts from the supernet init); every
    other phase additionally needs its completed checkpoint still on disk
    (checkpoint + PHASE_DONE sentinel on the jax side, the saved state_dict
    on the torch side)."""
    done = {}
    for path in (getattr(a, "%s_resume_report" % side, None),
                 os.path.join(a.out, "report_partial_%s.json" % side)):
        if not path or not os.path.exists(path):
            continue
        try:
            with open(path) as f:
                rep = json.load(f)
        except (OSError, ValueError) as e:
            print("resume report %s unreadable: %s" % (path, e), flush=True)
            continue
        cfg = rep.get("config") or {}
        for task, numbers in (rep.get(side) or {}).items():
            bad = [k for k in _PHASE_CONFIG_KEYS.get(task, _SHRINK_KEYS)
                   if cfg.get(k, _ARG_DEFAULTS.get(k)) != getattr(a, k)]
            if bad:
                print("%s %s in %s NOT resumable: config differs on %s"
                      % (side, task, path,
                         {k: (cfg.get(k, _ARG_DEFAULTS.get(k)),
                              getattr(a, k)) for k in bad}), flush=True)
                continue
            done[task] = numbers
    return done


def _phase_complete(path):
    """True iff the phase at <path> finished training AND its grid eval ran
    (the PHASE_DONE sentinel is written after grid_eval_jax). ADVICE r4
    (medium): SRRunManager makedirs the checkpoint dir before any save, so
    directory existence never proves completion — an interrupted phase
    would silently resume as done and hand a half-trained checkpoint to the
    next phase."""
    return (os.path.exists(os.path.join(path, "checkpoint", "latest.txt"))
            and os.path.exists(os.path.join(path, "PHASE_DONE.json")))


def _mark_phase_complete(path, task, results):
    with open(os.path.join(path, "PHASE_DONE.json"), "w") as f:
        json.dump({"task": task, "results": results}, f)


def run_jax_curriculum(a, torch_inits):
    from ofa_sr_tpu.cli import train_ofa_net_sr_simple, train_teacher_net_sr_simple
    from ofa_sr_tpu.models import OFAMobileNetS4, OFAMobileNetX4, SearchSpace

    results = {}
    done = _resumable_results(a)
    # ---- teacher (S4 2x, BN frozen — the reference teacher semantics) ----
    if "teacher" in done:
        print("jax teacher: resumed from report (%s)" % done["teacher"],
              flush=True)
        results["teacher"] = done["teacher"]
        write_partial(a, "jax", results)
    else:
        t_space = SearchSpace(ks_list=[5], expand_list=[3], depth_list=[2],
                              pixel_d_list=[1])
        t_init = save_init_checkpoint(torch_inits["teacher"], "s4",
                                      OFAMobileNetS4(t_space),
                                      os.path.join(a.out, "init_teacher"))
        t_path = os.path.join(a.out, "jax", "teacher")
        train_teacher_net_sr_simple.main(
            jax_common(a) + ["--path", t_path, "--n_epochs",
                             str(a.teacher_epochs),
                             "--base_lr", str(a.teacher_lr),
                             "--warmup_epochs", "0", "--warmstart", t_init])
        results["teacher"] = grid_eval_jax(a, "teacher", t_path)
        write_partial(a, "jax", results)
    if a.teacher_only:
        return results

    # ---- supernet phases, warm-start chained --------------------------------
    x_space = SearchSpace()  # full maxima: bank shapes shared by all phases
    x_init = save_init_checkpoint(torch_inits["supernet"], "x4",
                                  OFAMobileNetX4(x_space),
                                  os.path.join(a.out, "init_supernet"))
    prev = x_init
    pretrain_ckpt = None
    if a.pretrain_epochs:
        # max-net pretrain — the reference's kernel-phase warm start
        # (train_ofa_net_sr_simple.py:236-240). Without it every phase
        # trains the X4 supernet from scratch at shrink-phase LR, which is
        # why the r3 corners sat at 12-16 dB.
        path = os.path.join(a.out, "jax", "pretrain")
        ckpt = os.path.join(path, "checkpoint")
        if "pretrain" in done and _phase_complete(path):
            print("jax pretrain: resumed from report", flush=True)
            results["pretrain"] = done["pretrain"]
        else:
            argv = jax_common(a) + [
                "--task", "pretrain", "--phase", "1", "--path", path,
                "--warmstart", prev, "--reference_quirks",
                "--n_epochs", str(a.pretrain_epochs),
                "--base_lr", str(a.pretrain_lr), "--warmup_epochs", "0",
                "--dynamic_batch_size", "1"]
            train_ofa_net_sr_simple.main(argv)
            results["pretrain"] = grid_eval_jax(a, "pretrain", path)
            _mark_phase_complete(path, "pretrain", results["pretrain"])
        write_partial(a, "jax", results)
        prev = ckpt
        pretrain_ckpt = ckpt
    for task, spec in phase_table(a):
        path = os.path.join(a.out, "jax", task)
        ckpt = os.path.join(path, "checkpoint")
        if task in done and _phase_complete(path):
            print("jax %s: resumed from report" % task, flush=True)
            results[task] = done[task]
        else:
            argv = jax_common(a) + [
                "--task", task, "--phase", str(spec["phase"]), "--path", path,
                "--warmstart", prev, "--reference_quirks",
                "--n_epochs", str(spec["n_epochs"]),
                "--base_lr", str(spec["base_lr"]), "--warmup_epochs", "0",
                "--dynamic_batch_size", str(spec["dynamic_batch_size"])]
            if a.kd_ratio > 0:
                # KD from the trained max-net (VERDICT r4 next #2): the
                # reference intended exactly this in its supernet phases
                # (progressive_shrinking.py:182-192, bugged there)
                argv += ["--kd_ratio", str(a.kd_ratio),
                         "--kd_teacher", pretrain_ckpt]
            if a.sandwich:
                argv += ["--sandwich"]
            if a.gate_frequency > 0:
                argv += ["--corner_gate"]
            train_ofa_net_sr_simple.main(argv)
            results[task] = grid_eval_jax(a, task, path)
            _mark_phase_complete(path, task, results[task])
        write_partial(a, "jax", results)
        prev = ckpt
    return results


def grid_eval_jax(a, task, path):
    """Validation-grid PSNRs of a finished jax phase, evaluated on the
    *as-executed* (quirk) architectures so torch and jax score the same
    nets."""
    import jax
    from ofa_sr_tpu.data import Div2KSetXXProvider
    from ofa_sr_tpu.models import OFAMobileNetS4, OFAMobileNetX4, SearchSpace
    from ofa_sr_tpu.models.arch import (reference_quirk_arch_x4,
                                        uniform_subnet)
    from ofa_sr_tpu.train import RunConfig, SRRunManager

    if task == "teacher":
        space = SearchSpace(ks_list=[5], expand_list=[3], depth_list=[2],
                            pixel_d_list=[1])
        net = OFAMobileNetS4(space)
        corners = [(5, 3, 2, 1)]
    elif task == "pretrain":
        space = SearchSpace(ks_list=[7], expand_list=[6], depth_list=[4],
                            pixel_d_list=[2])
        net = OFAMobileNetX4(space)
        corners = [(7, 6, 4, 2)]
    else:
        spec = dict(phase_table(a))[task]
        # the phase's own space (its checkpoint may lack e.g. the kernel-
        # transform matrices a larger space would have)
        space = SearchSpace(ks_list=spec["ks_list"],
                            expand_list=spec["expand_list"],
                            depth_list=spec["depth_list"],
                            pixel_d_list=spec["pixel_d_list"])
        net = OFAMobileNetX4(space)
        corners = grid_corners(spec)
    provider = Div2KSetXXProvider(root=a.data_root, image_size=a.crop,
                                  train_batch_size=a.bs, num_workers=2)
    rm = SRRunManager(os.path.join(a.out, "jax_eval", task), net,
                      RunConfig(image_size=a.crop,
                                manual_seed=getattr(a, "seed", SEED)),
                      provider)
    ckpt_dir = os.path.join(path, "checkpoint")
    rm.load_weights(ckpt_dir)
    base_loaded = True
    out = {}
    for (k, e, d, pd) in corners:
        name = "K%d-E%d-D%d-PD%d" % (k, e, d, pd)
        # per-corner gated snapshot (--gate_frequency): score each corner's
        # best-observed weights, re-evaluated from the snapshot file rather
        # than trusted from the sidecar
        best_f = os.path.join(ckpt_dir, "best_%s.ckpt" % name)
        if os.path.exists(best_f):
            rm.load_weights(best_f)
            base_loaded = False
        elif not base_loaded:
            rm.load_weights(ckpt_dir)
            base_loaded = True
        cfg = uniform_subnet(space, k, e, d, pd, n_trunks=net.n_trunks)
        if task != "teacher":
            cfg = reference_quirk_arch_x4(cfg)
        _, psnr = rm.validate(cfg)
        out[name] = round(psnr, 3)
    return out


# ---------------------------------------------------------------------------
# torch side: the live reference modules, faithful trainer loop
# ---------------------------------------------------------------------------

def _sr_mode_forward(self, x):
    """ofa_mbx4.py forward with the SR comment-toggle applied (lines 186-218
    removed, decoder lines 219-246 kept — the config behind the README
    numbers); same patch as tests/test_train_parity.py."""
    x = self.dec_first_conv_block(x)
    dec_big_skip = x
    for stage_id, block_idx in enumerate(self.block_group_info[5:9]):
        depth = self.runtime_depth[stage_id]
        active_idx = block_idx[:depth]
        for idx in active_idx:
            x = self.blocks[idx](x)
    for i, blk in enumerate(self.dec_final_conv_blocks):
        x = blk(x)
        if i == 0:
            x += dec_big_skip
    for stage_id, block_idx in enumerate(self.block_group_info[9:]):
        depth = self.runtime_depth[stage_id]
        active_idx = block_idx[:depth]
        for idx in active_idx:
            x = self.blocks[idx](x)
    return self.dec_final_output_conv_block(x)


def load_reference():
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: a[0]
    tv.utils = tvu
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tvu)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ofa.elastic_nn.modules.dynamic_op import DynamicSeparableConv2d
    from ofa.elastic_nn.networks.ofa_mbs4 import OFAMobileNetS4 as RefS4
    from ofa.elastic_nn.networks.ofa_mbx4 import OFAMobileNetX4 as RefX4
    DynamicSeparableConv2d.KERNEL_TRANSFORM_MODE = 1
    return RefS4, RefX4


def make_torch_inits(seed=0):
    """Construct the reference nets with the reference's torch init; their
    state_dicts seed BOTH sides. `seed` offsets the init draw (the subnet
    sampling contract is seed-independent, f(epoch, step, k) — so --seed
    varies init + shuffle, the honest axis for seed-stability runs)."""
    import torch
    RefS4, RefX4 = load_reference()
    torch.manual_seed(TORCH_INIT_SEED + 1000 * seed)
    teacher = RefS4(ks_list=[5], expand_ratio_list=[3], depth_list=[2],
                    pixelshuffle_depth_list=[1])
    torch.manual_seed(TORCH_INIT_SEED + 1000 * seed + 1)
    supernet = RefX4(ks_list=[3, 5, 7], expand_ratio_list=[3, 4, 6],
                     depth_list=[2, 3, 4], pixelshuffle_depth_list=[1, 2])
    return {"teacher": teacher.state_dict(),
            "supernet": supernet.state_dict()}


def torch_optimizer(net, lr, wd=3e-5):
    """Adam with the no_decay_keys='bn#bias' split (sr_run_manager.py:180-191)."""
    import torch
    keys = ["bn", "bias"]
    wd_p, no_wd = [], []
    for name, p in net.named_parameters():
        (no_wd if any(k in name for k in keys) else wd_p).append(p)
    return torch.optim.Adam([{"params": wd_p, "weight_decay": wd},
                             {"params": no_wd, "weight_decay": 0}], lr)


def stream(provider, epoch):
    """One epoch's train batches as numpy (the loader is (epoch,index)-
    seeded, so this replays exactly what the jax CLI consumed)."""
    provider.train.set_epoch(epoch)
    return [{k: np.asarray(v) for k, v in b.items()} for b in provider.train]


def nchw(a):
    import torch
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def torch_grid_eval(net, provider, corners, *, is_x4):
    import torch
    import jax.numpy as jnp
    from ofa_sr_tpu.utils.metrics import psnr_y_device
    net.eval()
    out = {}
    for (k, e, d, pd) in corners:
        if is_x4:
            net.set_active_subnet(ks=k, e=e, d=d, pixel_d=[pd])
        psnrs = []
        for b in provider.test:
            x = nchw(np.asarray(b["x%d" % (2 ** pd)]))
            with torch.no_grad():
                y = net(x).numpy().transpose(0, 2, 3, 1)
            psnrs.append(float(psnr_y_device(
                jnp.asarray(y), jnp.asarray(np.asarray(b["image"])))))
        out["K%d-E%d-D%d-PD%d" % (k, e, d, pd)] = round(
            float(np.mean(psnrs)), 3)
    net.train()
    return out


def run_torch_curriculum(a, torch_inits):
    import torch
    import torch.nn.functional as F
    from ofa_sr_tpu.data import Div2KSetXXProvider
    from ofa_sr_tpu.train.schedules import lr_at_step

    RefS4, RefX4 = load_reference()
    provider = Div2KSetXXProvider(root=a.data_root, image_size=a.crop,
                                  train_batch_size=a.bs, num_workers=2)
    results = {}

    def gate_corners(net, corners, book, where):
        """Torch mirror of SRRunManager.gate_corners: snapshot per-corner
        best state_dicts (to disk — a full-space X4 sd per corner would
        not fit RAM). Observation-only: never touches training state."""
        for name, psnr in torch_grid_eval(net, provider, corners,
                                          is_x4=True).items():
            if psnr > book.get(name, {}).get("psnr", -1e9):
                f = os.path.join(ckdir, "gate_%s.pt" % name)
                torch.save(net.state_dict(), f)
                book[name] = {"psnr": psnr, "where": where}

    def train_epochs(net, n_epochs, base_lr, dyn_bs, *, bn_eval,
                     sample=None, tag="", teacher=None, sandwich_max=None,
                     gate=None):
        opt = torch_optimizer(net, base_lr)
        t0 = time.time()
        for epoch in range(n_epochs):
            if epoch and epoch % 10 == 0:  # the v2 run gave 6h of silence
                print("torch %s epoch %d/%d (%.1fs/ep)" %
                      (tag, epoch, n_epochs, (time.time() - t0) / epoch),
                      flush=True)
            batches = stream(provider, epoch)
            n_batch = len(batches)
            net.train()
            if bn_eval:  # sr_run_manager.py:416-423
                for m in net.modules():
                    if isinstance(m, torch.nn.BatchNorm2d):
                        m.eval()
            for i, b in enumerate(batches):
                lr = lr_at_step(base_lr, epoch, i, n_batch, n_epochs,
                                warmup_epochs=0, warmup_lr=-1,
                                lr_schedule_type="cosine")
                for g in opt.param_groups:
                    g["lr"] = lr
                hr = nchw(b["image"])
                lrs = {1: nchw(b["x2"]), 2: nchw(b["x4"])}
                t_out = None
                if teacher is not None:
                    # teacher forward once per batch, shared across the
                    # subnet loop — same step shape as the jax side
                    # (train/train_step.py make_train_step)
                    with torch.no_grad():
                        t_out = teacher(lrs[2])
                opt.zero_grad()
                for k in range(dyn_bs):
                    # the determinism contract (progressive_shrinking.py:161-165)
                    random.seed(int("%d%.3d%.3d" % (epoch * n_batch + i, k, 0)))
                    if sandwich_max is not None and k == 0 and dyn_bs >= 2:
                        # sandwich rule, mirroring the jax side's
                        # sample_archs exactly: k=0 pins the phase's max
                        # corner, no RNG draw (k >= 1 reseed per-k, so
                        # their sequence matches the non-sandwich run)
                        mk, me, md, mpd = sandwich_max
                        net.set_active_subnet(ks=mk, e=me, d=md,
                                              pixel_d=[mpd])
                        pd = mpd
                    elif sample is None:
                        pd = 1
                    else:
                        settings = sample()
                        pd = settings["pixel_d"][0]
                    out = net(lrs[pd])
                    loss = F.mse_loss(out, hr)
                    if t_out is not None:
                        # the fixed SR KD semantics (see _subnet_loss)
                        loss = (a.kd_ratio * F.mse_loss(out, t_out) + loss) \
                            * (2.0 / (a.kd_ratio + 1.0))
                    loss.backward()
                if a.clip_grad_norm > 0:
                    # raw grads, before the optimizer's decoupled wd joins —
                    # same point in the step as the jax side (train/optim.py)
                    torch.nn.utils.clip_grad_norm_(net.parameters(),
                                                   a.clip_grad_norm)
                opt.step()
            if gate is not None and (epoch + 1) % gate[0] == 0:
                gate_corners(net, gate[1], gate[2],
                             "epoch %d (%s)" % (epoch + 1, tag))

    done = _resumable_results(a, "torch")
    ckdir = os.path.join(a.out, "torch_ckpt")
    os.makedirs(ckdir, exist_ok=True)

    def save_sd(tag, sd):
        # per-phase state_dict snapshots: the torch half is hours of
        # single-CPU work; a crash must not restart the whole chain
        torch.save(sd, os.path.join(ckdir, tag + ".pt"))

    def resumable(tag):
        return tag in done and os.path.exists(
            os.path.join(ckdir, tag + ".pt"))

    def load_sd(tag):
        return torch.load(os.path.join(ckdir, tag + ".pt"))

    # ---- teacher (chain-independent: resumable from the report alone) -----
    if "teacher" in done:
        print("torch teacher: resumed from report (%s)" % done["teacher"],
              flush=True)
        results["teacher"] = done["teacher"]
    else:
        teacher = RefS4(ks_list=[5], expand_ratio_list=[3], depth_list=[2],
                        pixelshuffle_depth_list=[1])
        teacher.load_state_dict(torch_inits["teacher"])
        train_epochs(teacher, a.teacher_epochs, a.teacher_lr, 1, bn_eval=True,
                     tag="teacher")
        results["teacher"] = torch_grid_eval(teacher, provider,
                                             [(5, 3, 2, 1)], is_x4=False)
        print("torch teacher done: %s" % results["teacher"], flush=True)
    write_partial(a, "torch", results)
    if a.teacher_only:
        return results

    # ---- supernet phases --------------------------------------------------
    prev_sd = torch_inits["supernet"]
    if a.pretrain_epochs:
        if resumable("pretrain"):
            print("torch pretrain: resumed", flush=True)
            results["pretrain"] = done["pretrain"]
            prev_sd = load_sd("pretrain")
        else:
            net = RefX4(ks_list=[7], expand_ratio_list=[6], depth_list=[4],
                        pixelshuffle_depth_list=[2])
            net.forward = types.MethodType(_sr_mode_forward, net)
            net.load_state_dict(prev_sd, strict=False)
            train_epochs(net, a.pretrain_epochs, a.pretrain_lr, 1,
                         bn_eval=False, sample=net.sample_active_subnet,
                         tag="pretrain")
            results["pretrain"] = torch_grid_eval(net, provider,
                                                  [(7, 6, 4, 2)], is_x4=True)
            print("torch pretrain done: %s" % results["pretrain"], flush=True)
            prev_sd = net.state_dict()
            save_sd("pretrain", prev_sd)
        write_partial(a, "torch", results)

    kd_teacher = None
    if a.kd_ratio > 0:
        # frozen max-net KD teacher = the finished pretrain net (the same
        # checkpoint the jax side's --kd_teacher points at)
        kd_teacher = RefX4(ks_list=[7], expand_ratio_list=[6], depth_list=[4],
                           pixelshuffle_depth_list=[2])
        kd_teacher.forward = types.MethodType(_sr_mode_forward, kd_teacher)
        kd_teacher.load_state_dict(prev_sd, strict=False)
        kd_teacher.set_active_subnet(ks=7, e=6, d=4, pixel_d=[2])
        kd_teacher.eval()
        for p in kd_teacher.parameters():
            p.requires_grad_(False)

    for task, spec in phase_table(a):
        if resumable(task):
            print("torch %s: resumed" % task, flush=True)
            results[task] = done[task]
            prev_sd = load_sd(task)
            write_partial(a, "torch", results)
            continue
        net = RefX4(ks_list=spec["ks_list"],
                    expand_ratio_list=spec["expand_list"],
                    depth_list=spec["depth_list"],
                    pixelshuffle_depth_list=spec["pixel_d_list"])
        net.forward = types.MethodType(_sr_mode_forward, net)
        # lenient like load_weights_from_net (ofa_mbx4.py:303-341): the
        # pixelshuffle phase's ks_list=[7] net has no transform matrices
        net.load_state_dict(prev_sd, strict=False)

        def sample():
            return net.sample_active_subnet()

        sandwich_max = None
        if a.sandwich:
            sandwich_max = (max(spec["ks_list"]), max(spec["expand_list"]),
                            max(spec["depth_list"]),
                            max(spec["pixel_d_list"]))

        book = {} if a.gate_frequency > 0 else None
        if book is not None:
            # mirror the jax side: the phase-entry state is a gated
            # candidate too (shrink.py warmstart validate_grid)
            gate_corners(net, grid_corners(spec), book, "warmstart")

        if task == "kernel":
            train_epochs(net, spec["n_epochs"], spec["base_lr"],
                         spec["dynamic_batch_size"], bn_eval=False,
                         sample=sample, tag=task, teacher=kd_teacher,
                         sandwich_max=sandwich_max,
                         gate=(None if book is None else
                               (a.gate_frequency, grid_corners(spec), book)))
        else:
            dims = {"depth": ("depth", sorted(spec["depth_list"],
                                              reverse=True)),
                    "expand": ("expand_ratio", sorted(spec["expand_list"],
                                                      reverse=True)),
                    "pixelshuffle_depth": (
                        "pixelshuffle_depth",
                        sorted(spec["pixel_d_list"], reverse=True))}
            ctype, stage_list = dims[task]
            dimkey = {"depth": "depth_list", "expand": "expand_list",
                      "pixelshuffle_depth": "pixel_d_list"}[task]
            for stage in range(len(stage_list) - 1):
                supported = stage_list[:stage + 2]
                if task == "expand":
                    # progressive_shrinking.py:356,388
                    net.re_organize_middle_weights(
                        expand_ratio_stage=stage + 1)
                net.set_constraint(list(supported), constraint_type=ctype)
                # the stage's validation grid pins the staged dim to the
                # currently supported candidates (shrink.py vl updates)
                stage_corners = grid_corners(dict(spec,
                                                  **{dimkey: supported}))
                train_epochs(net, spec["n_epochs"], spec["base_lr"],
                             spec["dynamic_batch_size"], bn_eval=False,
                             sample=sample,
                             tag="%s-stage%d" % (task, stage),
                             teacher=kd_teacher,
                             sandwich_max=sandwich_max,
                             gate=(None if book is None else
                                   (a.gate_frequency, stage_corners, book)))
            for t in ("_depth_include_list", "_expand_include_list",
                      "_pixelshuffle_depth_include_list",
                      "_ks_include_list"):
                net.__dict__[t] = None
        if book is not None:
            # final state is the last gated candidate; afterwards every
            # full-grid corner has a book entry, measured by the same eval
            # pipeline the non-gated path uses
            gate_corners(net, grid_corners(spec), book, "end")
            results[task] = {n: book[n]["psnr"]
                             for (k, e, d, pd) in grid_corners(spec)
                             for n in ["K%d-E%d-D%d-PD%d" % (k, e, d, pd)]}
            with open(os.path.join(ckdir, "corner_best_%s.json" % task),
                      "w") as f:
                json.dump(book, f, indent=1)
            print("torch %s gate provenance: %s" % (task, {
                n: b["where"] for n, b in book.items()}), flush=True)
        else:
            results[task] = torch_grid_eval(net, provider,
                                            grid_corners(spec), is_x4=True)
        print("torch %s done: %s" % (task, results[task]), flush=True)
        prev_sd = net.state_dict()
        save_sd(task, prev_sd)
        write_partial(a, "torch", results)
    return results


# ---------------------------------------------------------------------------
# baseline + report
# ---------------------------------------------------------------------------

def bicubic_baseline(a):
    """PSNR-Y of plain bicubic upscaling on the val set — the floor a
    converged SR net must clear."""
    import jax.numpy as jnp
    from PIL import Image
    from ofa_sr_tpu.data import Div2KSetXXProvider
    from ofa_sr_tpu.utils.metrics import psnr_y_device
    provider = Div2KSetXXProvider(root=a.data_root, image_size=a.crop,
                                  train_batch_size=a.bs, num_workers=2)
    out = {}
    for pd in (1, 2):
        psnrs = []
        for b in provider.test:
            lr = np.asarray(b["x%d" % (2 ** pd)])[0]
            hr = np.asarray(b["image"])[0]
            up = Image.fromarray(
                (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)).resize(
                (hr.shape[1], hr.shape[0]), Image.BICUBIC)
            up = np.asarray(up).astype(np.float32) / 255.0
            psnrs.append(float(psnr_y_device(jnp.asarray(up[None]),
                                             jnp.asarray(hr[None]))))
        out["x%d" % (2 ** pd)] = round(float(np.mean(psnrs)), 3)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=str, default="/tmp/ofa_curriculum")
    ap.add_argument("--data_root", type=str, default=None)
    ap.add_argument("--n_train", type=int, default=32)
    ap.add_argument("--n_val", type=int, default=4)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--teacher_epochs", type=int, default=12)
    ap.add_argument("--teacher_lr", type=float, default=1e-3)
    ap.add_argument("--pretrain_epochs", type=int, default=0,
                    help="X4 max-net pretraining epochs before the kernel "
                         "phase (the reference's normal2pixelshuffle warm "
                         "start); 0 = r3 behavior (phases from fresh init)")
    ap.add_argument("--pretrain_lr", type=float, default=1e-3)
    ap.add_argument("--clip_grad_norm", type=float, default=0.0,
                    help="global-norm grad clip on BOTH sides (0 = off, the "
                         "reference behavior); guard for long frozen-BN "
                         "teacher schedules (an 800-epoch run blew up 20000x "
                         "at epoch 98)")
    ap.add_argument("--phase_epochs", type=int, default=4)
    ap.add_argument("--phase_lr", type=float, default=2.5e-4)
    ap.add_argument("--kd_ratio", type=float, default=0.0,
                    help="KD from the finished pretrain max-net in the "
                         "supernet shrink phases, on BOTH sides (the "
                         "reference's intended-but-bugged SR KD, "
                         "progressive_shrinking.py:182-192). Requires "
                         "--pretrain_epochs > 0. 0 = off (the r3/r4 recipe).")
    ap.add_argument("--sandwich", action="store_true",
                    help="sandwich rule in the supernet shrink phases: "
                         "subnet k=0 of every step pins the phase's max "
                         "corner (Universally Slimmable Networks), applied "
                         "identically on both sides. Stops the max/PD2 "
                         "corner decaying below bicubic through the shrink "
                         "phases (measured on both backends under the "
                         "reference recipe). Phases the reference runs at "
                         "dynamic_batch_size=1 train 2 subnets/step")
    ap.add_argument("--gate_frequency", type=int, default=0,
                    help="validate the stage grid every N epochs during "
                         "supernet shrink phases and snapshot per-corner "
                         "best weights, on BOTH sides (the reference gates "
                         "each phase on best validation PSNR and deploys "
                         "per-subnet checkpoints from the history; "
                         "progressive_shrinking.py:235-254). Phase results "
                         "then report each corner's gated best, with "
                         "provenance (epoch/stage) in corner_best.json. "
                         "0 = off (end-of-phase eval only, the r3-r5a "
                         "recipe). Gating is observation-only: training "
                         "trajectories are bit-identical with it on or off")
    ap.add_argument("--teacher_only", action="store_true",
                    help="train + eval just the 2x teacher, then stop "
                         "(margin-scaling probes: how far the teacher gets "
                         "above bicubic-x2 as n_train/teacher_epochs grow, "
                         "VERDICT r4 next #9)")
    ap.add_argument("--seed", type=int, default=0,
                    help="init + shuffle seed (the subnet sampling contract "
                         "is seed-independent by design); seed-stability "
                         "runs vary this. Data generation stays at the "
                         "shared SEED so all seeds train on identical "
                         "images.")
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--skip_jax", action="store_true")
    ap.add_argument("--jax_resume_report", type=str, default=None,
                    help="prior (possibly merged/committed) report whose jax "
                         "phase numbers are trusted: phases listed there are "
                         "skipped instead of re-trained — 'teacher' "
                         "unconditionally (it is not on the supernet "
                         "warm-start chain), others only if their completed "
                         "checkpoint (PHASE_DONE sentinel) is still on disk. "
                         "Phases whose config keys differ from this run are "
                         "never resumed.")
    ap.add_argument("--torch_resume_report", type=str, default=None,
                    help="same for the torch half (phases need their saved "
                         "state_dict under <out>/torch_ckpt/)")
    ap.add_argument("--mirror_dir", type=str, default=None,
                    help="directory (e.g. the git repo) to mirror every "
                         "report_partial/report JSON into as it is written, "
                         "named <out-basename>_<report-name>. Reports under "
                         "a /tmp --out do not survive a container wipe; the "
                         "mirror puts a commit-able copy where the round "
                         "driver's end-of-round commit will catch it even "
                         "if the session ends mid-run.")
    ap.add_argument("--style", type=str, default="lowpass",
                    choices=["lowpass", "sharp"],
                    help="synthetic dataset style (see gen_tree): 'lowpass' "
                         "reproduces the r3 artifact; 'sharp' is dense "
                         "piecewise-constant content where SR has real "
                         "headroom over bicubic")
    ap.add_argument("--compile_cache", type=str,
                    default="/tmp/ofa_xla_cache",
                    help="persistent XLA compilation cache dir ('' = off). "
                         "The r3 curriculum paid ~13x over the torch oracle "
                         "almost entirely in recompiles of the same phase "
                         "programs (VERDICT r3 weak #6); the cache makes "
                         "re-runs and stage resumes start hot.")
    a = ap.parse_args()
    _ARG_DEFAULTS.update(vars(ap.parse_args([])))
    if a.kd_ratio > 0 and not a.pretrain_epochs:
        ap.error("--kd_ratio > 0 requires --pretrain_epochs > 0 (the "
                 "pretrain max-net is the KD teacher)")
    if a.compile_cache and not a.skip_jax:
        try:
            import jax
            jax.config.update("jax_compilation_cache_dir", a.compile_cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception as e:  # cache is an optimization, never a blocker
            print("compilation cache unavailable: %s" % e)
    if a.data_root is None:
        a.data_root = os.path.join(a.out, "data")
    os.makedirs(a.out, exist_ok=True)

    if not os.path.exists(os.path.join(a.data_root, "train")):
        gen_tree(a.data_root, a.n_train, a.n_val, a.img, seed=SEED,
                 style=a.style)

    report = {"config": vars(a), "baseline_bicubic": bicubic_baseline(a)}
    torch_inits = make_torch_inits(a.seed)

    if not a.skip_jax:
        t0 = time.time()
        report["jax"] = run_jax_curriculum(a, torch_inits)
        report["jax_sec"] = round(time.time() - t0, 1)
        with open(os.path.join(a.out, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        _mirror(a, os.path.join(a.out, "report.json"))
    if not a.skip_torch:
        t0 = time.time()
        report["torch"] = run_torch_curriculum(a, torch_inits)
        report["torch_sec"] = round(time.time() - t0, 1)

    if "jax" in report and "torch" in report:
        deltas = {}
        for phase in report["jax"]:
            deltas[phase] = {
                k: round(report["jax"][phase][k] - report["torch"][phase][k], 3)
                for k in report["jax"][phase]}
        report["delta_jax_minus_torch"] = deltas
    with open(os.path.join(a.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    _mirror(a, os.path.join(a.out, "report.json"))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
