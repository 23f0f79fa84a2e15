"""Run management: config + the SR training/validation orchestrator.

Replaces RunConfig/RunManager/SRRunManager (run_manager.py:25-494,
sr_run_manager.py:136-549). One typed config (SURVEY.md §5.6: the
reference's argparse-namespace + class-static out-of-band config becomes an
explicit dataclass), one manager that owns params/state/opt_state, the
compiled steps, checkpointing, and console-file logging.

Differences from the reference, by design:
- device work is the jitted multi-subnet step (train_step.py); the manager
  only samples subnets (host, reference seed contract) and feeds batches;
- PSNR never syncs to host mid-epoch (metrics are device scalars read at
  log points);
- 'BN always eval' (sr_run_manager.py:416-423) is cfg.bn_frozen, and
  validate-without-BN-reset (progressive_shrinking.py:82-83) is
  cfg.bn_recalib_before_eval=False — real switches, not comment toggles.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.arch import SearchSpace, SubnetConfig, max_subnet, sample_subnet, subnet_seed
from ..utils.common import AverageMeter
from .bn_recalib import bn_recalibrate
from .checkpoint import load_checkpoint, save_checkpoint
from .schedules import lr_at_step
from .touched import sr_touched_mask
from .train_step import SRTrainer


@dataclasses.dataclass
class RunConfig:
    """All run hyperparameters (defaults = the SR supernet scripts,
    train_ofa_net_sr_simple.py:27-132)."""

    n_epochs: int = 25
    base_lr: float = 1e-4
    warmup_epochs: int = 0
    warmup_lr: float = -1
    lr_schedule_type: Optional[str] = "cosine"

    opt_type: str = "adam"
    momentum: float = 0.9
    nesterov: bool = True
    weight_decay: float = 3e-5
    no_decay_keys: Optional[str] = "bn#bias"
    # global-norm gradient clipping (optim.TorchOpt); None/0 = off (the
    # reference never clips — this is the guard for long frozen-BN runs)
    clip_grad_norm: Optional[float] = None

    train_batch_size: int = 16
    test_batch_size: int = 1
    valid_size: Optional[int] = None
    validation_frequency: int = 1
    print_frequency: int = 10
    # epochs between checkpoint saves on non-validation epochs (the final
    # epoch always saves so warm-start chaining is unaffected). On a
    # relay-attached chip a save fetches the full params+opt_state from
    # device (~32 MB for the X4 supernet, ~90 s measured through the relay
    # vs 1.3 s of epoch compute) — per-epoch saving can dominate wall time.
    save_frequency: int = 1

    dynamic_batch_size: int = 1
    kd_ratio: float = 0.0
    kd_type: Optional[str] = None
    # sandwich rule (Yu & Huang, "Universally Slimmable Networks", 2019):
    # pin sampled subnet k=0 of every step to the max corner within the
    # phase's constraints, so the largest architecture keeps receiving
    # direct gradient through every shrink stage. The reference's recipe
    # (uniform sampling, progressive_shrinking.py:161-165) lets the max
    # corner decay: both backends measured the end-of-curriculum PD2
    # corner sinking below bicubic-x4 (CURRICULUM_r04.json torch 23.12,
    # r5 jax 23.60, vs bicubic 24.16). Requires dynamic_batch_size >= 2
    # (with 1 sample the rule would erase elasticity); k >= 1 draws keep
    # the reference seed contract exactly (each k reseeds independently).
    sandwich_rule: bool = False
    # per-corner best gating: during periodic validation, snapshot the
    # weights whenever a validate-grid corner hits a new best PSNR
    # (best_<corner>.ckpt + corner_best.json provenance sidecar in the
    # checkpoint dir). The reference gates every phase's checkpoint on best
    # mean validation PSNR (model_best.pth.tar,
    # progressive_shrinking.py:235-254) and its deployment flow picks
    # per-subnet checkpoints from the whole history; this is that, made
    # explicit per corner. Snapshots are observation-only — training,
    # seeds, and the warm-start chain are bit-identical with gating off.
    corner_gate: bool = False

    manual_seed: int = 0
    model_init: str = "he_fout"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5

    mode: str = "sr"                      # 'sr' | 'autoencoder'
    bn_frozen: bool = False               # SR oracle 'BN always eval'
    bn_recalib_before_eval: bool = False  # OFA-canonical eval does recalib
    image_size: int = 96
    # shape-bucketed eval (SURVEY.md §5.7): LR frames pad up to multiples of
    # this, so a full Set5/Set14-style catalog (14 distinct ModCrop shapes)
    # compiles one program per bucket instead of one per shape. None = off.
    eval_bucket: Optional[int] = None
    # device-side multi-step training: run this many optimizer steps per
    # dispatch via lax.scan (amortizes the relay/host dispatch latency —
    # the production configuration on a remote-attached chip). 1 = one
    # dispatch per step.
    steps_per_dispatch: int = 1
    # train the architectures the reference *actually executes* (its
    # runtime_depth indexing quirks, arch.reference_quirk_arch_*) rather
    # than the intended semantics — for exact training-trajectory parity
    reference_quirks: bool = False
    # mixed precision: 'bf16' casts conv/linear banks + activations (BN
    # stats, transform matrices, master params, loss stay f32). None = f32.
    compute_dtype: Optional[str] = None
    # activation rematerialization: None = auto (remat='all' while
    # training), False/True (alternating blocks), 'pair' (expand+depthwise
    # pair only), 'all' (every block; minimum memory, HW-fastest)
    remat: object = None  # None | bool | 'pair' | 'all'
    # compile a depthwise branch per kernel size: a sampled ks executes
    # only its own k x k taps instead of the window-masked 7x7 (exact;
    # ~3x compile). See SRTrainer.ks_switch.
    ks_switch: bool = False
    # branch the depthwise op over (kernel size x middle width): the
    # sampled subnet's dw runs only its own taps and channels (exact;
    # supersedes ks_switch; ~9x dw branch count in compile). The r3 trace
    # account measured the max-shape dw stack at 54% of the step
    # (DESIGN.md §7). See SRTrainer.dw_switch.
    dw_switch: bool = False
    # round the dw switch's width candidates up to this lane tile (e.g.
    # 128): fewer branches, tile-aligned seam buffers, still exact
    # (tests/test_dw_switch.py). Measured -3.5% step time on HW at 128
    # (DW_SEAM_RACE_r04.json, DESIGN.md §7.1). 0 = off.
    dw_align: int = 0
    # execute the trunk in space-to-depth layout (4x-deep MXU-shaped 1x1
    # contractions, exact; ops/s2d.py). S4 only.
    s2d: bool = False

    def __post_init__(self):
        # (epoch + 1) % save_frequency in train() divides by this; 0 or a
        # negative value is always a config error, never a behavior
        if self.save_frequency < 1:
            raise ValueError("save_frequency must be >= 1 (got %r)"
                             % (self.save_frequency,))

    @property
    def config(self):
        return dataclasses.asdict(self)


def _compute_dtype_of(run_config):
    if run_config.compute_dtype in (None, "", "f32", "float32"):
        return None
    if run_config.compute_dtype in ("bf16", "bfloat16"):
        return jnp.bfloat16
    raise ValueError("unknown compute_dtype %r" % run_config.compute_dtype)


def _bucket_pad(batch, pixel_d, bucket, mode="sr"):
    """Zero-pad a variable-shape eval batch up to the next bucket multiple
    (LR resolution in 'sr' mode, HR in 'autoencoder'), recording the true
    frame size as 'valid_hw'."""
    hr = np.asarray(batch["image"])
    if mode == "autoencoder":
        h, w = hr.shape[1], hr.shape[2]
        bh = -(-h // bucket) * bucket
        bw = -(-w // bucket) * bucket
        hp = np.zeros((hr.shape[0], bh, bw, hr.shape[3]), hr.dtype)
        hp[:, :h, :w] = hr
        return {"image": hp, "valid_hw": np.asarray([h, w], np.int32)}
    key = "x%d" % (2 ** pixel_d)
    x = np.asarray(batch[key])
    h, w = x.shape[1], x.shape[2]
    bh = -(-h // bucket) * bucket
    bw = -(-w // bucket) * bucket
    scale = 2 ** pixel_d
    xp = np.zeros((x.shape[0], bh, bw, x.shape[3]), x.dtype)
    xp[:, :h, :w] = x
    hp = np.zeros((hr.shape[0], bh * scale, bw * scale, hr.shape[3]),
                  hr.dtype)
    hp[:, :h * scale, :w * scale] = hr
    return {key: xp, "image": hp,
            "valid_hw": np.asarray([h, w], np.int32)}


class SRRunManager:
    """Owns one training run of an SR supernet (S4 or X4)."""

    def __init__(self, path, net, run_config: RunConfig, provider, *,
                 teacher=None, init=True, mesh=None):
        self.path = path
        self.net = net
        self.run_config = run_config
        self.provider = provider
        self.mesh = mesh  # jax.sharding.Mesh -> data-parallel execution
        os.makedirs(self.logs_path, exist_ok=True)
        os.makedirs(self.save_path, exist_ok=True)

        self.start_epoch = 0
        self.best_acc = -1e9  # best mean PSNR ("best_acc" naming kept)

        if init:
            key = jax.random.PRNGKey(run_config.manual_seed)
            self.params, self.state = net.init(key)

        dw_opts = ({"align": run_config.dw_align}
                   if run_config.dw_align else None)
        teacher_kw = {}
        if teacher is not None and run_config.kd_ratio > 0:
            t_net, t_params, t_state, t_cfg = teacher
            teacher_kw = dict(
                teacher_params=t_params, teacher_state=t_state,
                teacher_arch=t_cfg.to_device(t_net.space),
                teacher_pixel_d=t_cfg.pixel_d)
            self.trainer = SRTrainer(
                net, opt_type=run_config.opt_type,
                weight_decay=run_config.weight_decay,
                momentum=run_config.momentum, nesterov=run_config.nesterov,
                clip_grad_norm=run_config.clip_grad_norm,
                kd_ratio=run_config.kd_ratio, mode=run_config.mode,
                bn_frozen=run_config.bn_frozen, teacher_net=t_net,
                compute_dtype=_compute_dtype_of(run_config),
                remat=run_config.remat, ks_switch=run_config.ks_switch,
                dw_switch=run_config.dw_switch, dw_opts=dw_opts,
                s2d=run_config.s2d)
        else:
            self.trainer = SRTrainer(
                net, opt_type=run_config.opt_type,
                weight_decay=run_config.weight_decay,
                momentum=run_config.momentum, nesterov=run_config.nesterov,
                clip_grad_norm=run_config.clip_grad_norm,
                mode=run_config.mode, bn_frozen=run_config.bn_frozen,
                compute_dtype=_compute_dtype_of(run_config),
                remat=run_config.remat, ks_switch=run_config.ks_switch,
                dw_switch=run_config.dw_switch, dw_opts=dw_opts,
                s2d=run_config.s2d)
        self.opt_state = self.trainer.init_opt_state(self.params)
        self._teacher_kw = teacher_kw
        self._build_train_steps()
        self._eval_step = self.trainer.make_eval_step()

        if self.mesh is not None:
            # replicate params/state/opt over the mesh; batches are sharded
            # per step (global-batch semantics — XLA inserts the gradient
            # all-reduce, SURVEY.md §2.8)
            from ..parallel import shard_params
            self.params = shard_params(self.params, self.mesh)
            self.state = shard_params(self.state, self.mesh)
            self.opt_state = shard_params(self.opt_state, self.mesh)

        self._write_net_info()

    def _build_train_steps(self):
        rc = self.run_config
        self._train_step = self.trainer.make_train_step(
            n_subnets=rc.dynamic_batch_size, donate=False,
            **self._teacher_kw)
        self._scan_step = (
            self.trainer.make_scan_train_step(
                n_subnets=rc.dynamic_batch_size, donate=False,
                **self._teacher_kw)
            if rc.steps_per_dispatch > 1 else None)

    def _apply_dw_live(self, constraints):
        """Shrink-phase compile-time branch support: when the dw switch is on
        and this train() call is constrained to a subset of ks/expand options
        (set_constraint, progressive_shrinking.py:295-307), rebuild the train
        steps so _dw_switched enumerates only the live branches — e.g. the
        expand phase's first stage compiles 6 dw branches instead of 9
        (models/layers._dw_live_lists). The sampler draws from the very same
        constraints dict, so the executed archs always lie on the enumerated
        branch grid. Eval steps strip the narrowing (train_step.make_eval_step)
        so validation grids over the full space stay exact."""
        if not self.run_config.dw_switch:
            return
        cons = constraints or {}
        live = None
        if "ks_candidates" in cons or "expand_candidates" in cons:
            ks_c = cons.get("ks_candidates")
            e_c = cons.get("expand_candidates")
            live = (tuple(ks_c) if ks_c else None,
                    tuple(e_c) if e_c else None)
            if live == (None, None):
                live = None
        opts = dict(getattr(self.trainer.net, "dw_opts", None) or {})
        if opts.get("live") == live:
            return
        if live is None:
            opts.pop("live", None)
        else:
            opts["live"] = live
        self.trainer.net.dw_opts = opts or None
        self._build_train_steps()

    def _to_device(self, batch):
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            # scalar metadata like 'valid_hw' (shape (2,)) must replicate,
            # not shard along its first dim
            data = {k: v for k, v in dev.items() if k != "valid_hw"}
            bs = dev["image"].shape[0]
            if bs % self.mesh.size == 0:
                from ..parallel import shard_batch, shard_params
                data = shard_batch(data, self.mesh)
                dev = dict(data)
                if "valid_hw" in batch:
                    dev["valid_hw"] = shard_params(
                        {"v": jnp.asarray(batch["valid_hw"])},
                        self.mesh)["v"]
            # else (e.g. the bs=1 eval loader): leave unsharded — jit
            # executes it single-device against the replicated params
        return dev

    # -- paths / logging ------------------------------------------------------

    @property
    def save_path(self):
        return os.path.join(self.path, "checkpoint")

    @property
    def logs_path(self):
        return os.path.join(self.path, "logs")

    def write_log(self, log_str, prefix="valid", should_print=True):
        """Append to logs/{valid,train}_console.txt (sr_run_manager.py:232-249)."""
        fname = {"valid": "valid_console.txt", "test": "valid_console.txt"}.get(
            prefix, "train_console.txt")
        with open(os.path.join(self.logs_path, fname), "a") as f:
            if prefix in ("valid", "test"):
                f.write("=" * 10 + "\n")
            f.write(log_str + "\n")
        if should_print:
            print(log_str)

    def _write_net_info(self):
        n_params = sum(int(np.prod(np.shape(l)))
                       for l in jax.tree.leaves(self.params))
        info = {"name": type(self.net).__name__, "param_count": n_params,
                "space": dataclasses.asdict(self.net.space)
                if dataclasses.is_dataclass(self.net.space) else str(self.net.space)}
        with open(os.path.join(self.path, "net_info.txt"), "w") as f:
            f.write(json.dumps(info) + "\n")
        with open(os.path.join(self.path, "run.config"), "w") as f:
            json.dump(self.run_config.config, f, indent=2)

    # -- checkpointing ----------------------------------------------------------

    def save_model(self, *, epoch, is_best=False, name=None):
        return save_checkpoint(
            self.save_path,
            {"epoch": epoch, "best_acc": self.best_acc, "params": self.params,
             "state": self.state, "opt_state": self.opt_state},
            name=name or "checkpoint.ckpt", is_best=is_best)

    def load_model(self, path=None):
        """Restore net/optimizer/start_epoch/best_acc; missing file ->
        train from scratch (run_manager.py:281-307 try/except contract)."""
        try:
            tpl = {"epoch": 0, "best_acc": 0.0, "params": self.params,
                   "state": self.state, "opt_state": self.opt_state}
            ckpt = load_checkpoint(path or self.save_path, template=tpl)
            self.params = ckpt["params"]
            self.state = ckpt["state"]
            self.opt_state = ckpt["opt_state"]
            self.start_epoch = int(ckpt.get("epoch", -1)) + 1
            self.best_acc = float(ckpt.get("best_acc", -1e9))
            self.write_log("=> loaded checkpoint (epoch %d)" % self.start_epoch,
                           "valid")
        except (FileNotFoundError, KeyError) as e:
            self.write_log("fail to load checkpoint: %s" % e, "valid")

    def load_weights(self, path):
        """Warm-start weights only (the load_models -> load_weights_from_net
        path, progressive_shrinking.py:257-263). Lenient across elastic
        spaces like the reference's strict=False load."""
        from .checkpoint import load_weights_lenient
        self.params, self.state, stats = load_weights_lenient(
            path, self.params, self.state)
        if stats["kept_template"] or stats["dropped"]:
            self.write_log("load_weights(%s): %d net leaves kept fresh "
                           "init, %d checkpoint leaves unused"
                           % (path, stats["kept_template"],
                              stats["dropped"]), "valid")

    # -- subnet sampling (host, reference seed contract) -------------------------

    def sample_archs(self, epoch, n_batch, batch_idx, constraints=None,
                     fixed_cfg: Optional[SubnetConfig] = None):
        sp = self.net.space
        cons = constraints or {}
        archs, descs = [], []
        sandwich = (self.run_config.sandwich_rule and fixed_cfg is None
                    and self.run_config.dynamic_batch_size >= 2)
        for k in range(self.run_config.dynamic_batch_size):
            seed = subnet_seed(epoch, n_batch, batch_idx, k)
            if fixed_cfg is not None:
                # one_arch_overfit: train exactly this architecture every
                # step (reference train_ofa_net_sr_oracle_video.py:93-103)
                cfg = fixed_cfg
            elif sandwich and k == 0:
                # sandwich rule: the max corner within this stage's
                # constraints (stage candidate lists are largest-first
                # prefixes, so this is the phase's global max corner). No
                # RNG draw happens for k=0 — k >= 1 reseed per-k, so their
                # sequence is identical to the non-sandwich run.
                from ..models.arch import uniform_subnet
                cfg = uniform_subnet(
                    sp,
                    max(cons.get("ks_candidates") or sp.ks_list),
                    max(cons.get("expand_candidates") or sp.expand_list),
                    max(cons.get("depth_candidates") or sp.depth_list),
                    max(cons.get("pixel_d_candidates") or sp.pixel_d_list),
                    n_trunks=self.net.n_trunks)
            else:
                cfg = sample_subnet(sp, seed=seed, n_trunks=self.net.n_trunks,
                                    **cons)
            if self.run_config.reference_quirks:
                from ..models.arch import (reference_quirk_arch_s4,
                                           reference_quirk_arch_x4)
                cfg = (reference_quirk_arch_x4(cfg) if self.net.n_trunks == 2
                       else reference_quirk_arch_s4(cfg))
            archs.append(cfg.to_device(sp))
            descs.append(cfg)
        return tuple(archs), descs

    # -- train / validate ---------------------------------------------------------

    def train_one_epoch(self, epoch, constraints=None, fixed_cfg=None):
        rc = self.run_config
        loader = self.provider.train
        loader.set_epoch(epoch)
        n_batch = len(loader)
        # epoch meters cover EVERY iteration (reference AverageMeter
        # semantics, progressive_shrinking.py:210-221); accumulated as lazy
        # device scalars so no per-step host sync — only write_log is gated
        # on print_frequency
        acc = {"loss": None, "psnr": None, "n": 0}
        t0 = time.time()
        pending = []

        def record(metrics, n, i, lr, desc, k=1):
            if acc["loss"] is None:
                acc["loss"] = metrics["loss"] * n
                acc["psnr"] = metrics["psnr"] * n
            else:
                acc["loss"] = acc["loss"] + metrics["loss"] * n
                acc["psnr"] = acc["psnr"] + metrics["psnr"] * n
            acc["n"] += n
            # `k` = optimizer steps this record covers (scan path records
            # once per window): log when a print boundary falls inside the
            # window — window-final indices rarely align with the frequency
            if ((i + 1) // rc.print_frequency > (i + 1 - k) // rc.print_frequency
                    or i + 1 == n_batch):
                self.write_log(
                    "Train [%d][%d/%d]\tloss %.5f\tpsnr %.3f\tlr %.3g\t%s\t%.1fs"
                    % (epoch + 1, i + 1, n_batch, float(metrics["loss"]),
                       float(metrics["psnr"]), lr, desc[:48],
                       time.time() - t0),
                    prefix="train", should_print=False)

        def flush():
            if not pending:
                return
            if (self._scan_step is not None
                    and len(pending) == rc.steps_per_dispatch):
                # one dispatch = the whole window of optimizer steps
                batches = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *[q[0] for q in pending])
                archs = tuple(
                    jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[q[1][k] for q in pending])
                    for k in range(rc.dynamic_batch_size))
                lrs = jnp.asarray([q[2] for q in pending], jnp.float32)
                touched = jax.tree.map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *[q[3] for q in pending])
                (self.params, self.state, self.opt_state,
                 m) = self._scan_step(self.params, self.state,
                                      self.opt_state, batches, archs, lrs,
                                      touched)
                n_tot = sum(q[4] for q in pending)
                record(m, n_tot, pending[-1][5], pending[-1][2],
                       pending[-1][6], k=len(pending))
            else:  # tail shorter than the window: plain steps
                for (dev_batch, archs, lr, touched, n, i, desc) in pending:
                    (self.params, self.state, self.opt_state,
                     m) = self._train_step(self.params, self.state,
                                           self.opt_state, dev_batch, archs,
                                           jnp.asarray(lr, jnp.float32),
                                           touched)
                    record(m, n, i, lr, desc)
            pending.clear()

        for i, batch in enumerate(loader):
            if i == 0 and rc.mode != "autoencoder":
                # paired datasets (codec) emit a single xN key: constrain
                # pixel_d sampling to the branches that actually exist so
                # the sampled arch, the executed arch, the touched masks,
                # and the logs all agree (the reference handled this with a
                # comment-toggled input; here it is a sampling constraint)
                avail = [pd for pd in self.net.space.pixel_d_list
                         if "x%d" % (2 ** pd) in batch]
                if avail and set(avail) != set(self.net.space.pixel_d_list):
                    constraints = dict(constraints or {})
                    existing = constraints.get("pixel_d_candidates")
                    merged = [p for p in (existing or avail) if p in avail]
                    constraints["pixel_d_candidates"] = merged or avail
            lr = lr_at_step(rc.base_lr, epoch, i, n_batch, rc.n_epochs,
                            warmup_epochs=rc.warmup_epochs,
                            warmup_lr=rc.warmup_lr,
                            lr_schedule_type=rc.lr_schedule_type)
            archs, descs = self.sample_archs(epoch, n_batch, i, constraints,
                                             fixed_cfg)
            dev_batch = self._to_device(batch)
            # torch-exact optimizer gating: leaves no sampled subnet
            # executed get no decay/moment/step update (optim.TorchOpt)
            touched = sr_touched_mask(self.net, self.params, descs,
                                      mode=rc.mode)
            pending.append((dev_batch, archs, lr, touched,
                            batch["image"].shape[0], i,
                            descs[0].describe()))
            if len(pending) == max(rc.steps_per_dispatch, 1):
                flush()
        flush()
        if acc["loss"] is None:
            return 0.0, 0.0
        return float(acc["loss"]) / acc["n"], float(acc["psnr"]) / acc["n"]

    def validate(self, cfg: Optional[SubnetConfig] = None, loader=None,
                 recalib_loader=None, frame_log: Optional[str] = None):
        """Mean loss/PSNR over the loader for one subnet config
        (SRRunManager.validate, sr_run_manager.py:323-393). When
        cfg.bn_recalib_before_eval, running stats are recalibrated first
        (the canonical OFA deployment eval, eval_ofa_net.py:58-79).

        `frame_log`: path of a JSONL file receiving one
        {"frame", "loss", "psnr"} record per validation batch — the
        config-switch replacement for the reference's per-frame
        tensorboardX scalars (sr_run_manager.py:324-326,374-375)."""
        rc = self.run_config
        sp = self.net.space
        cfg = cfg or max_subnet(sp, self.net.n_trunks)
        loader = loader if loader is not None else self.provider.test
        state = self.state
        if rc.bn_recalib_before_eval and recalib_loader is not None:
            state = bn_recalibrate(
                self.net, self.params, self.state, cfg.to_device(sp),
                cfg.pixel_d, recalib_loader,
                mode=rc.mode if rc.mode == "autoencoder" else None)
        losses, psnrs = AverageMeter(), AverageMeter()
        arch = cfg.to_device(sp)
        eval_step = self._eval_step
        if rc.eval_bucket:
            if not hasattr(self, "_bucketed_steps"):
                self._bucketed_steps = {}
            if cfg.pixel_d not in self._bucketed_steps:
                self._bucketed_steps[cfg.pixel_d] = \
                    self.trainer.make_bucketed_eval_step(cfg.pixel_d)
            eval_step = self._bucketed_steps[cfg.pixel_d]
        log_f = open(frame_log, "a") if frame_log else None
        try:
            for fi, batch in enumerate(loader):
                if rc.eval_bucket:
                    batch = _bucket_pad(batch, cfg.pixel_d, rc.eval_bucket,
                                        rc.mode)
                dev_batch = self._to_device(batch)
                out = eval_step(self.params, state, dev_batch, arch)
                n = batch["image"].shape[0]
                l, p = float(out["loss"]), float(out["psnr"])
                losses.update(l, n)
                psnrs.update(p, n)
                if log_f is not None:
                    log_f.write(json.dumps(
                        {"frame": fi, "loss": l, "psnr": p}) + "\n")
        finally:
            if log_f is not None:
                log_f.close()
        return losses.avg, psnrs.avg

    def _quirk_cfg(self, cfg):
        if cfg is None or not self.run_config.reference_quirks:
            return cfg
        from ..models.arch import (reference_quirk_arch_s4,
                                   reference_quirk_arch_x4)
        return (reference_quirk_arch_x4(cfg) if self.net.n_trunks == 2
                else reference_quirk_arch_s4(cfg))

    def gate_corners(self, named_psnrs, *, where):
        """Per-corner best gating (RunConfig.corner_gate): for each
        (corner_name, psnr), snapshot the current weights as
        best_<corner>.ckpt when it beats the corner's recorded best, and
        record provenance (`where`: 'epoch 12', 'stage 1 end', 'warmstart')
        in corner_best.json. Pure observation — never touches the rolling
        checkpoint, latest.txt, or best_acc."""
        if not self.run_config.corner_gate:
            return
        from .checkpoint import save_weights
        sidecar = os.path.join(self.save_path, "corner_best.json")
        book = {}
        if os.path.exists(sidecar):
            try:
                with open(sidecar) as f:
                    book = json.load(f)
            except (OSError, ValueError):
                book = {}
        changed = False
        for name, psnr in named_psnrs:
            if psnr > book.get(name, {}).get("psnr", -1e9):
                save_weights(self.save_path, self.params, self.state,
                             "best_%s.ckpt" % name)
                book[name] = {"psnr": round(float(psnr), 3), "where": where}
                changed = True
        if changed:
            tmp = sidecar + ".tmp"
            with open(tmp, "w") as f:
                json.dump(book, f, indent=1)
            os.replace(tmp, sidecar)

    def train(self, validate_cfgs=None,
              constraints=None, fixed_cfg: Optional[SubnetConfig] = None):
        """Epoch loop + periodic validation + best-checkpoint gating
        (sr_run_manager.py:516-541 / progressive_shrinking.py:227-254).
        validate_cfgs entries may be SubnetConfigs or (name, SubnetConfig)
        tuples — names feed per-corner gating (RunConfig.corner_gate).
        fixed_cfg pins every step to one exact architecture (oracle
        one_arch_overfit)."""
        rc = self.run_config
        self._apply_dw_live(constraints)
        for epoch in range(self.start_epoch, rc.n_epochs + rc.warmup_epochs):
            t0 = time.time()
            tr_loss, tr_psnr = self.train_one_epoch(epoch, constraints,
                                                    fixed_cfg)
            log = "Epoch %d: train loss %.5f, psnr %.3f (%.1fs)" % (
                epoch + 1, tr_loss, tr_psnr, time.time() - t0)
            if (epoch + 1) % rc.validation_frequency == 0:
                named = [c if isinstance(c, tuple) else ("cfg%d" % i, c)
                         for i, c in enumerate(validate_cfgs or [None])]
                # validate the as-executed (quirk) architecture so the gated
                # corner matches what the final grid eval scores
                vals = [self.validate(self._quirk_cfg(c)) for _, c in named]
                mean_psnr = float(np.mean([v[1] for v in vals]))
                self.gate_corners(
                    [(n, v[1]) for (n, _), v in zip(named, vals)],
                    where="epoch %d" % (epoch + 1))
                is_best = mean_psnr > self.best_acc
                self.best_acc = max(self.best_acc, mean_psnr)
                log += " | valid psnr %.3f (best %.3f)" % (mean_psnr, self.best_acc)
                self.write_log(log, "valid")
                self.save_model(epoch=epoch, is_best=is_best)
            else:
                self.write_log(log, "train")
                if ((epoch + 1) % rc.save_frequency == 0
                        or epoch + 1 == rc.n_epochs + rc.warmup_epochs):
                    self.save_model(epoch=epoch)
        return self.best_acc

    def reset_running_statistics(self, cfg: SubnetConfig, n_images=2000,
                                 batch_size=100):
        """RunManager.reset_running_statistics (run_manager.py:489-494)."""
        loader = self.provider.build_sub_train_loader(n_images, batch_size)
        self.state = bn_recalibrate(
            self.net, self.params, self.state, cfg.to_device(self.net.space),
            cfg.pixel_d, loader)
