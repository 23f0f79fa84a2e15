"""Classification run manager — RunManager/DistributedRunManager equivalents
(run_manager.py:136-494, distributed_run_manager.py:28-353).

The distributed manager collapses into the same class: run the jitted step
with batches sharded over a mesh (parallel/mesh.py) and the gradient
all-reduce, metric averaging, and BN-stat reduction all come from XLA; what
remains of Horovod's machinery is rank-0-only logging/checkpointing, which
`is_root` covers (multi-host: jax.process_index() == 0).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.arch import subnet_seed
from ..utils.common import AverageMeter
from .touched import cls_touched_mask
from .bn_recalib import bn_recalibrate
from .checkpoint import load_checkpoint, save_checkpoint
from .cls_trainer import ClsTrainer
from .run_manager import RunConfig, _compute_dtype_of
from .schedules import lr_at_step


class ClsRunManager:
    def __init__(self, path, net, run_config: RunConfig, provider, *,
                 teacher=None, label_smoothing=0.1, is_root=True, init=True,
                 params=None, state=None, mesh=None):
        self.path = path
        self.net = net
        self.run_config = run_config
        self.provider = provider
        self.is_root = is_root
        # jax.sharding.Mesh -> data-parallel execution: params/opt replicate,
        # batches shard, XLA inserts the gradient all-reduce — the
        # DistributedRunManager equivalent (distributed_run_manager.py:72-75)
        # the SR manager already had (run_manager.py SRRunManager.mesh)
        self.mesh = mesh
        if is_root:
            os.makedirs(os.path.join(path, "logs"), exist_ok=True)
            os.makedirs(self.save_path, exist_ok=True)

        self.start_epoch = 0
        self.best_acc = -1e9
        if params is not None:
            self.params, self.state = params, state
        elif init:
            self.params, self.state = net.init(
                jax.random.PRNGKey(run_config.manual_seed))
        else:
            raise ValueError("init=False requires params/state")

        teacher_kw = {}
        t_net = None
        if teacher is not None and run_config.kd_ratio > 0:
            t_net, t_params, t_state, t_arch = teacher
            teacher_kw = dict(teacher_params=t_params, teacher_state=t_state,
                              teacher_arch=t_net.arch_to_device(t_arch))
        self.trainer = ClsTrainer(
            net, opt_type=run_config.opt_type,
            weight_decay=run_config.weight_decay,
            momentum=run_config.momentum, nesterov=run_config.nesterov,
            label_smoothing=label_smoothing, kd_ratio=run_config.kd_ratio,
            kd_type=run_config.kd_type or "ce", teacher_net=t_net,
            bn_frozen=run_config.bn_frozen,
            compute_dtype=_compute_dtype_of(run_config),
            # cls block remat is all-or-nothing: None (auto) keeps the
            # trainer default (on); 'alt'/'pair'/'all' all mean on
            remat=(True if run_config.remat is None
                   else bool(run_config.remat)),
            ks_switch=run_config.ks_switch,
            dw_switch=run_config.dw_switch)
        self.opt_state = self.trainer.init_opt_state(self.params)
        self._teacher_kw = teacher_kw
        self._build_train_steps()
        self._eval_step = self.trainer.make_eval_step()
        self._rng = jax.random.PRNGKey(run_config.manual_seed + 1)

        if self.mesh is not None:
            from ..parallel import shard_params
            self.params = shard_params(self.params, self.mesh)
            self.state = shard_params(self.state, self.mesh)
            self.opt_state = shard_params(self.opt_state, self.mesh)

    def _build_train_steps(self):
        rc = self.run_config
        self._train_step = self.trainer.make_train_step(
            n_subnets=rc.dynamic_batch_size, **self._teacher_kw)
        # device-side multi-step path (amortizes per-step dispatch RTT on a
        # relay-attached chip — the SR manager's steps_per_dispatch)
        self._scan_step = (
            self.trainer.make_scan_train_step(
                n_subnets=rc.dynamic_batch_size, **self._teacher_kw)
            if rc.steps_per_dispatch > 1 else None)

    def _apply_dw_live(self, constraints):
        """Shrink-phase compile-time branch support — same contract as
        SRRunManager._apply_dw_live: the sampler and the dw-switch branch
        enumeration read the same constraints dict, so a constrained stage's
        step compiles only the live (ks x width) branches."""
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
        dev = {"image": jnp.asarray(batch["image"]),
               "label": jnp.asarray(batch["label"])}
        if self.mesh is not None and dev["image"].shape[0] % self.mesh.size == 0:
            from ..parallel import shard_batch
            dev = shard_batch(dev, self.mesh)
        return dev

    @property
    def save_path(self):
        return os.path.join(self.path, "checkpoint")

    def write_log(self, s, prefix="valid", should_print=True):
        if not self.is_root:
            return
        fname = "valid_console.txt" if prefix in ("valid", "test") else "train_console.txt"
        with open(os.path.join(self.path, "logs", fname), "a") as f:
            f.write(s + "\n")
        if should_print:
            print(s)

    def save_model(self, *, epoch, is_best=False, name=None):
        if not self.is_root:
            return None
        return save_checkpoint(
            self.save_path,
            {"epoch": epoch, "best_acc": self.best_acc, "params": self.params,
             "state": self.state, "opt_state": self.opt_state},
            name=name or "checkpoint.ckpt", is_best=is_best)

    def load_model(self, path=None):
        try:
            tpl = {"epoch": 0, "best_acc": 0.0, "params": self.params,
                   "state": self.state, "opt_state": self.opt_state}
            ckpt = load_checkpoint(path or self.save_path, template=tpl)
            self.params, self.state = ckpt["params"], ckpt["state"]
            self.opt_state = ckpt["opt_state"]
            self.start_epoch = int(ckpt.get("epoch", -1)) + 1
            self.best_acc = float(ckpt.get("best_acc", -1e9))
        except (FileNotFoundError, KeyError) as e:
            self.write_log("fail to load checkpoint: %s" % e, "valid")

    def load_weights(self, path):
        """Lenient warm start (see SRRunManager.load_weights)."""
        from .checkpoint import load_weights_lenient
        self.params, self.state, stats = load_weights_lenient(
            path, self.params, self.state)
        if stats["kept_template"] or stats["dropped"]:
            self.write_log("load_weights(%s): %d net leaves kept fresh "
                           "init, %d checkpoint leaves unused"
                           % (path, stats["kept_template"],
                              stats["dropped"]), "valid")

    # ---------------------------------------------------------------------

    def sample_archs(self, epoch, n_batch, batch_idx, constraints=None):
        cons = constraints or {}
        out, descs = [], []
        for k in range(self.run_config.dynamic_batch_size):
            seed = subnet_seed(epoch, n_batch, batch_idx, k)
            a = self.net.sample_arch(seed=seed, **cons)
            descs.append(a)
            out.append(self.net.arch_to_device(a))
        return tuple(out), descs

    def train_one_epoch(self, epoch, constraints=None):
        rc = self.run_config
        loader = self.provider.train
        loader.set_epoch(epoch)
        n_batch = len(loader)
        losses, top1s = AverageMeter(), AverageMeter()
        pending = []

        def record(m, n, i, lr, k=1):
            # meters average the whole epoch (reference AverageMeter
            # semantics); only the log line is gated on print_frequency.
            # `k` = optimizer steps this record covers (the scan path
            # records once per window of steps_per_dispatch steps): a line
            # fires when a print boundary falls anywhere inside the window,
            # otherwise window-final indices rarely align with the
            # frequency and the log silently under-samples
            losses.update(float(m["loss"]), n)
            top1s.update(float(m["top1"]), n)
            if ((i + 1) // rc.print_frequency > (i + 1 - k) // rc.print_frequency
                    or i + 1 == n_batch):
                self.write_log(
                    "Train [%d][%d/%d] loss %.4f top1 %.2f lr %.4g"
                    % (epoch + 1, i + 1, n_batch, float(m["loss"]),
                       float(m["top1"]), lr), "train", should_print=False)

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
                rngs = jnp.stack([q[3] for q in pending])
                touched = jax.tree.map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *[q[4] for q in pending])
                (self.params, self.state, self.opt_state,
                 m) = self._scan_step(self.params, self.state,
                                      self.opt_state, batches, archs, lrs,
                                      rngs, touched)
                record(m, sum(q[5] for q in pending), pending[-1][6],
                       pending[-1][2], k=len(pending))
            else:  # tail shorter than the window: plain steps
                for (dev, archs, lr, rng, touched, n, i) in pending:
                    (self.params, self.state, self.opt_state,
                     m) = self._train_step(self.params, self.state,
                                           self.opt_state, dev, archs,
                                           jnp.asarray(lr, jnp.float32),
                                           rng, touched)
                    record(m, n, i, lr)
            pending.clear()

        for i, batch in enumerate(loader):
            lr = lr_at_step(rc.base_lr, epoch, i, n_batch, rc.n_epochs,
                            warmup_epochs=rc.warmup_epochs,
                            warmup_lr=rc.warmup_lr,
                            lr_schedule_type=rc.lr_schedule_type)
            archs, descs = self.sample_archs(epoch, n_batch, i, constraints)
            dev = self._to_device(batch)
            self._rng, step_rng = jax.random.split(self._rng)
            # torch-exact optimizer gating (optim.TorchOpt / train.touched)
            touched = cls_touched_mask(self.net, self.params, descs)
            pending.append((dev, archs, lr, step_rng, touched,
                            len(batch["label"]), i))
            if len(pending) == max(rc.steps_per_dispatch, 1):
                flush()
        flush()
        return losses.avg, top1s.avg

    def validate(self, arch=None, loader=None):
        arch_dev = self.net.arch_to_device(arch or self.net.max_arch())
        loader = loader if loader is not None else self.provider.test
        losses, top1s, top5s = AverageMeter(), AverageMeter(), AverageMeter()
        for batch in loader:
            dev = self._to_device(batch)
            out = self._eval_step(self.params, self.state, dev, arch_dev)
            n = len(batch["label"])
            losses.update(float(out["loss"]), n)
            top1s.update(float(out["top1"]), n)
            top5s.update(float(out["top5"]), n)
        return losses.avg, top1s.avg, top5s.avg

    def train(self, constraints=None, validate_archs=None):
        rc = self.run_config
        self._apply_dw_live(constraints)
        for epoch in range(self.start_epoch, rc.n_epochs + rc.warmup_epochs):
            t0 = time.time()
            tr_loss, tr_top1 = self.train_one_epoch(epoch, constraints)
            if (epoch + 1) % rc.validation_frequency == 0:
                archs = validate_archs or [None]
                accs = [self.validate(a)[1] for a in archs]
                acc = float(np.mean(accs))
                is_best = acc > self.best_acc
                self.best_acc = max(self.best_acc, acc)
                self.write_log(
                    "Epoch %d: train loss %.4f top1 %.2f | valid top1 %.2f "
                    "(best %.2f) (%.1fs)" % (epoch + 1, tr_loss, tr_top1, acc,
                                             self.best_acc, time.time() - t0),
                    "valid")
                self.save_model(epoch=epoch, is_best=is_best)
            else:
                self.save_model(epoch=epoch)
        return self.best_acc

    def reset_running_statistics(self, arch, n_images=2000, batch_size=100):
        loader = self.provider.build_sub_train_loader(n_images, batch_size)
        self.state = bn_recalibrate(
            self.net, self.params, self.state, self.net.arch_to_device(arch),
            None, loader, input_key="image")
