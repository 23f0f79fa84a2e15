"""The jitted multi-subnet training step — the reference hot loop
(progressive_shrinking.py:94-224 / sr_run_manager.py:413-514) as one XLA
program.

Per optimizer step (reference semantics):
- loop `dynamic_batch_size` sampled subnets; each computes MSE(output, HR)
  (optionally + KD against a teacher forward) and *accumulates* gradients
  (loss.backward() per subnet, one optimizer.step() —
  progressive_shrinking.py:158-203). Here that is a Python loop over K
  static subnet slots inside jit, summing grads before a single update.
- the sampled pixel_d picks the 2x- or 4x-downscaled input
  (progressive_shrinking.py:177-180): `lax.cond` over the two structural
  branches — the only shape-level branch in the program.
- BN running stats thread sequentially through the subnet loop, and
  frozen-BN mode (sr_run_manager.py:416-423) skips their update entirely.
- the PSNR-Y metric is computed on device (no per-step host sync —
  SURVEY.md §3.5 item 4).

Data parallelism: the step has global-batch semantics; run it under jit with
the batch sharded over a mesh (parallel/mesh.py) and XLA inserts the gradient
all-reduce.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.metrics import psnr_y_device
from .optim import TorchOpt, no_decay_mask


def cast_params_for_compute(params, dtype):
    """Cast the compute-heavy weights (conv/linear banks) to `dtype`, keeping
    the numerically sensitive small tensors in f32:
    - BN scale/bias: consumed inside the f32 normalization math
      (ops/norm.py) — casting them only loses mantissa and adds converts;
    - kernel-transform matrices ('kt'): the 7->5->3 transform chain runs at
      HIGHEST precision on tiny (k^2 x k^2) matrices (ops/elastic.py), so
      keeping them f32 is free fidelity.
    """
    def cast(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if "bn" in keys or "kt" in keys:
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


class SRTrainer:
    """Owns the compiled train/eval steps for an SR supernet (S4 or X4).

    net: OFAMobileNetS4 / OFAMobileNetX4 instance.
    mode: 'sr' (input = bicubic LR chosen by pixel_d) or 'autoencoder'
          (input = HR; X4 encoder downscales — the oracle/codec task).
    """

    def __init__(self, net, *, opt_type="adam", weight_decay=3e-5,
                 momentum=0.9, nesterov=True, clip_grad_norm=None,
                 kd_ratio=0.0,
                 mode: str = "sr", bn_frozen: bool = False,
                 teacher_net=None, compute_dtype=None, remat=None,
                 expand_switch=False, ks_switch=False, dw_switch=False,
                 dw_opts=None, s2d=False):
        self.net = net
        self.opt_type = opt_type
        self.weight_decay = weight_decay
        self.momentum = momentum
        self.nesterov = nesterov
        self.clip_grad_norm = clip_grad_norm
        self.kd_ratio = kd_ratio
        self.mode = mode
        self.bn_frozen = bn_frozen
        self.teacher_net = teacher_net
        # mixed precision: cast params + activations to compute_dtype (e.g.
        # jnp.bfloat16 — halves HBM traffic and activation memory); the f32
        # master params, BN statistics (ops/norm.py), loss and PSNR stay f32
        self.compute_dtype = compute_dtype
        # None -> remat='all_save_bn' during training: the r2 HW ladder
        # (exp/perf_step_variants.py) measured checkpoint-every-block at
        # 2.2x the alternating mode's step rate (38.9 vs 86.8 ms/step, f32,
        # same session) and it has the lowest HBM footprint; the step is
        # bandwidth-bound, so recompute beats storing. False/True/'pair'
        # remain selectable per run (cli --remat).
        self.remat = remat
        # expand_switch: compile a lax.switch branch per expand option so a
        # sampled width executes only its own FLOPs (masking pays max width).
        # Measured on v5e at the reference envelope: 3.53 ms/step vs 2.94
        # masked (the ~25% FLOPs saving is eaten by the full-block remat the
        # branch buffers force, narrower matmuls, and switch overhead) with
        # ~5x compile time — correctness-tested, default off.
        net.expand_switch = expand_switch
        # ks_switch: compile a depthwise branch per kernel size so a sampled
        # ks executes only its own k x k taps (masking always pays 7x7; the
        # r2 HW profile measured depthwise VPU time as a dominant step
        # cost). Exact vs masking; ~3x branch count in compile.
        net.ks_switch = ks_switch
        # dw_switch: branch the depthwise op over (kernel size x middle
        # width) — supersedes ks_switch when set. The r3 trace account
        # (DESIGN.md §7) shows the max-shape dw stack is 54% of the step;
        # the mean sampled subnet needs ~0.41 of it. Exact vs masking
        # (tests/test_dw_switch.py); measured numbers in NOTES_ROUND3.
        net.dw_switch = dw_switch
        # dw_opts tunes the dw switch's branch set / seam:
        #   {'live': (ks_list, e_list)} — enumerate only a shrink phase's
        #     live constraint lists (set_constraint) so e.g. the expand
        #     phase's first stage compiles 6 branches, not 9. The sampled
        #     archs MUST come from the same lists (run_manager derives both
        #     from one constraints dict).
        #   {'seam': 'pad'|'dus'} — how the narrow branch output rejoins
        #     the bank width.
        #   {'align': 128} — round width candidates up to the lane tile
        #     (fewer branches, tile-aligned seam buffers; still exact).
        net.dw_opts = dw_opts
        # s2d: execute the trunk in space-to-depth layout — block-diagonal
        # 4x-deep 1x1 contractions for the MXU, exact (ops/s2d.py). S4 only;
        # decision probe: exp/perf_s2d_probe.py.
        net.s2d = s2d
        self._tx = None

    # -- optimizer ------------------------------------------------------------

    def tx(self, params):
        if self._tx is None:
            mask = no_decay_mask(params) if self.weight_decay else None
            # torch-exact optimizer incl. the skip-untouched-params
            # semantics (see optim.TorchOpt): the reference trainer's Adam
            # never decays or moment-updates modules no sampled subnet
            # executed (torch skips grad=None params)
            self._tx = TorchOpt(
                self.opt_type, self.weight_decay, mask,
                momentum=self.momentum, nesterov=self.nesterov,
                clip_grad_norm=self.clip_grad_norm)
        return self._tx

    def init_opt_state(self, params):
        return self.tx(params).init(params)

    # -- forward with the pixel_d structural branch ---------------------------

    def _forward(self, params, state, batch, arch, *, training):
        """Returns (output_hr, new_state). Branches on arch['pixel_d']."""
        bn_training = False if self.bn_frozen else training
        remat = self.remat if self.remat is not None else (
            "all_save_bn" if training else False)
        kw = dict(training=training, bn_training=bn_training, remat=remat)
        if self.compute_dtype is not None:
            cd = self.compute_dtype
            params = cast_params_for_compute(params, cd)
            batch = {k: v.astype(cd) for k, v in batch.items()}
        if self.mode == "autoencoder":
            pds = sorted(self.net.space.pixel_d_list)

            def f(pd):
                return lambda _: self.net.apply(
                    params, state, batch["image"], arch, pixel_d=pd,
                    mode="autoencoder", **kw)
        else:
            # Branch only over the LR keys actually present: paired datasets
            # (codec decoder — data/providers.py PairedImageDataset) emit a
            # single xN key matching their LR/HR ratio, mirroring the
            # reference's comment-toggled input selection
            # (progressive_shrinking.py:177-180).
            inputs = {pd: batch["x%d" % (2 ** pd)]
                      for pd in self.net.space.pixel_d_list
                      if "x%d" % (2 ** pd) in batch}
            if not inputs:
                raise KeyError(
                    "batch has no LR input key (expected one of %s)"
                    % ["x%d" % (2 ** pd)
                       for pd in self.net.space.pixel_d_list])
            pds = sorted(inputs)

            def f(pd):
                if hasattr(self.net, "decode"):  # X4 in sr mode: decoder only
                    return lambda _: self.net.apply(
                        params, state, inputs[pd], arch, pixel_d=pd,
                        mode="sr", **kw)
                return lambda _: self.net.apply(
                    params, state, inputs[pd], arch, pixel_d=pd, **kw)

        if len(pds) == 1:
            return f(pds[0])(None)
        # lax.switch over the possible pixel depths (2 in the reference)
        idx = jnp.searchsorted(jnp.asarray(pds), arch["pixel_d"])
        return lax.switch(idx, [f(pd) for pd in pds], None)

    # -- losses ---------------------------------------------------------------

    def _subnet_loss(self, params, state, batch, arch, teacher_out):
        out, new_state = self._forward(params, state, batch, arch, training=True)
        out = out.astype(jnp.float32)
        hr = batch["image"].astype(jnp.float32)
        mse = jnp.mean(jnp.square(out - hr))
        if self.kd_ratio > 0 and teacher_out is not None:
            # working KD (the reference SR KD path is broken —
            # progressive_shrinking.py:190 NameError; semantics kept:
            # ratio * kd + task loss, scaled 2/(ratio+1))
            kd = jnp.mean(jnp.square(out - teacher_out))
            loss = (self.kd_ratio * kd + mse) * (2.0 / (self.kd_ratio + 1.0))
        else:
            loss = mse
        psnr = psnr_y_device(out, hr)
        return loss, (new_state, psnr)

    # -- the compiled steps ----------------------------------------------------

    def make_train_step(self, n_subnets: int = 1, teacher_params=None,
                        teacher_state=None, teacher_arch=None,
                        teacher_pixel_d: int = 1, donate: bool = True):
        """Build the jitted step. `archs` is a tuple of `n_subnets` arch
        pytrees (SubnetConfig.to_device), sampled host-side under the
        reference seed contract."""
        tx_holder = {}

        def step(params, state, opt_state, batch, archs, lr, touched=None):
            teacher_out = None
            if self.kd_ratio > 0 and self.teacher_net is not None:
                teacher_out, _ = self.teacher_net.apply(
                    teacher_params, teacher_state,
                    batch["x%d" % (2 ** teacher_pixel_d)], teacher_arch,
                    pixel_d=teacher_pixel_d, training=False)
                teacher_out = lax.stop_gradient(teacher_out)

            grads_sum = None
            losses, psnrs = [], []
            cur_state = state
            for k in range(n_subnets):
                arch = archs[k]
                (loss, (cur_state, psnr)), g = jax.value_and_grad(
                    self._subnet_loss, has_aux=True)(
                        params, cur_state, batch, arch, teacher_out)
                grads_sum = g if grads_sum is None else jax.tree.map(
                    jnp.add, grads_sum, g)
                losses.append(loss)
                psnrs.append(psnr)

            new_params, new_opt_state = tx_holder["tx"].update(
                params, grads_sum, opt_state, lr, touched)
            metrics = {
                "loss": jnp.mean(jnp.stack(losses)),
                "psnr": jnp.mean(jnp.stack(psnrs)),
            }
            return new_params, cur_state, new_opt_state, metrics

        def build(params, *a, **kw):
            tx_holder["tx"] = self.tx(params)
            return step(params, *a, **kw)

        donate_argnums = (0, 1, 2) if donate else ()
        return jax.jit(build, donate_argnums=donate_argnums)

    def make_scan_train_step(self, n_subnets: int = 1, teacher_params=None,
                             teacher_state=None, teacher_arch=None,
                             teacher_pixel_d: int = 1, donate: bool = True):
        """Device-side multi-step training: one dispatch runs `n_inner`
        optimizer steps via lax.scan over stacked batches/archs/lrs.

        This amortizes host->device dispatch (significant when the chip sits
        behind a network relay) and lets XLA overlap steps. Inputs carry a
        leading n_inner axis: batches {k: [n,B,...]}, archs = tuple of
        n_subnets stacked-arch pytrees ([n, ...] leaves), lrs [n].
        Semantics per inner step are identical to make_train_step, including
        KD: the teacher's params/state are scan invariants closed over here,
        and its forward runs on each inner step's batch inside the scan body
        (reference KD accumulation, progressive_shrinking_original.py:137-146).
        """
        tx_holder = {}

        def one_step(params, state, opt_state, batch, archs, lr, touched):
            teacher_out = None
            if self.kd_ratio > 0 and self.teacher_net is not None:
                teacher_out, _ = self.teacher_net.apply(
                    teacher_params, teacher_state,
                    batch["x%d" % (2 ** teacher_pixel_d)], teacher_arch,
                    pixel_d=teacher_pixel_d, training=False)
                teacher_out = lax.stop_gradient(teacher_out)
            grads_sum = None
            losses, psnrs = [], []
            cur_state = state
            for k in range(n_subnets):
                arch = jax.tree.map(lambda a: a, archs[k])
                (loss, (cur_state, psnr)), g = jax.value_and_grad(
                    self._subnet_loss, has_aux=True)(
                        params, cur_state, batch, arch, teacher_out)
                grads_sum = g if grads_sum is None else jax.tree.map(
                    jnp.add, grads_sum, g)
                losses.append(loss)
                psnrs.append(psnr)
            new_params, new_opt = tx_holder["tx"].update(
                params, grads_sum, opt_state, lr, touched)
            return new_params, cur_state, new_opt, {
                "loss": jnp.mean(jnp.stack(losses)),
                "psnr": jnp.mean(jnp.stack(psnrs))}

        def scan_steps(params, state, opt_state, batches, archs, lrs,
                       touched=None):
            """`touched`: optional stacked touched-mask pytree ([n_inner]
            leading axis per leaf, see train/touched.py) for torch-exact
            skip-untouched optimizer semantics; None = all leaves every
            step."""
            tx_holder["tx"] = self.tx(params)
            has_touched = touched is not None

            def body(carry, xs):
                params, state, opt_state = carry
                if has_touched:
                    batch, arch, lr, tch = xs
                else:
                    batch, arch, lr = xs
                    tch = None
                params, state, opt_state, m = one_step(
                    params, state, opt_state, batch, arch, lr, tch)
                return (params, state, opt_state), m

            xs = ((batches, archs, lrs, touched) if has_touched
                  else (batches, archs, lrs))
            (params, state, opt_state), ms = jax.lax.scan(
                body, (params, state, opt_state), xs)
            return params, state, opt_state, jax.tree.map(jnp.mean, ms)

        donate_argnums = (0, 1, 2) if donate else ()
        return jax.jit(scan_steps, donate_argnums=donate_argnums)

    def _without_dw_live(self, fn):
        """Trace `fn` with any dw_opts['live'] narrowing stripped: eval
        grids walk the FULL space (validate_grid), so an eval program traced
        mid-shrink-stage must enumerate every branch, not the stage's live
        subset. Trace-time only — the attribute is restored immediately."""
        opts = getattr(self.net, "dw_opts", None)
        if not (opts and "live" in opts):
            return fn()
        self.net.dw_opts = {k: v for k, v in opts.items()
                            if k != "live"} or None
        try:
            return fn()
        finally:
            self.net.dw_opts = opts

    def make_eval_step(self):
        """Per-batch evaluation (SRRunManager.validate, sr_run_manager.py:
        323-393): MSE loss + PSNR-Y against HR, BN in eval mode."""

        def step(params, state, batch, arch):
            out, _ = self._without_dw_live(lambda: self._forward(
                params, state, batch, arch, training=False))
            hr = batch["image"]
            loss = jnp.mean(jnp.square(out - hr))
            return {"loss": loss, "psnr": psnr_y_device(out, hr), "output": out}

        return jax.jit(step)

    def make_bucketed_eval_step(self, pixel_d: int):
        """Shape-bucketed evaluation (SURVEY.md §5.7): the batch carries
        zero-padded frames plus 'valid_hw' = (h, w) of the real LR frame;
        one compiled program serves every frame size in the bucket, and the
        valid region is bitwise identical to the unpadded execution (the
        model re-zeroes the pad before every spatial conv). Metrics average
        over valid pixels only.
        """
        from ..ops.elastic import spatial_valid_mask

        def step(params, state, batch, arch):
            return self._without_dw_live(
                lambda: _body(params, state, batch, arch))

        def _body(params, state, batch, arch):
            hr = batch["image"]
            valid_hw = batch["valid_hw"]
            if self.mode == "autoencoder":
                # valid_hw is at HR resolution here (must be divisible by
                # 2^pixel_d, which ModCrop guarantees)
                out, _ = self.net.apply(params, state, hr, arch,
                                        pixel_d=pixel_d, training=False,
                                        mode="autoencoder",
                                        valid_hw=valid_hw)
                hr_mask = spatial_valid_mask(valid_hw[0], valid_hw[1],
                                             hr.shape[1], hr.shape[2],
                                             hr.dtype)
            else:
                x = batch["x%d" % (2 ** pixel_d)]
                kw = dict(pixel_d=pixel_d, training=False,
                          valid_hw=valid_hw)
                if hasattr(self.net, "decode"):
                    out, _ = self.net.apply(params, state, x, arch,
                                            mode="sr", **kw)
                else:
                    out, _ = self.net.apply(params, state, x, arch, **kw)
                scale = 2 ** pixel_d
                hr_mask = spatial_valid_mask(valid_hw[0] * scale,
                                             valid_hw[1] * scale,
                                             hr.shape[1], hr.shape[2],
                                             hr.dtype)
            sq = jnp.square(out - hr) * hr_mask
            loss = jnp.sum(sq) / (jnp.sum(hr_mask) * hr.shape[0]
                                  * hr.shape[-1])
            psnr = psnr_y_device(out, hr, valid_mask=hr_mask)
            return {"loss": loss, "psnr": psnr, "output": out}

        return jax.jit(step)
