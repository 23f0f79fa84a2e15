"""Classification training step — the Horovod-universe trainer as one jit.

Reference: RunManager.train_one_epoch (run_manager.py:380-487) and the
multi-subnet loop in progressive_shrinking_original.py:96-160. Loss is
cross-entropy with optional label smoothing (run_manager.py:170-177) and
optional KD against teacher soft labels
(cross_entropy_loss_with_soft_target, imagenet_codebase/utils/__init__.py;
loss = kd_ratio * kd + ce, progressive_shrinking_original.py:137-146).
Gradients accumulate across `dynamic_batch_size` sampled subnets before one
update — the backward_passes_per_step deferral (SURVEY.md §2.8). Metrics
(top-1/top-5) are device scalars; under a sharded jit they are global-batch
accuracies (DistributedMetric equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .optim import TorchOpt, no_decay_mask


def cross_entropy(logits, labels, label_smoothing=0.0):
    """CE with label smoothing (reference
    cross_entropy_with_label_smoothing semantics)."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits)
    if label_smoothing > 0:
        onehot = jax.nn.one_hot(labels, n)
        soft = onehot * (1 - label_smoothing) + label_smoothing / n
        return -jnp.mean(jnp.sum(soft * logp, axis=-1))
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def soft_target_ce(logits, soft_target):
    """cross_entropy_loss_with_soft_target: mean over batch of
    -sum(soft * log_softmax(pred))."""
    return jnp.mean(jnp.sum(-soft_target * jax.nn.log_softmax(logits), axis=-1))


def topk_accuracy(logits, labels, k):
    _, pred = jax.lax.top_k(logits, k)
    hit = jnp.any(pred == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32)) * 100.0


class ClsTrainer:
    def __init__(self, net, *, opt_type="sgd", weight_decay=3e-5,
                 momentum=0.9, nesterov=True, label_smoothing=0.1,
                 kd_ratio=0.0, kd_type="ce", teacher_net=None,
                 bn_frozen=False, compute_dtype=None, remat=True,
                 ks_switch=False, dw_switch=False, dw_opts=None):
        self.net = net
        self.opt_type = opt_type
        self.weight_decay = weight_decay
        self.momentum = momentum
        self.nesterov = nesterov
        self.label_smoothing = label_smoothing
        self.kd_ratio = kd_ratio
        self.kd_type = kd_type
        self.teacher_net = teacher_net
        self.bn_frozen = bn_frozen
        # mixed precision: conv/linear banks + activations in compute_dtype
        # (e.g. bf16); BN params/stats, transform matrices, loss, master
        # params stay f32 (train_step.cast_params_for_compute)
        self.compute_dtype = compute_dtype
        self.remat = remat
        # per-kernel-size depthwise branches (models/layers.py ks_switch)
        net.ks_switch = ks_switch
        # depthwise (ks x mid-width) branches (models/layers.py dw_switch)
        net.dw_switch = dw_switch
        # branch-set tuning: live constraint lists / seam / alignment
        # (see train_step.SRTrainer dw_opts)
        net.dw_opts = dw_opts
        self._tx = None

    def tx(self, params):
        if self._tx is None:
            mask = no_decay_mask(params) if self.weight_decay else None
            # torch-exact optimizer (skip-untouched semantics, optim.TorchOpt)
            self._tx = TorchOpt(self.opt_type, self.weight_decay, mask,
                                momentum=self.momentum,
                                nesterov=self.nesterov)
        return self._tx

    def init_opt_state(self, params):
        return self.tx(params).init(params)

    def _subnet_loss(self, params, state, batch, arch, soft_label, rng):
        image = batch["image"]
        if self.compute_dtype is not None:
            from .train_step import cast_params_for_compute
            params = cast_params_for_compute(params, self.compute_dtype)
            image = image.astype(self.compute_dtype)
        logits, new_state = self.net.apply(
            params, state, image, arch, training=True,
            bn_training=not self.bn_frozen, dropout_rng=rng,
            remat=self.remat)
        logits = logits.astype(jnp.float32)
        ce = cross_entropy(logits, batch["label"], self.label_smoothing)
        if self.kd_ratio > 0 and soft_label is not None:
            if self.kd_type == "ce":
                kd = soft_target_ce(logits, soft_label)
            else:
                kd = jnp.mean(jnp.square(logits - soft_label))
            loss = self.kd_ratio * kd + ce
        else:
            loss = ce
        top1 = topk_accuracy(logits, batch["label"], 1)
        top5 = topk_accuracy(logits, batch["label"],
                             min(5, logits.shape[-1]))
        return loss, (new_state, top1, top5)

    def make_train_step(self, n_subnets=1, teacher_params=None,
                        teacher_state=None, teacher_arch=None,
                        donate=False):
        tx_holder = {}

        def step(params, state, opt_state, batch, archs, lr, rng,
                 touched=None):
            soft = None
            if self.kd_ratio > 0 and self.teacher_net is not None:
                t_logits, _ = self.teacher_net.apply(
                    teacher_params, teacher_state, batch["image"],
                    teacher_arch, training=False)
                soft = jax.nn.softmax(jax.lax.stop_gradient(t_logits))

            grads_sum, cur_state = None, state
            losses, top1s, top5s = [], [], []
            for k in range(n_subnets):
                rng, sub = jax.random.split(rng)
                (loss, (cur_state, t1, t5)), g = jax.value_and_grad(
                    self._subnet_loss, has_aux=True)(
                        params, cur_state, batch, archs[k], soft, sub)
                grads_sum = g if grads_sum is None else jax.tree.map(
                    jnp.add, grads_sum, g)
                losses.append(loss)
                top1s.append(t1)
                top5s.append(t5)

            new_params, new_opt = tx_holder["tx"].update(
                params, grads_sum, opt_state, lr, touched)
            metrics = {"loss": jnp.mean(jnp.stack(losses)),
                       "top1": jnp.mean(jnp.stack(top1s)),
                       "top5": jnp.mean(jnp.stack(top5s))}
            return new_params, cur_state, new_opt, metrics

        def build(params, *a, **kw):
            tx_holder["tx"] = self.tx(params)
            return step(params, *a, **kw)

        return jax.jit(build, donate_argnums=(0, 1, 2) if donate else ())

    def make_scan_train_step(self, n_subnets=1, teacher_params=None,
                             teacher_state=None, teacher_arch=None,
                             donate=False):
        """Device-side multi-step classification training: one dispatch runs
        n_inner optimizer steps via lax.scan (the SR trainer's
        steps_per_dispatch path, train_step.make_scan_train_step — on a
        relay-attached chip this amortizes the per-step dispatch RTT the
        plain path pays). Inputs carry a leading n_inner axis: batches
        {k: [n,B,...]}, archs = tuple of n_subnets stacked-arch pytrees,
        lrs [n], rngs [n, 2] (one PRNG key per inner step), optional stacked
        touched masks. Per-step semantics identical to make_train_step,
        including KD (teacher params are scan invariants; its forward runs
        per inner step)."""
        tx_holder = {}

        def one_step(params, state, opt_state, batch, archs, lr, rng,
                     touched):
            soft = None
            if self.kd_ratio > 0 and self.teacher_net is not None:
                t_logits, _ = self.teacher_net.apply(
                    teacher_params, teacher_state, batch["image"],
                    teacher_arch, training=False)
                soft = jax.nn.softmax(jax.lax.stop_gradient(t_logits))
            grads_sum, cur_state = None, state
            losses, top1s, top5s = [], [], []
            for k in range(n_subnets):
                rng, sub = jax.random.split(rng)
                (loss, (cur_state, t1, t5)), g = jax.value_and_grad(
                    self._subnet_loss, has_aux=True)(
                        params, cur_state, batch, archs[k], soft, sub)
                grads_sum = g if grads_sum is None else jax.tree.map(
                    jnp.add, grads_sum, g)
                losses.append(loss)
                top1s.append(t1)
                top5s.append(t5)
            new_params, new_opt = tx_holder["tx"].update(
                params, grads_sum, opt_state, lr, touched)
            return new_params, cur_state, new_opt, {
                "loss": jnp.mean(jnp.stack(losses)),
                "top1": jnp.mean(jnp.stack(top1s)),
                "top5": jnp.mean(jnp.stack(top5s))}

        def scan_steps(params, state, opt_state, batches, archs, lrs, rngs,
                       touched=None):
            tx_holder["tx"] = self.tx(params)
            has_touched = touched is not None

            def body(carry, xs):
                params, state, opt_state = carry
                if has_touched:
                    batch, arch, lr, rng, tch = xs
                else:
                    batch, arch, lr, rng = xs
                    tch = None
                params, state, opt_state, m = one_step(
                    params, state, opt_state, batch, arch, lr, rng, tch)
                return (params, state, opt_state), m

            xs = ((batches, archs, lrs, rngs, touched) if has_touched
                  else (batches, archs, lrs, rngs))
            (params, state, opt_state), ms = jax.lax.scan(
                body, (params, state, opt_state), xs)
            return params, state, opt_state, jax.tree.map(jnp.mean, ms)

        return jax.jit(scan_steps,
                       donate_argnums=(0, 1, 2) if donate else ())

    def _without_dw_live(self, fn):
        """Trace with dw_opts['live'] stripped — eval walks the full space
        (see train_step.SRTrainer._without_dw_live)."""
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
        def step(params, state, batch, arch):
            logits, _ = self._without_dw_live(
                lambda: self.net.apply(params, state, batch["image"], arch,
                                       training=False))
            return {
                "loss": cross_entropy(logits, batch["label"]),
                "top1": topk_accuracy(logits, batch["label"], 1),
                "top5": topk_accuracy(logits, batch["label"],
                                      min(5, logits.shape[-1])),
            }
        return jax.jit(step)
