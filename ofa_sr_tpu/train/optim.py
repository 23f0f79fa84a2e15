"""Optimizer factory matching RunConfig.build_optimizer
(run_manager.py:115-133): Adam or SGD(+nesterov momentum) with torch-style L2
weight decay (decay added to the gradient *before* the moment updates), and
the `no_decay_keys='bn#bias'` two-group split — BN scale/bias and all biases
get weight_decay 0 (reference get_parameters keys=['bn','bias'] mode
'exclude', ofa/utils.py:157-186).

The LR is injected per-step (the reference mutates param_group['lr'] every
batch); the chain ends in scale(-1) and the train step multiplies by the
schedule value, so one opt state serves any schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def no_decay_mask(params):
    """True where weight decay applies. In this framework's pytrees, BN
    params live under a 'bn' key with leaves 'scale'/'bias', kernel-transform
    matrices under 'kt', conv kernels under 'conv'/'w', linear biases under
    'b'. Decay applies only to conv/linear weights — matching the
    reference's 'bn#bias' exclusion (biases + all BN params).

    Note the reference *does* decay the kernel-transform matrices (they are
    plain parameters named '7to5_matrix', containing neither 'bn' nor
    'bias'); we reproduce that.
    """

    def mask_tree(tree, in_bn=False):
        if isinstance(tree, dict):
            return {k: mask_tree(v, in_bn or k == "bn") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = type(tree)
            return t(mask_tree(v, in_bn) for v in tree)
        return not in_bn

    masked = mask_tree(params)

    # leaves named 'b' (biases) excluded as well
    def drop_bias(path, leaf):
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "b" in names or "bias" in names:
            return False
        return leaf

    return jax.tree_util.tree_map_with_path(drop_bias, masked)


def make_optimizer(opt_type="adam", weight_decay=0.0, params_mask=None,
                   momentum=0.9, nesterov=True, adam_b1=0.9, adam_b2=0.999,
                   adam_eps=1e-8):
    """Returns an optax transform producing a *descent direction*; the train
    step applies `params + lr * updates` with the per-step scheduled lr."""
    chain = []
    if weight_decay:
        if params_mask is not None:
            chain.append(optax.masked(
                optax.add_decayed_weights(weight_decay), params_mask))
        else:
            chain.append(optax.add_decayed_weights(weight_decay))
    if opt_type == "adam":
        chain.append(optax.scale_by_adam(b1=adam_b1, b2=adam_b2, eps=adam_eps))
    elif opt_type == "sgd":
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    else:
        raise NotImplementedError(opt_type)
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# torch-exact optimizer with per-leaf touched gating
#
# torch optimizers SKIP parameters whose grad is None: a module no sampled
# subnet executed this step (depth-gated blocks, unused kernel-transform
# matrices, the whole encoder in SR mode) gets no weight decay, no moment
# update, and no per-param step increment (torch/optim/adam.py loop over
# params with p.grad is not None). The functional step always produces
# (structurally zero) gradients for those leaves, so reference-exact
# training needs an explicit per-leaf `touched` mask and a per-leaf Adam
# step counter. touched=None means every leaf updates every step — then
# this is bitwise classic torch Adam/SGD.
# ---------------------------------------------------------------------------

class TorchOpt:
    """torch.optim.Adam / SGD(momentum, nesterov) semantics as a pure
    update function over explicit state (RunConfig.build_optimizer,
    run_manager.py:115-133)."""

    def __init__(self, opt_type="adam", weight_decay=0.0, params_mask=None,
                 momentum=0.9, nesterov=True, b1=0.9, b2=0.999, eps=1e-8,
                 clip_grad_norm=None):
        self.opt_type = opt_type
        self.weight_decay = weight_decay
        self.params_mask = params_mask  # True where decay applies
        self.momentum = momentum
        self.nesterov = nesterov
        self.b1, self.b2, self.eps = b1, b2, eps
        # global-norm gradient clipping (torch.nn.utils.clip_grad_norm_
        # semantics: applied to the raw grads BEFORE weight decay joins
        # them, like clipping before optimizer.step()). None/0 = off.
        # Off by default — the reference never clips — but long frozen-BN
        # SR schedules can blow up mid-run (a 20,000x loss spike was
        # measured at epoch 98 of an 800-epoch teacher run, r4); this is
        # the standard guard.
        self.clip_grad_norm = clip_grad_norm

    def init(self, params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        if self.opt_type == "adam":
            return {"m": zeros,
                    "v": jax.tree.map(jnp.zeros_like, params),
                    "t": jax.tree.map(
                        lambda p: jnp.zeros((), jnp.int32), params)}
        if self.opt_type == "sgd":
            return {"buf": zeros}
        raise NotImplementedError(self.opt_type)

    def _wd_tree(self, params):
        if not self.weight_decay:
            return jax.tree.map(lambda p: 0.0, params)
        if self.params_mask is None:
            return jax.tree.map(lambda p: self.weight_decay, params)
        return jax.tree.map(
            lambda m: self.weight_decay if m else 0.0, self.params_mask)

    def update(self, params, grads, opt_state, lr, touched=None):
        """Returns (new_params, new_opt_state). `touched` is a pytree of
        bool scalars matching params (True = this leaf had a non-None grad
        in torch terms); None = all touched."""
        wd = self._wd_tree(params)
        if touched is None:
            touched = jax.tree.map(lambda p: jnp.asarray(True), params)
        if self.clip_grad_norm:
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                 for g in jax.tree.leaves(grads)))
            scale = jnp.minimum(1.0, self.clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        if self.opt_type == "adam":
            b1, b2, eps = self.b1, self.b2, self.eps

            def leaf(p, g, m, v, t, w, tch):
                g = g + w * p  # torch Adam L2 (decay into the gradient)
                t1 = t + 1
                m1 = b1 * m + (1 - b1) * g
                v1 = b2 * v + (1 - b2) * jnp.square(g)
                tf = t1.astype(jnp.float32)
                mhat = m1 / (1 - jnp.power(b1, tf))
                vhat = v1 / (1 - jnp.power(b2, tf))
                p1 = p - lr * mhat / (jnp.sqrt(vhat) + eps)
                return (jnp.where(tch, p1, p), jnp.where(tch, m1, m),
                        jnp.where(tch, v1, v), jnp.where(tch, t1, t))

            out = jax.tree.map(leaf, params, grads, opt_state["m"],
                               opt_state["v"], opt_state["t"], wd, touched)
            leaves, treedef = jax.tree.flatten(out,
                                               is_leaf=lambda x: isinstance(x, tuple))
            unzip = list(zip(*leaves))
            return (jax.tree.unflatten(treedef, unzip[0]),
                    {"m": jax.tree.unflatten(treedef, unzip[1]),
                     "v": jax.tree.unflatten(treedef, unzip[2]),
                     "t": jax.tree.unflatten(treedef, unzip[3])})

        if self.opt_type == "sgd":
            mu, nesterov = self.momentum, self.nesterov

            def leaf(p, g, buf, w, tch):
                g = g + w * p
                buf1 = mu * buf + g  # torch: first touch -> buf = g
                d = g + mu * buf1 if nesterov else buf1
                return (jnp.where(tch, p - lr * d, p),
                        jnp.where(tch, buf1, buf))

            out = jax.tree.map(leaf, params, grads, opt_state["buf"], wd,
                               touched)
            leaves, treedef = jax.tree.flatten(out,
                                               is_leaf=lambda x: isinstance(x, tuple))
            unzip = list(zip(*leaves))
            return (jax.tree.unflatten(treedef, unzip[0]),
                    {"buf": jax.tree.unflatten(treedef, unzip[1])})

        raise NotImplementedError(self.opt_type)
