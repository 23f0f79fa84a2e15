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
