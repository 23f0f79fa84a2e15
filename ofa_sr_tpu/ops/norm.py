"""Functional BatchNorm with the three modes the reference uses.

Reference semantics (SURVEY.md §7.3 item 2):
- train-update: normalize with batch stats (biased var), EMA-update running
  stats (unbiased var), torch momentum convention
  `r = (1 - m) * r + m * batch_stat`.
- frozen ("BN always eval" in SR training, sr_run_manager.py:416-423):
  normalize with running stats; gamma/beta still trainable; no stat update.
- recalibration (`set_running_statistics`, elastic_nn/utils.py:16-66):
  handled in train/bn_recalib.py by averaging batch moments over a
  calibration set; this module exposes the per-batch moments.

Elastic channel masking (DynamicBatchNorm2d.bn_forward, dynamic_op.py:148-167
slices the stat prefix): with masked activations, per-channel batch stats of
*active* channels are unchanged by the presence of zeroed inactive channels,
so normalizing at max width and re-masking the output is numerically
identical to the reference's sliced BN. Running stats are only EMA-updated
where the channel is active.

State layout: params {'scale','bias'}, state {'mean','var'} — all (C,).
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def _pallas_bn_mode():
    """'hw' | 'interpret' | None — resolved once per process. Opt-in via
    OFA_SR_TPU_PALLAS_BN=1 (real TPU) or =interpret (CPU tests)."""
    v = os.environ.get("OFA_SR_TPU_PALLAS_BN", "")
    if v == "interpret":
        return "interpret"
    if v == "1":
        import jax
        if jax.devices()[0].platform == "tpu":
            return "hw"
    return None


def bn_init(channels, dtype=jnp.float32):
    params = {
        "scale": jnp.ones((channels,), dtype),
        "bias": jnp.zeros((channels,), dtype),
    }
    state = {
        "mean": jnp.zeros((channels,), dtype),
        "var": jnp.ones((channels,), dtype),
    }
    return params, state


def batch_moments(x):
    """Per-channel mean and biased variance over (B, H, W) of an NHWC array."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(mean)
    return mean, var


def batch_norm(x, params, state, *, training, momentum=0.1, eps=1e-5,
               mask=None, update_var="unbiased"):
    """Apply BN; returns (y, new_state).

    `training=True` -> batch stats + running-stat EMA update (torch train
    mode); `training=False` -> running stats, state returned unchanged
    (torch eval mode / the SR frozen-BN config).

    `mask` is an optional (C,)-shaped 0/1 array marking active channels; when
    given, the output is re-masked and only active channels' running stats
    are updated.
    """
    scale, bias = params["scale"], params["bias"]
    pallas_mode = _pallas_bn_mode() if training else None
    if pallas_mode is not None and x.shape[-1] % 64 == 0 and x.ndim == 4:
        # fused path: moments + backward reductions in one-pass Pallas
        # kernels, elementwise normalize/dx left to XLA fusion
        # (ops/pallas/bn.py); float-tolerance equal to the branch below
        from .pallas.bn import bn_train_fused
        from jax.ad_checkpoint import checkpoint_name
        y, mean, var = bn_train_fused(x, scale, bias, eps,
                                      pallas_mode == "interpret")
        mean = checkpoint_name(mean, "bn_moments")
        var = checkpoint_name(var, "bn_moments")
        n = x.shape[0] * x.shape[1] * x.shape[2]
        var_for_update = var * (n / max(n - 1, 1)) \
            if update_var == "unbiased" else var
        new_mean = (1 - momentum) * state["mean"] + momentum * mean
        new_var = (1 - momentum) * state["var"] + momentum * var_for_update
        if mask is not None:
            new_mean = jnp.where(mask > 0, new_mean, state["mean"])
            new_var = jnp.where(mask > 0, new_var, state["var"])
            y = y * mask.astype(y.dtype)
        return y, {"mean": new_mean, "var": new_var}
    # statistics and normalization always in f32 — under bf16 mixed
    # precision the moments would otherwise lose mantissa badly
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    if training:
        mean, var = batch_moments(x)
        # tag the (C,)-sized moments so remat='all_save_bn' can save them
        # across the checkpoint boundary instead of re-reducing the full
        # activation in the backward recompute (train-step profile: BN
        # moment reductions are ~30% of step time)
        from jax.ad_checkpoint import checkpoint_name
        mean = checkpoint_name(mean, "bn_moments")
        var = checkpoint_name(var, "bn_moments")
        n = x.shape[0] * x.shape[1] * x.shape[2]
        # torch train mode updates running_var with the *unbiased* batch
        # variance; BN recalibration (set_running_statistics,
        # elastic_nn/utils.py:32-35) averages the *biased* one.
        var_for_update = var * (n / max(n - 1, 1)) if update_var == "unbiased" else var
        new_mean = (1 - momentum) * state["mean"] + momentum * mean
        new_var = (1 - momentum) * state["var"] + momentum * var_for_update
        if mask is not None:
            new_mean = jnp.where(mask > 0, new_mean, state["mean"])
            new_var = jnp.where(mask > 0, new_var, state["var"])
        new_state = {"mean": new_mean, "var": new_var}
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    y = (x - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if mask is not None:
        y = y * mask.astype(jnp.float32)
    return y.astype(in_dtype), new_state
