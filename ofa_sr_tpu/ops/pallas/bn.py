"""Fused train-mode BatchNorm with Pallas statistics (custom VJP).

The step trace shows BN's per-channel reductions — batch moments in the
forward, (sum dy, sum dy*xhat) in the backward — as the dominant non-conv
device cost. This module routes exactly those reductions through the
one-pass Pallas column-sum kernels (ops/pallas/bn_stats.py) and leaves
every elementwise piece (normalize, dx) to XLA, which fuses them into the
neighboring convs:

    forward : (mean, var) = pallas moments(x)         [1 HBM pass]
              y = (x - mean) * inv * scale + bias      [XLA, fused]
    backward: (s1, s2) = pallas bn_bwd_sums(dy, x)     [1 HBM pass]
              dx = inv*scale*(dy - s1/n - xhat*s2/n)   [XLA, fused]
              dscale = s2, dbias = s1

Semantics match ops/norm.batch_norm's training branch to float tolerance
(sum-association differs from XLA's tree reduce); tests/test_pallas.py
pins forward, state, and gradient parity. The returned (mean, var) carry
their own cotangent terms (dmean/n + dvar*2(x-mean)/n) so the op stays a
correct primitive even where the moments feed differentiable consumers —
in the trainer they feed only the (non-differentiated) EMA state update.

Reference semantics being accelerated: DynamicBatchNorm2d train mode,
/root/reference/ofa/elastic_nn/modules/dynamic_op.py:139-172.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bn_stats import bn_bwd_sums, bn_moments_pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_fused(x, scale, bias, eps=1e-5, interpret=False):
    """Train-mode BN over NHWC x; returns (y, mean, var) — y in x.dtype,
    moments in f32. Differentiable in x, scale, bias."""
    y, mean, var, _ = _fwd_impl(x, scale, bias, eps, interpret)
    return y, mean, var


def _fwd_impl(x, scale, bias, eps, interpret):
    mean, var = bn_moments_pallas(x, interpret=interpret)
    inv = jax.lax.rsqrt(var + eps)
    xf = x.astype(jnp.float32)
    y = (xf - mean) * (inv * scale.astype(jnp.float32)) \
        + bias.astype(jnp.float32)
    return y.astype(x.dtype), mean, var, inv


def _fwd(x, scale, bias, eps, interpret):
    y, mean, var, inv = _fwd_impl(x, scale, bias, eps, interpret)
    return (y, mean, var), (x, scale, mean, inv)


def _bwd(eps, interpret, res, cts):
    x, scale, mean, inv = res
    dy, dmean_ct, dvar_ct = cts
    b, h, w, c = x.shape
    n = b * h * w
    dyf = dy.reshape(n, c)
    xf = x.reshape(n, c)
    s1, s2 = bn_bwd_sums(dyf, xf, mean, inv, interpret=interpret)
    scale_f = scale.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    dx = (inv * scale_f) * (dy.astype(jnp.float32) - s1 / n - xhat * s2 / n)
    # cotangents of the returned moments (zero in the trainer: they only
    # feed the non-differentiated EMA state update)
    dx = dx + dmean_ct / n + dvar_ct * 2.0 * (x.astype(jnp.float32) - mean) / n
    return dx.astype(x.dtype), s2.astype(scale.dtype), s1.astype(scale.dtype)


bn_train_fused.defvjp(_fwd, _bwd)
