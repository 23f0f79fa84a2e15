"""Pallas column-reduction kernels for BatchNorm statistics (VERDICT r3
item 3: aim a kernel at the measured bottleneck).

The round-2/3 device traces show the train step's largest non-conv cost is
`multiply_reduce` fusions: per-channel reductions over (B,H,W) of NHWC
activations — BN batch moments (sum x, sum x^2) in the forward and the BN
backward's (sum dy, sum dy*xhat). XLA emits each as its own full pass over
the activation; measured rates are far below HBM speed at the step's
shapes (reduction over the *major* axes keeping the lane axis).

This module provides one kernel shape that covers all of them: a tiled,
f32-accumulating **paired column sum** over a (N, C) view of the
activation (NHWC -> (B*H*W, C) is a layout-preserving reshape):

    col_sums2(a, b) -> (sum_n a[n,:], sum_n a[n,:]*b[n,:])

- moments:       col_sums2(x, x)   -> (sum x, sum x^2)
- BN backward:   col_sums2(dy, xh) -> (sum dy, sum dy*xh)

Both products are formed in VMEM in the same pass, so the activation is
read from HBM exactly once for both reductions. The grid walks row tiles;
the (2, C) output block stays resident in VMEM across grid steps and is
accumulated in place (init at step 0) — the canonical TPU reduction
pattern. Rows beyond N are masked with @pl.when on the final tile.

`bn_moments_pallas` wraps it with mean/var finalization matching
ops/norm.batch_moments bit-for-bit in f32 (same sum-then-divide
association is NOT guaranteed — XLA's jnp.mean may tree-reduce — so
parity is to float tolerance; tests/test_pallas.py pins it).

Enabled inside batch_norm via OFA_SR_TPU_PALLAS_BN=1 (hardware only;
interpret=True for CPU tests).

MEASURED VERDICT (v5e, 2026-08-17, healthy chip — MXU probe 103 TF/s;
scan-amortized, value-fetch, equal-n A/B per the repo's relay
methodology): the kernel itself is memory-bound at speed-of-light —
slope-timed 373 GB/s on (16,48,48,64) f32, equal to the chip's
independently probed HBM rate — yet the FULL TRAIN STEP gets SLOWER
with it enabled: bf16 remat=all_save_bn 42.1 ms vs 37.2 ms XLA-only;
f32 53.7 vs 38.8 ms (exp/perf_step_variants.py with/without
OFA_SR_TPU_PALLAS_BN=1). Root cause: XLA never pays the standalone
reduction pass this kernel optimizes — it fuses the moment sums into
the *producing conv's epilogue* and the normalize into the consumer,
while an opaque pallas_call forces the activation to round-trip HBM
and severs both fusions. XLA stays the production path; this kernel is
the measured record (DESIGN.md §6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, out_ref, *, n_valid, tile_n):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    base = i * tile_n
    # mask the padded tail rows of the last tile (grid covers cdiv(N, T));
    # both operands are masked so tile padding can never poison the sums
    # (0 * garbage could be nan/inf)
    rem = n_valid - base
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    valid = row < rem
    zero = jnp.zeros((), jnp.float32)
    a = jnp.where(valid, a, zero)
    b = jnp.where(valid, b, zero)
    s1 = jnp.sum(a, axis=0, keepdims=True)
    s2 = jnp.sum(a * b, axis=0, keepdims=True)
    out_ref[0:1, :] += s1
    out_ref[1:2, :] += s2


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def col_sums2(a, b, *, tile_n=512, interpret=False):
    """(sum_n a, sum_n a*b) over axis 0 of two (N, C) arrays, f32 accum.

    One HBM pass for both reductions. C should be lane-friendly (the
    model's channel counts are multiples of 64; C=3 heads are left to
    XLA by the caller).
    """
    n, c = a.shape
    grid = (pl.cdiv(n, tile_n),)
    out = pl.pallas_call(
        functools.partial(_kernel, n_valid=n, tile_n=tile_n),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(a, b)
    return out[0], out[1]


def _lane_fold(n, c):
    """Fold factor f so the kernel sees a (n/f, c*f) view with a full
    128-lane minor dim; narrow channel counts (the 64-wide trunk) would
    otherwise waste half of every lane row."""
    if c % 128 == 0:
        return 1
    f = 128 // c if c < 128 and 128 % c == 0 else 1
    while f > 1 and n % f:
        f //= 2
    return max(f, 1)


def col_sums2_folded(a, b, *, interpret=False):
    """col_sums2 with the lane fold applied: rows are packed f-per-lane-row
    ((N, C) -> (N/f, C*f), a free row-major reinterpretation), reduced, and
    the f lane groups summed back to (C,)."""
    n, c = a.shape
    f = _lane_fold(n, c)
    if f > 1:
        a = a.reshape(n // f, c * f)
        b = b.reshape(n // f, c * f)
    s1, s2 = col_sums2(a, b, interpret=interpret)
    if f > 1:
        s1 = s1.reshape(f, c).sum(0)
        s2 = s2.reshape(f, c).sum(0)
    return s1, s2


def bn_moments_pallas(x, *, interpret=False):
    """Per-channel (mean, biased var) of an NHWC array — the Pallas twin of
    ops/norm.batch_moments (float-tolerance equal; one HBM pass)."""
    n = x.shape[0] * x.shape[1] * x.shape[2]
    flat = x.reshape(n, x.shape[3])
    s1, s2 = col_sums2_folded(flat, flat, interpret=interpret)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    return mean, var


# ---------------------------------------------------------------------------
# BN backward reductions: sum(dy), sum(dy * xhat) with xhat formed in-kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(dy_ref, x_ref, mean_ref, inv_ref, out_ref, *, n_valid,
                tile_n, fold):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dy = dy_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    # mean/inv are (1, C); with the lane fold the data rows are (N/f, C*f),
    # so tile the per-channel vectors f times along the lane axis
    mv = mean_ref[:]
    iv = inv_ref[:]
    if fold > 1:
        mv = jnp.concatenate([mv] * fold, axis=-1)
        iv = jnp.concatenate([iv] * fold, axis=-1)
    rem = n_valid - i * tile_n
    row = jax.lax.broadcasted_iota(jnp.int32, dy.shape, 0)
    valid = row < rem
    zero = jnp.zeros((), jnp.float32)
    dy = jnp.where(valid, dy, zero)
    x = jnp.where(valid, x, zero)
    xhat = (x - mv) * iv
    out_ref[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(dy * xhat, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def bn_bwd_sums(dy, x, mean, inv, *, tile_n=512, interpret=False):
    """(sum_n dy, sum_n dy * xhat) over axis 0 of (N, C) arrays, where
    xhat = (x - mean) * inv is formed inside the kernel — one HBM pass over
    dy and x, no materialized xhat. mean/inv are (C,)."""
    n, c = dy.shape
    f = _lane_fold(n, c)
    cf = c * f
    if f > 1:
        dy = dy.reshape(n // f, cf)
        x = x.reshape(n // f, cf)
    grid = (pl.cdiv(dy.shape[0], tile_n),)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, n_valid=dy.shape[0], tile_n=tile_n,
                          fold=f),
        out_shape=jax.ShapeDtypeStruct((2, cf), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, cf), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, cf), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, cf), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(dy, x, mean.reshape(1, c).astype(jnp.float32),
      inv.reshape(1, c).astype(jnp.float32))
    s1, s2 = out[0], out[1]
    if f > 1:
        s1 = s1.reshape(f, c).sum(0)
        s2 = s2.reshape(f, c).sum(0)
    return s1, s2
