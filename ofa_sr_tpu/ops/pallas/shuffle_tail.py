"""Fused decoder-tail kernel (Pallas/TPU): 5x5 conv (64->256, BN folded)
+ PixelShuffle(2) in one VMEM-resident pass.

The SR decoder's upsampling hot loop (SURVEY.md §3.5 item 3; reference
ofa_mbs4.py:108-120: ConvLayer(64->256, 5x5) -> BN -> nn.PixelShuffle(2)).
As separate XLA ops the (B,H,W,256) conv output makes an HBM round-trip
before the shuffle's layout change; here each program computes one row strip
and writes the *shuffled* (B,2H,2W,64) strip directly.

Halo handling: the round-1 fused-MBConv kernel used manual HBM->VMEM halo
DMAs, which intermittently faulted the relayed device (NOTES_ROUND1.md).
This kernel instead uses the pipelined-BlockSpec formulation: the input is
passed three times with row-shifted index maps (previous / current / next
strip), so Pallas's own pipeline performs every HBM transfer and the kernel
assembles the 2-row halo from VMEM-resident neighbor blocks.

The conv is 25 shifted (T*W, C_in) @ (C_in, 4*C_in) MXU matmuls accumulated
in f32; the shuffle matches ops/pixelshuffle.pixel_shuffle /
torch.nn.PixelShuffle via a weight-channel permutation (see _kernel).

r2 HW status (exp/pallas_hw_bench.py, v5e): compiles and runs correctly
(max err ~2e-6) after replacing the 5-D transpose and lane-adjacent stack
with Mosaic-lowerable ops, but measures ~12x SLOWER than the XLA
composition at the 720p deployment shape — the 25 sublane-misaligned tap
slices of the halo scratch trigger per-tap relayouts, and the matmul time
alone (K=64) already matches XLA's whole fused cost. XLA remains the
production path; the kernel stays opt-in (OFA_SR_TPU_PALLAS=1) as the
fusion scaffold.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KS = 5
P = KS // 2  # halo rows/cols
R = 2        # shuffle factor


def shuffle_tail_reference(x, w, b):
    """XLA composition with identical semantics (also the fallback):
    conv5x5 SAME (+bias) -> PixelShuffle(2). w: (5,5,C,4C) HWIO, b: (4C,)."""
    from ...ops.conv import conv2d
    from ...ops.pixelshuffle import pixel_shuffle
    return pixel_shuffle(conv2d(x, w) + b, R)


def _kernel(prev_ref, cur_ref, next_ref, w_ref, b_ref, out_ref, padded, *,
            t, width, c_in, c_out):
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    # assemble the halo'd strip in VMEM (zeros outside the image)
    padded[:] = jnp.zeros_like(padded)
    padded[P:P + t, P:P + width, :] = cur_ref[0]

    @pl.when(ti > 0)
    def _():
        padded[0:P, P:P + width, :] = prev_ref[0, t - P:t, :, :]

    @pl.when(ti < n_t - 1)
    def _():
        padded[P + t:P + t + P, P:P + width, :] = next_ref[0, 0:P, :, :]

    # 25 shifted MXU matmuls, f32 accumulation
    acc = jnp.zeros((t * width, c_out), jnp.float32)
    for dy in range(KS):
        for dx in range(KS):
            patch = padded[dy:dy + t, dx:dx + width, :].reshape(
                t * width, c_in)
            acc = acc + jnp.dot(patch, w_ref[dy * KS + dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]

    # PixelShuffle(2) with Mosaic-lowerable ops only (no 5-D transpose, no
    # lane-adjacent stack — both fail the Mosaic lowering): the dispatch
    # pre-permuted the weight's output channels into sub-pixel blocks
    # [(y=0,x=0)|(0,1)|(1,0)|(1,1)] x c, so
    # - the column interleave is FREE: within a row half, channels are
    #   [x=0 block | x=1 block], and the caller's final row-major reshape
    #   (..., W, 2c) -> (..., 2W, c) interleaves columns without moving a
    #   byte;
    # - the row interleave is ONE stack along a major axis (supported):
    #   (t, 2, width, 2c) -> contiguous merge (2t, width, 2c).
    half = c_out // 2
    v = acc.reshape(t, width, c_out)
    rows = jnp.stack([v[:, :, :half], v[:, :, half:]],
                     axis=1).reshape(t * R, width, half)
    out_ref[0] = rows.astype(out_ref.dtype)


def _pick_t(h, budget_rows=16):
    for t in range(min(budget_rows, h), 0, -1):
        if h % t == 0:
            return t
    return h


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dispatch(x, w25, b, interpret=False):
    bsz, h, width, c_in = x.shape
    c_out = w25.shape[-1]
    t = _pick_t(h)
    n_t = h // t

    grid = (bsz, n_t)

    def shifted(off):
        return pl.BlockSpec(
            (1, t, width, c_in),
            lambda bi, ti, off=off: (
                bi, jnp.clip(ti + off, 0, n_t - 1), 0, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, t=t, width=width, c_in=c_in, c_out=c_out),
        out_shape=jax.ShapeDtypeStruct((bsz, h * R, width, c_out // 2),
                                       x.dtype),
        grid=grid,
        in_specs=[
            shifted(-1), shifted(0), shifted(+1),
            pl.BlockSpec((KS * KS, c_in, c_out),
                         lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t * R, width, c_out // 2),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * P, width + 2 * P, c_in), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, w25, b[None])
    # the free column interleave: (B, 2H, W, 2c) row-major == (B, 2H, 2W, c)
    return out.reshape(bsz, h * R, width * R, c_out // 4)


def fused_shuffle_tail(x, w, b, *, interpret=False):
    """conv5x5(C->4C, SAME, +bias) + PixelShuffle(2), fused.

    x: (B, H, W, C) f32; w: (5, 5, C, 4C) HWIO; b: (4C,).
    Returns (B, 2H, 2W, C).

    Falls back to the XLA composition off-TPU unless `interpret`;
    hardware execution is opt-in via OFA_SR_TPU_PALLAS=1 until benchmarked
    healthy on the target chip session.
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    hw_ok = interpret or (on_tpu and os.environ.get("OFA_SR_TPU_PALLAS") == "1")
    if not hw_ok:
        return shuffle_tail_reference(x, w, b)
    # group output channels by sub-pixel (see _kernel's shuffle): PyTorch
    # PixelShuffle channel index decomposes row-major as (c, y, x), so
    # sub-pixel s = y*R+x owns channels [c*R*R + s for all c]
    c_out = w.shape[3]
    c = c_out // (R * R)
    perm = jnp.asarray([ci * R * R + s for s in range(R * R)
                        for ci in range(c)])
    w25 = w.reshape(KS * KS, w.shape[2], c_out)[:, :, perm]
    return _dispatch(x, w25, b[perm], interpret=interpret)
