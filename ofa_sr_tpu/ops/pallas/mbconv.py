"""Fused MBConv inference kernel (Pallas/TPU), pipelined-BlockSpec edition.

The materialized-subnet hot loop (SURVEY.md §3.5 item 2) is the MBConv
chain: 1x1 conv -> ReLU6 -> k x k depthwise -> ReLU6 -> 1x1 conv (+bias
each, BN folded) + residual. As separate XLA ops the (B,H,W,mid) activation
makes three HBM round-trips; this kernel keeps a row strip resident in VMEM
end-to-end.

Halo handling: the round-1 version of this kernel DMA'd a halo'd strip from
HBM manually, which intermittently faulted the relayed device
(NOTES_ROUND1.md: two-axis dynamic slices always fault; single-axis ones
fault after a prior crash). Like ops/pallas/shuffle_tail.py, this version
instead passes the input three times with row-shifted BlockSpec index maps
(previous / current / next strip): Pallas's own pipeline performs every HBM
transfer, and the kernel assembles the p-row halo from VMEM-resident
neighbor blocks. Column halos never need a transfer: each strip is full
width, so the kernel slices columns statically per W chunk.

Per W chunk: 1x1 expand as one MXU matmul over the chunk's (halo'd) pixels,
k^2 shifted multiply-accumulates on the VPU for the depthwise, 1x1 project
as a second matmul, bias + ReLU6 + residual fused in-register. Out-of-image
halo positions are re-zeroed after the expand (the XLA composition zero-pads
the *mid* activation; relu6(0 @ w + bias) != 0). One HBM write of the output
strip.

Use through models/materialize.py (use_pallas=True); shapes that don't tile
fall back to the XLA composition (`mbconv_reference`).

r2 HW status (exp/pallas_hw_bench.py, v5e): compiles and runs correctly on
hardware (no faults — the round-1 manual-DMA problem is gone with the
pipelined shifted-view formulation), measured 1.15-1.3x slower than the
XLA composition at the 720p deployment shape. XLA's own fusion already
keeps this chain in registers well; the kernel stays opt-in
(OFA_SR_TPU_PALLAS=1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def mbconv_reference(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b, *,
                     residual=True):
    """XLA composition with identical semantics (also the fallback)."""
    from ...ops.conv import conv2d, depthwise_conv2d
    h = conv2d(x, ib_w[None, None]) + ib_b
    h = _relu6(h)
    h = depthwise_conv2d(h, dw_w[:, :, None, :]) + dw_b
    h = _relu6(h)
    y = conv2d(h, pl_w[None, None]) + pl_b
    return y + x if residual else y


def _kernel(prev_ref, cur_ref, next_ref, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b,
            out_ref, padded, *, t, width, wc, p, ks, residual, img_h, c_out):
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    # assemble the halo'd full-width strip in VMEM (zeros outside the image)
    padded[:] = jnp.zeros_like(padded)
    padded[p:p + t, p:p + width, :] = cur_ref[0]

    @pl.when(ti > 0)
    def _():
        padded[0:p, p:p + width, :] = prev_ref[0, t - p:t, :, :]

    @pl.when(ti < n_t - 1)
    def _():
        padded[p + t:p + t + p, p:p + width, :] = next_ref[0, 0:p, :, :]

    m = ib_w.shape[-1]
    c_in = padded.shape[-1]
    hp = t + 2 * p
    wcp = wc + 2 * p

    # out-of-image validity for the halo'd chunk (bias + relu6 make padding
    # nonzero after the expand; the reference zero-pads the mid activation)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wcp), 0) + ti * t - p
    row_ok = (rows >= 0) & (rows < img_h)
    base_cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wcp), 1) - p

    chunks = []
    for wj in range(width // wc):
        xw = padded[:, wj * wc:wj * wc + wcp, :]
        # 1x1 expand (MXU) on the halo'd chunk
        mid = jnp.dot(xw.reshape(hp * wcp, c_in), ib_w[:],
                      preferred_element_type=jnp.float32)
        mid = _relu6(mid + ib_b[:]).reshape(hp, wcp, m)
        cols = base_cols + wj * wc
        ok = (row_ok & (cols >= 0) & (cols < width)).astype(jnp.float32)
        mid = mid * ok[:, :, None]

        # depthwise k x k: shifted MACs (VPU)
        acc = jnp.zeros((t, wc, m), jnp.float32)
        for dy in range(ks):
            for dx in range(ks):
                acc = acc + mid[dy:dy + t, dx:dx + wc, :] * dw_w[dy, dx, :]
        acc = _relu6(acc + dw_b[:])

        # 1x1 project (MXU) + bias (+ residual)
        y = jnp.dot(acc.reshape(t * wc, m), pl_w[:],
                    preferred_element_type=jnp.float32)
        y = (y + pl_b[:]).reshape(t, wc, c_out)
        if residual:
            y = y + padded[p:p + t, wj * wc + p:wj * wc + p + wc, :c_out]
        chunks.append(y)
    out_ref[0] = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)


def _pick_tile(n, lo=2, hi=64):
    for t in range(min(hi, n), lo - 1, -1):
        if n % t == 0:
            return t
    return None


def _strip_rows(h, w, c, p, budget_bytes=4 * 1024 * 1024):
    """rows per strip so 3 shifted views (double-buffered by the pipeline)
    plus the padded scratch fit comfortably in VMEM; must also cover the
    p-row halo taken from the neighbor strip."""
    per_row = (w + 2 * p) * c * 4 * 7  # 3 views x2 buffers + scratch
    t = budget_bytes // max(per_row, 1)
    t = _pick_tile(h, lo=max(2, p), hi=min(32, max(t, p)))
    return t if (t is not None and t >= p) else None


@functools.partial(jax.jit, static_argnames=("residual", "interpret"))
def _dispatch(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b, residual=True,
              interpret=False):
    bsz, h, w, c = x.shape
    ks = dw_w.shape[0]
    p = ks // 2
    t = _strip_rows(h, w, c, p)
    wc = _pick_tile(w, lo=8, hi=128)
    n_t = h // t

    def shifted(off):
        return pl.BlockSpec(
            (1, t, w, c),
            lambda bi, ti, off=off: (bi, jnp.clip(ti + off, 0, n_t - 1), 0, 0),
            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, t=t, width=w, wc=wc, p=p, ks=ks,
                               residual=residual, img_h=h, c_out=c)
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_t),
        in_specs=[
            shifted(-1), shifted(0), shifted(+1),
            pl.BlockSpec((c, ib_w.shape[-1]), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib_b.shape[-1],), lambda bi, ti: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, ks, dw_w.shape[-1]), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dw_b.shape[-1],), lambda bi, ti: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl_w.shape[0], c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, w, c), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * p, w + 2 * p, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b)


def fused_mbconv_infer(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b, *,
                       residual=True, interpret=False):
    """Fused MBConv (inference, BN folded).

    x: [B,H,W,C]; ib_w: [C,M]; ib_b: [M]; dw_w: [k,k,M]; dw_b: [M];
    pl_w: [M,C]; pl_b: [C]. Falls back to the XLA composition when the
    spatial dims don't tile, or unless OFA_SR_TPU_PALLAS=1 on real TPU.

    Numerically verified in interpret mode (tests/test_pallas.py); hardware
    execution stays opt-in via OFA_SR_TPU_PALLAS=1 until benchmarked healthy
    on the target chip session.
    """
    _, h, w, c = x.shape
    ks = dw_w.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    hw_ok = interpret or (on_tpu and os.environ.get("OFA_SR_TPU_PALLAS") == "1")
    if (not hw_ok or _strip_rows(h, w, c, ks // 2) is None
            or _pick_tile(w, lo=8, hi=128) is None):
        return mbconv_reference(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b,
                                residual=residual)
    return _dispatch(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b,
                     residual=residual, interpret=interpret)
