"""Fused MBConv inference kernel (Pallas/TPU).

The materialized-subnet hot loop (SURVEY.md §3.5 item 2) is the MBConv
chain: 1x1 conv -> ReLU6 -> k x k depthwise -> ReLU6 -> 1x1 conv (+bias
each, BN folded) + residual. As separate XLA ops the (B,H,W,mid) activation
makes three HBM round-trips; this kernel keeps a row strip resident in VMEM
end-to-end:

- grid over (batch, H strips); each program DMAs one halo'd full-width row
  strip from HBM once (a single-axis dynamic slice — the TPU DMA engine
  rejects halo'd dynamic slices on two axes, so the W axis is chunked
  *inside* the kernel with static offsets instead);
- per W chunk: 1x1 expand as an MXU matmul over the chunk's pixels, k^2
  shifted multiply-accumulates on the VPU for the depthwise, 1x1 project as
  a second matmul, bias + ReLU6 + residual fused in-register;
- out-of-image halo positions are re-zeroed after the expand (the XLA
  composition zero-pads the *mid* activation; ib(0)+bias != 0);
- one HBM write of the output strip.

Channels are padded to the 128-lane tile for the DMA (the SR trunk is
64-wide). Use through models/materialize.py (use_pallas=True); shapes that
don't tile fall back to the XLA composition (`mbconv_reference`).
"""

from __future__ import annotations

import functools

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


def _kernel(x_hbm, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b, out_ref,
            x_tile, sem, *, th, wc, p, ks, residual, img_h, img_w, c_out):
    b = pl.program_id(0)
    ti = pl.program_id(1)

    # one halo'd full-width row strip per program (single-axis dynamic DMA)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(ti * th, th + 2 * p), :, :], x_tile, sem)
    dma.start()
    dma.wait()

    m = ib_w.shape[-1]
    cp = x_tile.shape[-1]
    hp = th + 2 * p
    wcp = wc + 2 * p

    # halo validity masks from iota (no captured constants allowed in pallas)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wcp), 0) + ti * th - p
    row_ok = (rows >= 0) & (rows < img_h)
    base_cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wcp), 1) - p

    chunks = []
    for wj in range(img_w // wc):
        xw = x_tile[:, wj * wc:wj * wc + wcp, :]
        # 1x1 expand (MXU) on the halo'd chunk
        mid = jnp.dot(xw.reshape(hp * wcp, cp), ib_w[:],
                      preferred_element_type=jnp.float32)
        mid = _relu6(mid + ib_b[:]).reshape(hp, wcp, m)
        # zero out-of-image halo positions
        cols = base_cols + wj * wc
        ok = (row_ok & (cols >= 0) & (cols < img_w)).astype(jnp.float32)
        mid = mid * ok[:, :, None]

        # depthwise k x k: shifted MACs (VPU)
        acc = jnp.zeros((th, wc, m), jnp.float32)
        for dy in range(ks):
            for dx in range(ks):
                acc = acc + mid[dy:dy + th, dx:dx + wc, :] * dw_w[dy, dx, :]
        acc = _relu6(acc + dw_b[:])

        # 1x1 project (MXU) + bias (+ residual)
        y = jnp.dot(acc.reshape(th * wc, m), pl_w[:],
                    preferred_element_type=jnp.float32)
        y = (y + pl_b[:]).reshape(th, wc, c_out)
        if residual:
            y = y + x_tile[p:p + th, wj * wc + p:wj * wc + p + wc, :c_out]
        chunks.append(y)
    out_ref[0] = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)


def _pick_tile(n, lo=2, hi=64):
    for t in range(min(hi, n), lo - 1, -1):
        if n % t == 0:
            return t
    return None


def _strip_rows(h, w, c_pad, budget_bytes=3 * 1024 * 1024):
    """rows per strip so the halo'd strip fits the VMEM budget (the strip,
    the double-buffered output block, and one W-chunk of mid/acc must all
    coexist under the ~16M scoped VMEM limit)."""
    per_row = (w + 8) * c_pad * 4
    t = max(2, budget_bytes // per_row - 8)
    return _pick_tile(h, lo=2, hi=min(32, t))


@functools.partial(jax.jit, static_argnames=("residual", "interpret"))
def _dispatch(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b, residual=True,
              interpret=False):
    b, h, w, c = x.shape
    ks = dw_w.shape[0]
    p = ks // 2
    cp = -(-c // 128) * 128
    th = _strip_rows(h, w, cp)
    wc = _pick_tile(w, lo=8, hi=64)
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, cp - c)))
    ib_w_p = jnp.pad(ib_w, ((0, cp - c), (0, 0)))

    kernel = functools.partial(_kernel, th=th, wc=wc, p=p, ks=ks,
                               residual=residual, img_h=h, img_w=w, c_out=c)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # x_pad stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p, w + 2 * p, cp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, ib_w_p, ib_b, dw_w, dw_b, pl_w, pl_b)


def fused_mbconv_infer(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b, *,
                       residual=True, interpret=False):
    """Fused MBConv (inference, BN folded).

    x: [B,H,W,C]; ib_w: [C,M]; ib_b: [M]; dw_w: [k,k,M]; dw_b: [M];
    pl_w: [M,C]; pl_b: [C]. Falls back to the XLA composition when the
    spatial dims don't tile, or unless OFA_SR_TPU_PALLAS=1 on real TPU.

    Status: numerically verified in interpret mode (tests/test_pallas.py).
    On this dev environment's relayed TPU, manual halo DMAs intermittently
    fault the device (the same pattern passes or faults across runs), so
    hardware execution is opt-in via OFA_SR_TPU_PALLAS=1 until the kernel is
    validated on directly-attached hardware.
    """
    import os
    _, h, w, c = x.shape
    cp = -(-c // 128) * 128
    hw_ok = interpret or os.environ.get("OFA_SR_TPU_PALLAS") == "1"
    if (not hw_ok or _strip_rows(h, w, cp) is None
            or _pick_tile(w, lo=8, hi=64) is None):
        return mbconv_reference(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b,
                                residual=residual)
    return _dispatch(x, ib_w, ib_b, dw_w, dw_b, pl_w, pl_b,
                     residual=residual, interpret=interpret)
