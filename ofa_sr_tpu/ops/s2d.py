"""Space-to-depth (s2d) execution of the elastic trunk (VERDICT r2 item 2).

The S4/X4 trunk runs 64-channel convs at LR resolution; a 64-deep
contraction fills at most half the 128x128 MXU and the r2 profile measured
the trunk 1x1s at ~2.9 TF/s. This module re-lays the LR stream
(B,H,W,C) -> (B,H/2,W/2,4C) (phase-major: channel p*C+c holds original
channel c at sub-pixel phase p = py*2+px) and executes the block exactly in
that layout:

- 1x1 convs become block-diagonal (4C -> 4C') convs, built densely with
  jnp.kron: the contraction is 4x deeper (256 for the 64-wide trunk), i.e.
  MXU-shaped, at 4x the FLOPs (3/4 of the dense product is structural
  zeros). Worth it iff the chip runs the wide shape >4x faster than the
  narrow one — exp/perf_s2d_probe.py answers that per session.
- the k x k depthwise conv decomposes into 16 phase-pair depthwise convs at
  quarter resolution with ~(k/2)-sized kernels and per-pair asymmetric
  padding. Exactly the same MACs as the full-resolution depthwise (every
  original tap appears exactly once per output phase) — no FLOP overhead.
- BatchNorm statistics are computed by folding the 4 phases back into the
  spatial axis (a free reshape), so per-channel moments are taken over the
  identical value set as the full-resolution execution: bit-equal
  semantics, (C,)-shaped state threading unchanged.

Everything is window-exact vs the masked full-resolution execution (same
dot products, different association), opt-in via SRTrainer(s2d=True) /
--s2d. Requires even H and W (the bench envelope's LR 48x48 qualifies).

MEASURED NEGATIVE RESULT (v5e, 2026-08-17, healthy chip, scan-amortized
value-fetch timing — exp/perf_step_variants.py *-s2d):
  - op micro-probe (exp/perf_s2d_probe.py): the wide 1x1 reaches 21.3 vs
    5.7 TF/s bf16 — a 3.75x utilization gain, almost exactly cancelled by
    the 4x block-diagonal FLOPs (0.68 vs 0.64 ms): a wash, as the >4x
    speedup condition in the module design predicted.
  - full train step (bs16/96px, remat=all_save_bn): bf16 39.1 ms vs
    36.3 ms masked; f32 354 ms vs 39.4 ms (the 16 phase-pair depthwise
    convs lower terribly in f32, and their backward worse).
The masked full-resolution execution stays the production path; s2d is
kept as an equivalence-tested execution mode and as the measured answer
to "widen the 64-channel convs via space-to-depth" (VERDICT r2 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def s2d(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C), phase-major (channel p*C+c, p=py*2+px)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "s2d needs even spatial dims"
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # b, H2, W2, py, px, c
    return x.reshape(b, h // 2, w // 2, 4 * c)


def un_s2d(y):
    """Inverse of s2d."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h2, w2, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)          # b, H2, py, W2, px, c
    return y.reshape(b, h2 * 2, w2 * 2, c)


def block_diag_1x1(w):
    """(1,1,Ci,Co) -> (1,1,4Ci,4Co) block-diagonal: phase p's channels map
    through the same (Ci,Co) matrix; off-diagonal blocks are zero. The
    gradient wrt the original w sums the 4 diagonal blocks — identical to
    the full-resolution conv's gradient (which sums over all pixels,
    including every phase)."""
    w2 = w.reshape(w.shape[-2], w.shape[-1])
    wbd = jnp.kron(jnp.eye(4, dtype=w2.dtype), w2)
    return wbd.reshape(1, 1, 4 * w2.shape[0], 4 * w2.shape[1])


def merge_phases(x4, c):
    """(B,H2,W2,4C) phase-major -> (B,H2,W2*4,C): phases folded into the
    spatial axis, so per-channel reductions (BN moments) see the identical
    value set as the full-resolution layout. Pure reshape."""
    b, h2, w2, _ = x4.shape
    return x4.reshape(b, h2, w2 * 4, c)


def split_phases(xm, c):
    b, h2, w24, _ = xm.shape
    return xm.reshape(b, h2, w24 // 4, 4 * c)


def _phase_taps(k, p, q):
    """Taps of a k-tap (odd) 1-D SAME conv that an output at phase p takes
    from inputs at phase q, as (kernel_tap_indices, s2d_offsets)."""
    r = k // 2
    dys = [dy for dy in range(k) if (p + dy - r - q) % 2 == 0]
    offs = [(p + dy - r - q) // 2 for dy in dys]
    return dys, offs


def depthwise_s2d(x4, w):
    """Depthwise conv in s2d layout, exact vs the full-resolution
    depthwise_conv2d(un_s2d(x4), w) up to summation order.

    x4: (B,H2,W2,4C) phase-major; w: (k,k,1,C) HWIO depthwise kernel (k odd;
    the elastic window-masked max-ks bank works unchanged). Runs 16 small
    phase-pair depthwise convs at quarter resolution — the same MAC count as
    the full-resolution conv."""
    k = w.shape[0]
    c = w.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    outs = []
    for py in (0, 1):
        for px in (0, 1):
            acc = None
            for qy in (0, 1):
                for qx in (0, 1):
                    dys, oys = _phase_taps(k, py, qy)
                    dxs, oxs = _phase_taps(k, px, qx)
                    kern = w[jnp.asarray(dys)][:, jnp.asarray(dxs)]
                    pad = ((-oys[0], oys[-1]), (-oxs[0], oxs[-1]))
                    q = qy * 2 + qx
                    y = lax.conv_general_dilated(
                        x4[..., q * c:(q + 1) * c], kern, (1, 1), pad,
                        dimension_numbers=dn, feature_group_count=c)
                    acc = y if acc is None else acc + y
            outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
