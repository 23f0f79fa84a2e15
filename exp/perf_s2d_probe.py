"""Decision probe for the space-to-depth (s2d) wide-conv execution mode
(VERDICT r2 item 2): is a 4x-FLOPs block-diagonal 1x1 conv at 256->1536
channels faster on this chip than the exact 64->384 conv it would replace?

The trunk's 1x1 convs contract only 64 channels — half an MXU row dim at
best — and measured ~2.9 TF/s (NOTES_ROUND2). Re-laying the LR stream
H,W,64 -> H/2,W/2,256 makes every 1x1 MXU-shaped, at the cost of executing
the block-diagonal (4x) FLOPs densely. Worth building only if the measured
speedup of the wide shape exceeds 4x — this probe answers that in one
dispatch each, scan-amortized, value-fetch timed (the round-2 relay
methodology; run exp/relay_probe.py first).

Also probes the depthwise side: the s2d equivalent of a 7x7 depthwise is a
sum of 16 4x4 phase-pair depthwise convs at quarter resolution (~1.3x
FLOPs); measures both formulations.
"""

import json
import time

import numpy as np


def _wall(fn, x, n):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(v):
        def body(c, _):
            return fn(c), None
        y, _ = lax.scan(body, v, None, length=n)
        return jnp.sum(y[..., :1].astype(jnp.float32))

    _ = float(np.asarray(run(x)))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(x)))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, x, n1=50, n2=250, label=""):
    """Seconds per iteration, slope-timed: (T(n2)-T(n1))/(n2-n1) cancels
    the +RTT/n dispatch bias a single scan-amortized window carries
    (an empty body 'measures' RTT/n — 300 us at n=100 behind a 30 ms
    relay). The body chains the carry, so XLA cannot hoist it."""
    return (_wall(fn, x, n2) - _wall(fn, x, n1)) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    out = {}
    for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        B, H, W = 16, 48, 48
        x_full = jnp.asarray(rng.rand(B, H, W, 64) * 0.1, dtype)
        x_s2d = jnp.asarray(rng.rand(B, H // 2, W // 2, 256) * 0.1, dtype)
        w64 = jnp.asarray(rng.rand(1, 1, 64, 384) * 0.1, dtype)
        w256 = jnp.asarray(rng.rand(1, 1, 256, 1536) * 0.01, dtype)
        # shrink the output back so the scan can chain (cost negligible)
        wb64 = jnp.asarray(rng.rand(1, 1, 384, 64) * 0.01, dtype)
        wb256 = jnp.asarray(rng.rand(1, 1, 1536, 256) * 0.003, dtype)
        dimnums = ("NHWC", "HWIO", "NHWC")

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dimnums)

        flops_narrow = 2 * B * H * W * 64 * 384 * 2  # fwd+shrink
        t = timed(lambda v: conv(conv(v, w64), wb64), x_full)
        out["conv1x1_64_%s" % dtype_name] = {
            "ms": round(t * 1e3, 3), "tflops": round(flops_narrow / t / 1e12, 2)}

        flops_wide = 2 * B * (H // 2) * (W // 2) * 256 * 1536 * 2
        t = timed(lambda v: conv(conv(v, w256), wb256), x_s2d)
        out["conv1x1_256_%s" % dtype_name] = {
            "ms": round(t * 1e3, 3), "tflops": round(flops_wide / t / 1e12, 2)}

        # same contraction as matmuls (is the gap conv lowering or MXU shape?)
        m64 = x_full.reshape(-1, 64)
        mw64, mwb64 = w64[0, 0], wb64[0, 0]
        t = timed(lambda v: (v @ mw64) @ mwb64, m64)
        out["matmul_64_%s" % dtype_name] = {
            "ms": round(t * 1e3, 3), "tflops": round(flops_narrow / t / 1e12, 2)}
        m256 = x_s2d.reshape(-1, 256)
        mw256, mwb256 = w256[0, 0], wb256[0, 0]
        t = timed(lambda v: (v @ mw256) @ mwb256, m256)
        out["matmul_256_%s" % dtype_name] = {
            "ms": round(t * 1e3, 3), "tflops": round(flops_wide / t / 1e12, 2)}

        # depthwise: full-res 7x7x384 vs s2d 16x (4x4 phase-pair) sum
        xw = jnp.asarray(rng.rand(B, H, W, 384) * 0.1, dtype)
        wdw = jnp.asarray(rng.rand(7, 7, 1, 384) * 0.02, dtype)

        def dw(x, w, k):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dimnums,
                feature_group_count=x.shape[-1])
        t = timed(lambda v: dw(v, wdw, 7), xw)
        dw_flops = 2 * B * H * W * 49 * 384
        out["dw7x7_384_%s" % dtype_name] = {
            "ms": round(t * 1e3, 3), "tflops": round(dw_flops / t / 1e12, 2)}

        xw4 = jnp.asarray(rng.rand(B, H // 2, W // 2, 4 * 384) * 0.1, dtype)
        wdw4 = jnp.asarray(rng.rand(4, 4, 1, 4 * 384) * 0.02, dtype)

        def dw_s2d(v):
            # cost model of the s2d depthwise: 4 phase-pair rounds of a
            # 4x4 depthwise over all 4*C channels (= 16 C-wide convs)
            y = dw(v, wdw4, 4)
            for _ in range(3):
                y = y + dw(v, wdw4, 4)
            return y * 0.1
        t = timed(dw_s2d, xw4)
        dw_s2d_flops = 2 * B * (H // 2) * (W // 2) * 16 * 16 * 384
        out["dw_s2d_equiv_%s" % dtype_name] = {
            "ms": round(t * 1e3, 3),
            "tflops": round(dw_s2d_flops / t / 1e12, 2)}

    # decision summary: wall-clock of the exact op vs its s2d replacement
    for dt in ("f32", "bf16"):
        out["verdict_1x1_%s" % dt] = {
            "narrow_ms": out["conv1x1_64_%s" % dt]["ms"],
            "s2d_ms": out["conv1x1_256_%s" % dt]["ms"],
            "s2d_wins": out["conv1x1_256_%s" % dt]["ms"]
            < out["conv1x1_64_%s" % dt]["ms"],
        }
        out["verdict_dw_%s" % dt] = {
            "full_ms": out["dw7x7_384_%s" % dt]["ms"],
            "s2d_ms": out["dw_s2d_equiv_%s" % dt]["ms"],
            "s2d_wins": out["dw_s2d_equiv_%s" % dt]["ms"]
            < out["dw7x7_384_%s" % dt]["ms"],
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
