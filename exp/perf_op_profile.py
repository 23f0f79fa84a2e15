"""Per-op f32-vs-bf16 micro-profile at the train-step shapes.

Round-2 finding: bf16 conv micros got faster than f32 on current libtpu, but
the full bf16 train step is ~2.5x slower — some op falls off a fast path.
This script times each hot op of the supernet step (bs16, LR 48x48, mid 384)
in f32 and bf16, forward and forward+backward, to find the offender.

Method: each op runs n times inside ONE jit via lax.scan with a scalar data
dependency between iterations (the relay's per-dispatch RTT is orders of
magnitude larger than these ops). An identity op measures the scan/dependency
overhead, which is subtracted. Timing is value-fetch terminated.

Usage: python exp/perf_op_profile.py   (on the real chip; probe health first)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import json
import time
from functools import partial

import numpy as np


def timed_op(jax, jnp, op, x_shape, dtype, n=100, backward=False, reps=3):
    from jax import lax

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(*x_shape) * 0.1, dtype)

    if backward:
        def step(x):
            return jnp.sum(jax.grad(lambda a: jnp.sum(op(a) ** 2))(x))
    else:
        def step(x):
            return op(x).ravel()[0]

    @jax.jit
    def run(x):
        def body(carry, _):
            dep = step(carry)
            return carry + jnp.zeros_like(carry) * dep.astype(carry.dtype), None
        y, _ = lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(np.asarray(run(x0)))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        v = float(np.asarray(run(x0)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e6  # us per op


def main():
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.ops.conv import conv2d, depthwise_conv2d
    from ofa_sr_tpu.ops.norm import batch_norm, bn_init
    from ofa_sr_tpu.ops.pixelshuffle import pixel_shuffle

    B, H, W = 16, 48, 48
    MID = 384

    results = {}
    for name_dtype, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        rng = np.random.RandomState(1)
        w_ib = jnp.asarray(rng.randn(1, 1, 64, MID) * 0.05, dtype)
        w_dw = jnp.asarray(rng.randn(7, 7, 1, MID) * 0.05, dtype)
        w_pl = jnp.asarray(rng.randn(1, 1, MID, 64) * 0.05, dtype)
        w_tail = jnp.asarray(rng.randn(5, 5, 64, 256) * 0.05, dtype)
        bn_p, bn_s = bn_init(MID)  # BN params/state stay f32 by design

        ops = {
            "identity": (lambda x: x, (B, H, W, 64)),
            "conv1x1_64_384": (lambda x: conv2d(x, w_ib), (B, H, W, 64)),
            "dwconv7x7_384": (lambda x: depthwise_conv2d(x, w_dw), (B, H, W, MID)),
            "conv1x1_384_64": (lambda x: conv2d(x, w_pl), (B, H, W, MID)),
            "bn_train_384": (
                lambda x: batch_norm(x, bn_p, bn_s, training=True)[0],
                (B, H, W, MID)),
            "relu6_384": (lambda x: jnp.minimum(jnp.maximum(x, 0), 6.0),
                          (B, H, W, MID)),
            "conv5x5_64_256": (lambda x: conv2d(x, w_tail), (B, H, W, 64)),
            "pixelshuffle2_256": (lambda x: pixel_shuffle(x, 2), (B, H, W, 256)),
            "mbconv_fused": (
                lambda x: conv2d(
                    jnp.minimum(jnp.maximum(
                        depthwise_conv2d(
                            jnp.minimum(jnp.maximum(conv2d(x, w_ib), 0), 6.0),
                            w_dw), 0), 6.0),
                    w_pl),
                (B, H, W, 64)),
        }
        for op_name, (op, shape) in ops.items():
            for bwd in (False, True):
                key = f"{op_name}/{name_dtype}/{'fb' if bwd else 'f'}"
                try:
                    us = timed_op(jax, jnp, op, shape, dtype, backward=bwd)
                except Exception as e:  # keep going; record the failure
                    results[key] = f"ERR {type(e).__name__}: {e}"[:120]
                    continue
                results[key] = round(us, 1)
                print(f"{key:40s} {results[key]:>10} us", flush=True)

    # subtract the identity baseline per (dtype, mode) when reading results
    print(json.dumps(results))


if __name__ == "__main__":
    main()
