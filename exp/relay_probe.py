"""10-second relay/chip health probe. Run BEFORE believing any TPU number.

The relayed v5e's effective throughput varies ~25x between sessions
(NOTES_ROUND2.md): healthy is ~100+ TF/s on a bf16 matmul with few-ms
dispatch; degraded is 3-20 TF/s with multi-second dispatch. All timings are
value-fetch terminated because `block_until_ready` through the relay can
report before execution completes.

Prints one JSON line: {"dispatch_rtt_ms": ..., "bf16_matmul_tflops": ...,
"healthy": bool}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # dispatch RTT: tiny chained adds, value-fetch each step
    x = jnp.zeros((16,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    y = f(x)
    _ = float(np.asarray(jnp.sum(y)))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(y)
        _ = float(np.asarray(jnp.sum(y)))
    rtt_ms = (time.perf_counter() - t0) / n * 1000

    # MXU throughput: chained 4096^3 bf16 matmul
    a = jnp.asarray(np.random.RandomState(0).rand(4096, 4096) * 1e-3,
                    jnp.bfloat16)
    g = jax.jit(lambda m: (m @ m) * 1e-3)
    b = g(a)
    _ = float(np.asarray(jnp.sum(b.astype(jnp.float32))))
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        b = g(b)
    _ = float(np.asarray(jnp.sum(b.astype(jnp.float32))))
    tflops = 2 * 4096 ** 3 * reps / (time.perf_counter() - t0) / 1e12

    print(json.dumps({
        "dispatch_rtt_ms": round(rtt_ms, 1),
        "bf16_matmul_tflops": round(tflops, 1),
        "healthy": bool(tflops > 30 and rtt_ms < 100),
    }))


if __name__ == "__main__":
    main()
