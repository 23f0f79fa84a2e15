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

    # MXU throughput: n chained 4096^3 bf16 matmuls inside ONE dispatch
    # (lax.scan). Per-call chaining measures the relay's dispatch RTT, not
    # the chip: a session once probed 16 TF/s per-call while the same chip
    # did 133 TF/s scan-amortized. Compute health and relay RTT are
    # independent axes — report both.
    from jax import lax

    a = jnp.asarray(np.random.RandomState(0).rand(4096, 4096) * 1e-3,
                    jnp.bfloat16)
    n = 50

    @jax.jit
    def run(m):
        def body(c, _):
            return (c @ c) * 1e-3, None
        y, _ = lax.scan(body, m, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(np.asarray(run(a)))  # compile + warm
    t0 = time.perf_counter()
    _ = float(np.asarray(run(a)))
    tflops = 2 * 4096 ** 3 * n / (time.perf_counter() - t0) / 1e12

    print(json.dumps({
        "dispatch_rtt_ms": round(rtt_ms, 1),
        "bf16_matmul_tflops": round(tflops, 1),
        "healthy": bool(tflops > 60),
        "relay_fast": bool(rtt_ms < 10),
    }))


if __name__ == "__main__":
    main()
