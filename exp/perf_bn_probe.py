"""HW probe: XLA vs Pallas BN-statistics reductions at the step's shapes
(VERDICT r3 item 3 decision gate).

Times per-channel (sum, sum-of-squares) over NHWC activations — the
`multiply_reduce` fusion pattern the trace shows dominating non-conv step
time — as (a) XLA jnp-mean moments, (b) the Pallas one-pass paired column
sum (ops/pallas/bn_stats.py). Methodology (memory rules 1-4): scan-
amortized, value-fetch timed, **slope-timed** ((T(n2)-T(n1))/(n2-n1)
cancels the +RTT/n dispatch bias), and the scan carry is folded into the
input (xi = x + c) so XLA cannot hoist the loop-invariant reduction out
of the scan (it does — a carry-independent body measures ~0).

CAVEAT (first round-3 session): the carry-folding add (x + c) costs a
full extra HBM read+write on both sides, so absolute GB/s here understate
the bare reduction; the A/B is fair but the production decision was made
at full-step level (exp/perf_step_variants.py with OFA_SR_TPU_PALLAS_BN).

Usage: python exp/perf_bn_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _wall(fn, n):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run():
        def body(c, _):
            m, v = fn(c)
            return c + m[0] + v[0], None
        tot, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return tot

    _ = float(np.asarray(run()))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run()))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, n1=50, n2=250):
    """Seconds per iteration, slope-timed; fn takes the scan carry."""
    return (_wall(fn, n2) - _wall(fn, n1)) / (n2 - n1)


def main():
    import jax.numpy as jnp

    from ofa_sr_tpu.ops.norm import batch_moments
    from ofa_sr_tpu.ops.pallas.bn_stats import bn_moments_pallas

    rng = np.random.RandomState(0)
    out = {}
    B, H, W = 16, 48, 48
    for c in (64, 384):
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x = jnp.asarray(rng.rand(B, H, W, c), dt)
            nbytes = x.size * x.dtype.itemsize
            # fold the carry into the input so XLA can't hoist the
            # reduction out of the scan (memory rule 4)
            t_xla = timed(
                lambda cc: batch_moments((x + cc.astype(dt)).astype(jnp.float32)))
            t_pl = timed(lambda cc: bn_moments_pallas(x + cc.astype(dt)))
            out["C%d_%s" % (c, dt_name)] = {
                "xla_us": round(t_xla * 1e6, 1),
                "pallas_us": round(t_pl * 1e6, 1),
                "xla_GBps": round(nbytes / t_xla / 1e9, 1),
                "pallas_GBps": round(nbytes / t_pl / 1e9, 1),
                "speedup": round(t_xla / t_pl, 2),
            }
            print("C%d %s -> %s" % (c, dt_name, out["C%d_%s" % (c, dt_name)]),
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
