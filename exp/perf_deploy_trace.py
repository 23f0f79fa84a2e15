"""Device-timeline account of the deployment frame (bench.py's eval half).

Envelope = the reference eval setup (eval_ofa_net_sr.py:218-220,111,167):
materialized ks7/e6/d2/pd2 subnet, one 720p frame (LR 320x184), bs=1.
Frames are chained inside one lax.scan dispatch with the carry folded into
the input (scan-hoisting trap, NOTES_ROUND3 measurement rules), profiled
for one dispatch, and the leaf events bucketed with the same classifier as
the train-step account (exp/perf_trace_account.parse_trace).

Usage: python exp/perf_deploy_trace.py [--dtype f32|bf16] [--n 16] [--top 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from perf_trace_account import parse_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--bs", type=int, default=1,
                    help="frames per dispatch step (batched serving; the "
                         "reference envelope is bs=1)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--fold_tail", action="store_true",
                    help="output conv folded through the last pixel_shuffle "
                         "(models/materialize.py _fold_conv_through_shuffle)")
    ap.add_argument("--trace_dir", default="/tmp/ofa_deploy_trace")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.materialize import get_active_subnet

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    sub_cfg = uniform_subnet(space, 7, 6, 2, 2)
    sub = get_active_subnet(net, params, state, sub_cfg,
                            fold_tail=a.fold_tail)
    x = jnp.asarray(np.random.RandomState(1).rand(a.bs, 184, 320, 3),
                    jnp.float32)
    if a.dtype == "bf16":
        sub.params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if hasattr(v, "astype") else v,
            sub.params)
        x = x.astype(jnp.bfloat16)
        fn = lambda v: sub(v).astype(jnp.float32)
    else:
        fn = sub

    @jax.jit
    def run():
        def body(c, _):
            y = fn(x + c.astype(x.dtype))
            return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=a.n)
        return out

    _ = float(np.asarray(run()))  # compile + warm
    t0 = time.perf_counter()
    _ = float(np.asarray(run()))
    wall_ms = (time.perf_counter() - t0) * 1000 / (a.n * a.bs)

    os.makedirs(a.trace_dir, exist_ok=True)
    with jax.profiler.trace(a.trace_dir):
        _ = float(np.asarray(run()))

    ops, cats, busy, span = parse_trace(a.trace_dir, a.top)
    n = a.n * a.bs  # per-frame normalization
    print(json.dumps({
        "config": {"dtype": a.dtype, "frames_per_dispatch": n, "bs": a.bs,
                   "fold_tail": a.fold_tail,
                   "envelope": "ks7/e6/d2/pd2, LR 320x184 -> 720p"},
        "wall_ms_per_frame (value-fetch, incl. +RTT/n)": round(wall_ms, 3),
        "device_busy_ms_per_frame": round(busy / 1e3 / n, 3),
        "device_span_ms_per_frame": round(span / 1e3 / n, 3),
        "device_idle_ms_per_frame": round((span - busy) / 1e3 / n, 3),
        "categories": {
            k: {"ms_per_frame": round(v[0] / 1e3 / n, 3),
                "count_per_frame": round(v[1] / n, 1),
                "tflops": round(v[2] / (v[0] / 1e6) / 1e12, 2) if v[0] else 0,
                "GBps": round(v[3] / (v[0] / 1e6) / 1e9, 1) if v[0] else 0}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1][0])
            if v[0] / 1e3 / n >= 0.01},
        "top_ops": [{"op": nm[:90],
                     "ms_per_frame": round(d / 1e3 / n, 3),
                     "count": c} for nm, (d, c) in ops],
    }, indent=2))


if __name__ == "__main__":
    main()
