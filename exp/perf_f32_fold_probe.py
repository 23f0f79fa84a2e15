"""Root-cause probe for the r3 f32 deployment regression (VERDICT r4 item 2).

BENCH_r03's headline f32 deployment frame was 47.3 ms — 2.6x worse than r2's
18.1 ms — the round fold_tail (materialize.py: output conv folded through the
last pixel_shuffle) became default-on. fold_tail was only ever raced in bf16.
Two hypotheses:
  (a) f32+fold_tail hits the XLA-f32 narrow-conv lowering pathology already
      measured twice (s2d-f32 ~6x, dw_switch-f32 ~8x — NOTES_ROUND3);
  (b) the chip was degraded mid-bench and the deploy half of bench.py had no
      health guard.

This probe answers it with an equal-n interleaved A/B on the reference eval
envelope (720p frame, ks7/e6/d2/pd2, eval_ofa_net_sr.py:218-220): frame ms
for {f32, bf16} x {fold_tail on, off}, chip health probed before and after.
Each cell is measured twice in interleaved order so chip drift shows up as
intra-cell spread rather than corrupting the A/B.

Run on the TPU: python exp/perf_f32_fold_probe.py [--out FILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--rounds", type=int, default=2)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import probed_matmul_tflops
    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.materialize import get_active_subnet
    from ofa_sr_tpu.search.latency import measure_latency_device

    print("devices:", jax.devices(), flush=True)
    health0 = probed_matmul_tflops(jax, jnp, n=20)
    print("health probe (bf16 4096^3 chained): %.1f TF/s" % health0,
          flush=True)

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    cfg = uniform_subnet(space, 7, 6, 2, 2)
    lr_hw = (184, 320)  # 720p envelope, 180 rounded to sublane-friendly 184
    xf = jnp.asarray(np.random.RandomState(1).rand(1, *lr_hw, 3), jnp.float32)

    def cell_fn(dtype, fold):
        sub = get_active_subnet(net, params, state, cfg, fold_tail=fold)
        if dtype == "bf16":
            sub.params = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16) if hasattr(t, "astype") else t,
                sub.params)
            return (lambda v: sub(v).astype(jnp.float32),
                    xf.astype(jnp.bfloat16))
        return sub, xf

    cells = [("f32", True), ("f32", False), ("bf16", True), ("bf16", False)]
    results = {"%s_fold%s" % (d, f): [] for d, f in cells}
    for r in range(a.rounds):
        for dtype, fold in cells:
            fn, x = cell_fn(dtype, fold)
            t0 = time.time()
            ms = measure_latency_device(fn, x, n_small=8, n_big=24)
            key = "%s_fold%s" % (dtype, fold)
            results[key].append(round(ms, 3))
            print("round %d %s: %.3f ms/frame (wall %.0fs)"
                  % (r, key, ms, time.time() - t0), flush=True)

    health1 = probed_matmul_tflops(jax, jnp, n=20)
    report = {
        "envelope": "720p frame LR 320x184, ks7/e6/d2/pd2, materialized, "
                    "slope-timed device latency (measure_latency_device)",
        "health_tflops_before": round(health0, 1),
        "health_tflops_after": round(health1, 1),
        "frame_ms": results,
        "frame_ms_best": {k: min(v) for k, v in results.items()},
    }
    f32_ratio = min(results["f32_foldTrue"]) / min(results["f32_foldFalse"])
    bf16_ratio = min(results["bf16_foldTrue"]) / min(results["bf16_foldFalse"])
    report["fold_over_nofold"] = {"f32": round(f32_ratio, 3),
                                  "bf16": round(bf16_ratio, 3)}
    report["verdict"] = (
        "f32 fold_tail pathological (gate it)" if f32_ratio > 1.3 else
        "f32 fold_tail fine -> r3 number was chip degradation"
        if f32_ratio < 1.1 else "marginal")
    print(json.dumps(report, indent=2))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
