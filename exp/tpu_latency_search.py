"""TPU-measured latency LUT -> evolutionary search, end to end on hardware.

The reference's deployment flow is: per-device latency LUT (downloaded
YAML) -> LatencyEstimator -> EvolutionFinder under a ms constraint
(tutorial/latency_table.py + evolution_finder.py). This script runs the
TPU-native analogue against the real chip:

1. build_block_latency_table: one device-measured 'expanded_conv' entry
   per (kernel, expand, resolution) + per-pixel_d head/tail remainder
   (scan-amortized, slope-timed — search/latency.py).
2. Additivity spot-check: LUT estimate vs whole-subnet device measurement
   on sampled non-uniform configs (XLA fuses across blocks, so the LUT is
   approximate; the error is reported, not assumed).
3. EvolutionFinder under a latency constraint, quality = closed-form
   FLOPs (capacity proxy), then the winner's TRUE device latency.

Writes a JSON report to --out. Probe relay health first (exp/relay_probe.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hr", type=int, default=96)
    ap.add_argument("--out", default="/tmp/tpu_latency_search.json")
    ap.add_argument("--constraint_frac", type=float, default=0.5,
                    help="latency constraint as a fraction of the max "
                         "uniform subnet's LUT estimate")
    a = ap.parse_args()

    import jax

    from ofa_sr_tpu.models import (OFAMobileNetS4, SearchSpace, sample_subnet)
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.materialize import get_active_subnet
    from ofa_sr_tpu.search import EvolutionFinder, s4_subnet_flops
    from ofa_sr_tpu.search.latency import (build_block_latency_table,
                                           lut_efficiency_fn,
                                           measure_latency_device)
    import jax.numpy as jnp

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    print("building block LUT on", jax.devices()[0].platform, flush=True)
    table = build_block_latency_table(net, params, state, space, hr_size=a.hr)
    eff = lut_efficiency_fn(table, space, hr_size=a.hr)

    rng = np.random.RandomState(0)
    report = {"hr": a.hr, "lut": table.table}

    # additivity spot-check on non-uniform sampled configs
    checks = []
    for seed in (3, 11, 27):
        cfg = sample_subnet(space, seed=seed)
        sub = get_active_subnet(net, params, state, cfg)
        lr = a.hr // (2 ** cfg.pixel_d)
        x = jnp.asarray(rng.rand(1, lr, lr, 3), jnp.float32)
        true_ms = measure_latency_device(sub, x)
        est_ms = eff(cfg)
        checks.append({"cfg": repr(cfg), "true_ms": round(true_ms, 4),
                       "lut_ms": round(est_ms, 4),
                       "rel_err": round((est_ms - true_ms) / true_ms, 4)})
        print("additivity:", checks[-1], flush=True)
    report["additivity"] = checks

    # search: biggest capacity under a TPU-ms budget
    big = uniform_subnet(space, 7, 6, 4, 1)
    constraint = a.constraint_frac * eff(big)
    finder = EvolutionFinder(space, efficiency_fn=eff,
                             quality_fn=lambda c: s4_subnet_flops(
                                 c, space, hr_size=a.hr),
                             population_size=64, max_time_budget=30, seed=0)
    best, q, hist = finder.run(constraint)
    sub = get_active_subnet(net, params, state, best)
    lr = a.hr // (2 ** best.pixel_d)
    x = jnp.asarray(rng.rand(1, lr, lr, 3), jnp.float32)
    won_ms = measure_latency_device(sub, x)
    report["search"] = {
        "constraint_ms": round(constraint, 4),
        "winner": repr(best),
        "winner_lut_ms": round(eff(best), 4),
        "winner_true_ms": round(won_ms, 4),
        "winner_gmacs": round(q / 1e9, 3),
        "quality_history_gmacs": [round(h / 1e9, 3) for h in hist[:: max(1, len(hist) // 10)]],
    }
    print(json.dumps(report["search"], indent=2), flush=True)
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
