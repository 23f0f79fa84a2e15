"""X4 autoencoder 1080p end-to-end deployment perf (VERDICT r3 item 8).

The learned-downscale deployment flow (reference eval_ofa_net_sr.py:218-251:
materialize the chosen subnet, feed full frames): an OFAMobileNetX4
ks7/e6/d2/pd2 subnet in autoencoder mode consumes a 1080p HR frame
(1088x1920 — 1080 rounded to the pd=2 unshuffle grid), encodes it 4x down
through pixel-unshuffles + encoder trunk, and decodes it back to 1080p.
fold_tail folds BOTH tails (encoder convs through the unshuffle, output conv
through the last shuffle — models/materialize.py).

Reports the device-side frame latency (slope-timed, relay-immune:
ofa_sr_tpu.search.latency.measure_latency_device) for the whole frame and
for the overlap-tiled path (train/tiled_infer.py) that serves frames larger
than a single program's footprint. The r2 finding stands: fetching the HR
OUTPUT through the relay is transfer-bound (~90 MB/frame); the number that
matters for serving is the on-device rate, which is what slope timing
measures (the per-frame fetch is the c0 the slope cancels).

Run: python exp/perf_x4_1080p.py [--out FILE.json]
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
    ap.add_argument("--hw", type=int, nargs=2, default=(1088, 1920),
                    help="HR frame size (multiples of 4 for pd=2)")
    ap.add_argument("--min_health", type=float, default=150.0,
                    help="refuse to measure below this probed TF/s on the "
                         "RTT-immune slope scale (healthy ~188; 0 disables "
                         "the gate)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import probed_matmul_tflops_slope, require_healthy_chip
    from ofa_sr_tpu.models import OFAMobileNetX4, SearchSpace
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.materialize import get_active_subnet
    from ofa_sr_tpu.search.latency import measure_latency_device

    # refuse degraded windows (VERDICT r4 weak #2: the r4 1080p number was
    # measured at 56 TF/s); exits 3 + records the refusal in --out
    health0 = require_healthy_chip(jax, jnp, min_tflops=a.min_health,
                                   out=a.out)
    print("health: %.1f TF/s" % health0, flush=True)

    space = SearchSpace()
    net = OFAMobileNetX4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    cfg = uniform_subnet(space, 7, 6, 2, 2, n_trunks=2)
    h, w = a.hw
    x = jnp.asarray(np.random.RandomState(1).rand(1, h, w, 3), jnp.float32)

    report = {"envelope": "X4 autoencoder ks7/e6/d2/pd2, %dx%d HR frame, "
                          "bs=1, fold_tail(enc+dec), slope-timed device "
                          "latency" % (h, w),
              "health_tflops": round(health0, 1)}

    for dtype in ("bf16", "f32"):
        sub = get_active_subnet(net, params, state, cfg, mode="autoencoder")
        xin = x
        if dtype == "bf16":
            sub.params = jax.tree.map(
                lambda t: (t.astype(jnp.bfloat16)
                           if hasattr(t, "astype") else t), sub.params)
            fn = lambda v: sub(v).astype(jnp.float32)  # noqa: E731
            xin = x.astype(jnp.bfloat16)
        else:
            fn = sub
        t0 = time.time()
        ms = measure_latency_device(fn, xin, n_small=4, n_big=12)
        report[dtype] = {"frame_ms_best": round(ms, 3),
                         "frames_per_sec": round(1000 / ms, 2),
                         "wall_s": round(time.time() - t0, 1)}
        print(dtype, report[dtype], flush=True)

    # tiled path (how a frame larger than one program's footprint serves):
    # same subnet driven through overlap tiles; per-tile latency x tile
    # count = the serving rate of the tiled pipeline
    from ofa_sr_tpu.train.tiled_infer import (
        receptive_field_radius_autoencoder)
    halo = receptive_field_radius_autoencoder(cfg, space)
    tile = 272  # 1088/4 : four row-bands
    sub = get_active_subnet(net, params, state, cfg, mode="autoencoder")
    sub.params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16) if hasattr(t, "astype") else t,
        sub.params)
    xt = x[:, :tile + 2 * halo].astype(jnp.bfloat16)
    ms_tile = measure_latency_device(
        lambda v: sub(v).astype(jnp.float32), xt, n_small=4, n_big=12)
    n_tiles = -(-h // tile)
    report["tiled_bf16"] = {
        "tile_rows": tile, "halo": halo, "n_tiles": n_tiles,
        "tile_ms_best": round(ms_tile, 3),
        "frame_ms_est": round(ms_tile * n_tiles, 3),
        "frames_per_sec_est": round(1000 / (ms_tile * n_tiles), 2),
    }
    print("tiled_bf16:", report["tiled_bf16"], flush=True)

    # same RTT-immune slope scale as the opening gate (don't mix scales)
    report["health_tflops_after"] = round(
        probed_matmul_tflops_slope(jax, jnp), 1)
    print(json.dumps(report, indent=2))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
