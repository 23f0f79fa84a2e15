"""Classification supernet training throughput on one TPU chip (VERDICT r3
item 7: the cls trainer — mesh, scan, KD — never produced a HW number).

Envelope: the reference progressive-shrinking classification workload
(train_ofa_net.py:100-114 trains OFAMobileNetV3 at base batch 64/GPU with
dynamic_batch_size sampled subnets and KD): here bs=32 @ 224px on the one
v5e chip, two cells —
  - n_subnets=1, no KD (the kernel-phase step)
  - n_subnets=2 + KD teacher forward (the depth/expand-phase step)
both bf16 compute + remat + dw_switch (the SR-side production flags; the
SE blocks fall back to dw-only branching), device-side lax.scan of n_inner
steps per dispatch, slope-timed, value-fetch terminated (the relay
methodology — see bench.py).

Run: python exp/perf_cls_bench.py [--out FILE.json]
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


def run_cell(jax, jnp, net, trainer, bs, res, n_subnets, n_inner, space_seed,
             teacher_kw=None):
    from ofa_sr_tpu.search.flops import cls_subnet_flops

    params, state = net.init(jax.random.PRNGKey(0))
    opt_state = trainer.init_opt_state(params)
    step = trainer.make_scan_train_step(n_subnets=n_subnets, donate=False,
                                        **(teacher_kw or {}))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(bs, res, res, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 1000, (bs,)), jnp.int32),
    }
    batches = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_inner,) + a.shape), batch)
    cfgs = [net.sample_arch(seed=space_seed + i) for i in range(8)]
    archs = tuple(
        jax.tree.map(lambda *xs: jnp.stack([xs[(i * n_subnets + k) % 8]
                                            for i in range(n_inner)]),
                     *[net.arch_to_device(c) for c in cfgs])
        for k in range(n_subnets))
    lrs = jnp.full((n_inner,), 1e-2, jnp.float32)
    rngs = jax.random.split(jax.random.PRNGKey(1), n_inner)

    p, s, o = params, state, opt_state
    t0 = time.time()
    p, s, o, m = step(p, s, o, batches, archs, lrs, rngs)
    warm = float(np.asarray(m["loss"]))
    compile_s = time.time() - t0

    def window(k):
        nonlocal p, s, o
        t0 = time.perf_counter()
        for _ in range(k):
            p, s, o, m = step(p, s, o, batches, archs, lrs, rngs)
        _ = float(np.asarray(jnp.sum(jax.tree.leaves(p)[0])))
        _ = float(np.asarray(m["loss"]))
        return (time.perf_counter() - t0) * 1000

    slopes, walls = [], []
    for _ in range(3):
        t_small = window(1)
        t_big = window(3)
        slopes.append((t_big - t_small) / (2 * n_inner))
        walls.append(t_big / (3 * n_inner))
    # a slope far below the scan-amortized wall is RTT variance, not the
    # chip (see select_slope_vs_wall; an r5 run published a 5.2 ms "step"
    # next to 24.8 ms walls before this guard)
    from ofa_sr_tpu.search.latency import select_slope_vs_wall
    best, _, _ = select_slope_vs_wall(slopes, walls)
    walls.sort()
    # executed FLOPs: mean over the sampled archs (masked execution pays
    # max ks/e inside executed blocks; depth switches skip; dw_switch slices
    # the dw to the sampled shape — use the sampled-arch account as the
    # optimistic bound, like bench.py)
    macs = float(np.mean([cls_subnet_flops(net, c, image_size=res)
                          for c in cfgs]))
    flops_step = bs * 3 * 2 * macs * n_subnets
    return {
        "step_ms_best": round(best, 3),
        "imgs_per_sec": round(bs / (best / 1000), 2),
        "achieved_tflops": round(flops_step / (best / 1000) / 1e12, 2),
        "warm_loss": round(warm, 4),
        "compile_s": round(compile_s, 1),
        "window_walls_ms": [round(w, 3) for w in walls],
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--n_inner", type=int, default=8)
    ap.add_argument("--min_health", type=float, default=150.0,
                    help="refuse to measure below this probed TF/s on the "
                         "RTT-immune slope scale (healthy ~188; 0 disables "
                         "the gate)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import probed_matmul_tflops_slope, require_healthy_chip
    from ofa_sr_tpu.models.ofa_cls import OFAMobileNetV3
    from ofa_sr_tpu.train.cls_trainer import ClsTrainer

    # refuse degraded windows (VERDICT r4 weak #2: the r4 cls number was
    # measured at 57 TF/s and understates by ~1.7x); exits 3 + records the
    # refusal in --out so a healthy-window retry is auditable
    health0 = require_healthy_chip(jax, jnp, min_tflops=a.min_health,
                                   out=a.out)
    print("health: %.1f TF/s" % health0, flush=True)

    net = OFAMobileNetV3()
    report = {"envelope": "OFAMobileNetV3 supernet, bs=%d %dpx, bf16 + "
                          "remat + dw_switch, scan %d steps/dispatch, "
                          "slope-timed" % (a.bs, a.res, a.n_inner),
              "health_tflops": round(health0, 1)}

    trainer = ClsTrainer(net, opt_type="sgd", weight_decay=3e-5,
                         label_smoothing=0.1, compute_dtype=jnp.bfloat16,
                         remat=True, dw_switch=True)
    report["n1_nokd"] = run_cell(jax, jnp, net, trainer, a.bs, a.res,
                                 1, a.n_inner, 0)
    print("n1_nokd:", report["n1_nokd"], flush=True)

    # KD cell: teacher = the max subnet of a second (static-max) MBV3 —
    # the reference uses its trained full net as teacher
    # (progressive_shrinking_original.py:137-146); for throughput the
    # weights don't matter, the forward cost does
    t_net = OFAMobileNetV3(ks_list=(7,), expand_list=(6,), depth_list=(4,))
    t_params, t_state = t_net.init(jax.random.PRNGKey(9))
    t_arch = t_net.arch_to_device(t_net.sample_arch(seed=0))
    tr_kd = ClsTrainer(net, opt_type="sgd", weight_decay=3e-5,
                       label_smoothing=0.1, kd_ratio=1.0, kd_type="ce",
                       teacher_net=t_net, compute_dtype=jnp.bfloat16,
                       remat=True, dw_switch=True)
    report["n2_kd"] = run_cell(
        jax, jnp, net, tr_kd, a.bs, a.res, 2, a.n_inner, 100,
        teacher_kw=dict(teacher_params=t_params, teacher_state=t_state,
                        teacher_arch=t_arch))
    print("n2_kd:", report["n2_kd"], flush=True)

    # same RTT-immune slope scale as the opening gate — the r5 first cut
    # mixed scales here (196.8 slope before vs 52.6 single-window after),
    # which read as a mid-bench collapse that never happened
    report["health_tflops_after"] = round(
        probed_matmul_tflops_slope(jax, jnp), 1)
    print(json.dumps(report, indent=2))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
