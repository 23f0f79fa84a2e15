"""Benchmark: supernet training throughput on one TPU chip.

Measures the reference training envelope (BASELINE.md: supernet progressive
shrinking on DIV2K — batch 16, 96px HR patches, Adam, one sampled subnet per
step with the deterministic seed contract) as images/sec/chip.

The chip sits behind a network relay whose dispatch latency and throughput
vary wildly between sessions (round-2 finding: block_until_ready can return
before execution completes, so readiness-based windows can overstate
throughput by an order of magnitude). This bench therefore:
- steps through the device-side multi-step path (lax.scan over n_inner
  optimizer steps — one dispatch amortized over many steps, the production
  configuration), threading params/state between calls;
- times by *value fetch*: the clock stops only when a scalar depending on
  the final parameter chain has actually arrived on the host;
- reports best and median over several windows plus a dispatch-RTT probe so
  round-over-round numbers carry their relay conditions with them.

vs_baseline is the fraction of the speed-of-light throughput implied by the
analytic conv FLOPs of the executed (masked max-ks/max-e, sampled d/pixel_d)
subnet and the chip's bf16 MXU peak — an MFU-style number.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np


# v5e peak: ~197 TFLOP/s bf16, ~98.5 TFLOP/s fp32.
PEAK_FLOPS = {"bf16": 197e12, "f32": 98.5e12}


def dispatch_rtt_ms(jax, jnp, n=10):
    """Per-call dispatch round-trip of a trivial program (relay probe)."""
    x = jnp.zeros((16,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    y = f(x)
    _ = float(np.asarray(jnp.sum(y)))
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(y)
    _ = float(np.asarray(jnp.sum(y)))
    return (time.perf_counter() - t0) / n * 1000


def probed_matmul_tflops(jax, jnp, n=50):
    """Measured bf16 MXU throughput right now (device-health probe): n
    chained 4096^3 matmuls inside ONE dispatch (lax.scan), value-fetch
    terminated. One dispatch matters: per-call chaining measures the
    relay's dispatch RTT, not the chip — a session once probed 16 TF/s
    per-call while the same chip did 133 TF/s scan-amortized."""
    from jax import lax

    a = jnp.asarray(np.random.RandomState(0).rand(4096, 4096) * 1e-3,
                    jnp.bfloat16)

    @jax.jit
    def run(m):
        def body(c, _):
            return (c @ c) * 1e-3, None
        y, _ = lax.scan(body, m, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(np.asarray(run(a)))  # compile + warm
    t0 = time.perf_counter()
    _ = float(np.asarray(run(a)))
    dt = (time.perf_counter() - t0) / n
    return 2 * 4096 ** 3 / dt / 1e12


def probed_matmul_tflops_slope(jax, jnp, n_small=10, n_big=40, reps=2):
    """RTT-immune health probe: TF/s from the SLOPE between two scan
    lengths, cancelling the constant dispatch+fetch cost. The single-window
    probe (probed_matmul_tflops) carries one relay RTT inside its timed
    dispatch — at a true 110 TF/s and 30 ms RTT, an n=20 window reads
    ~54 TF/s (device work 27 ms + RTT 30 ms), misdiagnosing a slow relay
    as a degraded chip. Observed live 2026-08-19: relay_probe (n=50) read
    110.0 while the n=20 gate read 54.3 on the same chip minutes apart.
    Takes min-of-reps per window (noise only inflates)."""
    from jax import lax

    a = jnp.asarray(np.random.RandomState(0).rand(4096, 4096) * 1e-3,
                    jnp.bfloat16)

    def make(n):
        @jax.jit
        def run(m):
            def body(c, _):
                return (c @ c) * 1e-3, None
            y, _ = lax.scan(body, m, None, length=n)
            return jnp.sum(y.astype(jnp.float32))
        _ = float(np.asarray(run(a)))  # compile + warm
        return run

    run_s, run_b = make(n_small), make(n_big)
    times = {}
    for tag, run in (("s", run_s), ("b", run_b)):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(np.asarray(run(a)))
            best = min(best, time.perf_counter() - t0)
        times[tag] = best
    dt = (times["b"] - times["s"]) / (n_big - n_small)
    if dt <= 0:  # relay hiccup mid-window; fall back to the big window
        dt = times["b"] / n_big
    return 2 * 4096 ** 3 / dt / 1e12


def require_healthy_chip(jax, jnp, *, min_tflops=150.0, out=None, n=20):
    """Gate a perf measurement on chip health (VERDICT r4 weak #2: two r4
    artifacts were measured on a ~57 TF/s probed chip and published
    ~1.7x-understated numbers). Probes the MXU with the RTT-immune slope
    probe; below `min_tflops` it writes a refusal record to `out` (so
    retries that never found a healthy window leave a committed trace)
    and exits 3 for the caller to retry next session. Returns the probed
    TF/s when healthy.

    Calibration note (r5): the r2-r4 "97-112 TF/s healthy band" was
    measured with the single-window probe, which carries one relay RTT
    inside its timed dispatch. The slope probe on the same healthy chip
    reads ~188 TF/s (~95% of v5e bf16 peak, 197) — so the slope-scale
    gate is 150 (~0.8x of 188), not 80."""
    health = probed_matmul_tflops_slope(jax, jnp)
    if health >= min_tflops:
        return health
    record = {"refused": True, "health_tflops": round(health, 1),
              "min_health_tflops": min_tflops,
              "reason": "chip degraded below 0.8x of the healthy slope-"
                        "probe band (~188 TF/s RTT-immune, r5); numbers "
                        "measured now would understate the framework",
              "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(json.dumps(record), flush=True)
    if out:
        prior = []
        if os.path.exists(out):
            try:
                with open(out) as f:
                    old = json.load(f)
                prior = old.get("refusals", []) + (
                    [old] if old.get("refused") and "refusals" not in old
                    else [])
            except (OSError, ValueError):
                pass
        record["refusals"] = prior
        with open(out, "w") as f:
            json.dump(record, f, indent=2)
    raise SystemExit(3)


def main():
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet, subnet_seed
    from ofa_sr_tpu.train import SRTrainer

    # the relayed chip intermittently degrades ~25x for stretches; give it a
    # few minutes to come back before recording a number (the probe result
    # is recorded either way)
    deadline = time.time() + 300
    while True:
        health = probed_matmul_tflops_slope(jax, jnp)
        if health > 30 or time.time() > deadline:
            break
        time.sleep(60)

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    # Measured-fastest training config on HW (exp/perf_step_variants.py,
    # r3 equal-n race, same session): bf16 compute + remat='all_save_bn'
    # + dw_switch 32.7 < bf16-allbn 37.2 < f32-allbn 38.8 ms/step, losses
    # bit-identical, compiles comparable (213/245/217 s). dw_switch
    # branches the depthwise over the sampled (ks x width) — the r3 trace
    # put the max-shape dw stack at 54% of the step (DESIGN.md §7). NB
    # dw_switch is bf16-only as a default: f32+dws measured 274 ms (XLA's
    # f32 lowering of narrow depthwise convs collapses, like s2d-f32).
    # f32 master params, BN statistics, loss and PSNR stay f32
    # (train_step.py cast_params_for_compute). dw_opts align=128 rounds
    # width candidates to the lane tile: -3.5% equal-n, losses identical
    # (DW_SEAM_RACE_r04.json, DESIGN.md §7.1).
    trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5,
                        compute_dtype=jnp.bfloat16, remat="all_save_bn",
                        dw_switch=True, dw_opts={"align": 128})
    opt_state = trainer.init_opt_state(params)

    bs, hr = 16, 96
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(bs, hr, hr, 3), jnp.float32),
        "x2": jnp.asarray(rng.rand(bs, hr // 2, hr // 2, 3), jnp.float32),
        "x4": jnp.asarray(rng.rand(bs, hr // 4, hr // 4, 3), jnp.float32),
    }
    n_batch = 50  # DIV2K 800 imgs / bs 16
    cfgs = [sample_subnet(space, seed=subnet_seed(0, n_batch, i, 0))
            for i in range(8)]

    # device-side multi-step: one dispatch = n_inner optimizer steps
    n_inner = 16
    scan_step = trainer.make_scan_train_step(n_subnets=1, donate=False)
    batches = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_inner,) + a.shape), batch)
    stacked = (jax.tree.map(
        lambda *xs: jnp.stack([xs[i % 8] for i in range(n_inner)]),
        *[c.to_device(space) for c in cfgs]),)
    lrs = jnp.full((n_inner,), 1e-4, jnp.float32)

    # compile + warm
    p, s, o = params, state, opt_state
    p, s, o, m = scan_step(p, s, o, batches, stacked, lrs)
    warm_loss = float(np.asarray(m["loss"]))

    # timed windows, value-fetch terminated. A window of k chained
    # dispatches costs c0 + k*n_inner*step with c0 = dispatch RTT + fetch
    # transfer; the slope between two window sizes cancels c0 (r3
    # methodology: +RTT/n bias — an empty body "measures" RTT/n).
    def window(k):
        nonlocal p, s, o
        t0 = time.perf_counter()
        for _ in range(k):
            p, s, o, m = scan_step(p, s, o, batches, stacked, lrs)
        _ = float(np.asarray(jnp.sum(jax.tree.leaves(p)[0])))
        _ = float(np.asarray(m["loss"]))
        return (time.perf_counter() - t0) * 1000

    k_small, k_big, n_windows = 2, 6, 3
    slopes, window_ms = [], []
    for _ in range(n_windows):
        t_small = window(k_small)
        t_big = window(k_big)
        slopes.append((t_big - t_small) / ((k_big - k_small) * n_inner))
        # raw per-step wall of the big window (upper bound, incl. c0)
        window_ms.append(t_big / (k_big * n_inner))
    slopes.sort()
    window_ms.sort()
    # a chip-state shift mid-window can corrupt a slope (even negative);
    # keep only plausible slopes, else fall back to the raw (upper-bound)
    # window walls — for the median too, not just the best
    plausible = [s for s in slopes if s > 0.2 * window_ms[0]]
    best_ms = plausible[0] if plausible else window_ms[0]
    median_ms = (plausible[len(plausible) // 2] if plausible
                 else window_ms[len(window_ms) // 2])
    rtt = dispatch_rtt_ms(jax, jnp)
    # slope probe: the single-window probe carries one relay RTT inside its
    # timed dispatch and understates the chip on slow-relay sessions (54 vs
    # 110 TF/s observed on the same chip) — which would OVERSTATE
    # vs_probed_peak. r1-r4 probes were single-window.
    peak_probe = probed_matmul_tflops_slope(jax, jnp)

    # -- the real progressive-shrinking envelope (VERDICT r3 item 5): the
    # supernet phases train dynamic_batch_size=4 sampled subnets per
    # optimizer step with grad accumulation + KD against the 2x teacher
    # (reference train_ofa_net_sr_simple.py:28-93 dyn_bs 2/4;
    # progressive_shrinking.py:158-203). Same batch/step semantics as
    # above, n_subnets=4 + teacher forward inside the scan body.
    multi_detail = {}
    try:
        from ofa_sr_tpu.models.arch import uniform_subnet as _us
        t_space = SearchSpace(ks_list=[5], expand_list=[3], depth_list=[2],
                              pixel_d_list=[1])
        t_net = OFAMobileNetS4(t_space)
        t_params, t_state = t_net.init(jax.random.PRNGKey(7))
        t_cfg = _us(t_space, 5, 3, 2, 1)
        tr4 = SRTrainer(net, opt_type="adam", weight_decay=3e-5,
                        compute_dtype=jnp.bfloat16, remat="all_save_bn",
                        dw_switch=True, dw_opts={"align": 128},
                        kd_ratio=1.0, teacher_net=t_net)
        opt4 = tr4.init_opt_state(params)
        n_inner4 = 8
        step4 = tr4.make_scan_train_step(
            n_subnets=4, donate=False, teacher_params=t_params,
            teacher_state=t_state, teacher_arch=t_cfg.to_device(t_space),
            teacher_pixel_d=1)
        b4 = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_inner4,) + a.shape), batch)
        archs4 = tuple(
            jax.tree.map(
                lambda *xs: jnp.stack([xs[(i * 4 + k) % 8]
                                       for i in range(n_inner4)]),
                *[c.to_device(space) for c in cfgs])
            for k in range(4))
        lrs4 = jnp.full((n_inner4,), 1e-4, jnp.float32)
        p4, s4, o4 = params, state, opt4
        p4, s4, o4, m4 = step4(p4, s4, o4, b4, archs4, lrs4)
        warm4 = float(np.asarray(m4["loss"]))

        def window4(k):
            nonlocal p4, s4, o4
            t0 = time.perf_counter()
            for _ in range(k):
                p4, s4, o4, m = step4(p4, s4, o4, b4, archs4, lrs4)
            _ = float(np.asarray(jnp.sum(jax.tree.leaves(p4)[0])))
            _ = float(np.asarray(m["loss"]))
            return (time.perf_counter() - t0) * 1000

        s4_ms, w4_ms = [], []
        for _ in range(2):
            t_small = window4(1)
            t_big = window4(3)
            s4_ms.append((t_big - t_small) / (2 * n_inner4))
            w4_ms.append(t_big / (3 * n_inner4))
        s4_ms.sort()
        w4_ms.sort()
        ok4 = [t for t in s4_ms if t > 0.2 * w4_ms[0]]
        best4 = ok4[0] if ok4 else w4_ms[0]
        multi_detail = {
            "envelope": "bs16 96px supernet step, n_subnets=4 grad-accum + "
                        "KD teacher forward (the expand-phase workload), "
                        "bf16 + all_save_bn + dw_switch, scan %d/dispatch"
                        % n_inner4,
            "step_ms_best": round(best4, 3),
            "imgs_per_sec": round(bs / (best4 / 1000), 2),
            "warm_loss": round(warm4, 5),
        }
    except Exception as e:
        multi_detail = {"error": f"{type(e).__name__}: {e}"[:160]}

    # -- deployment half of the north star: materialized-subnet inference ----
    # Reference eval envelope (eval_ofa_net_sr.py:218-220,111,167): 720p
    # frames, bs=1, subnet ks=7 e=6 d=2 pixel_d=2 (LR = 320x180).
    # Headline = bf16, the serving/AOT-export dtype. r3 shipped a 47 ms f32
    # number here (2.6x worse than r2) with no health guard; the r4 root-
    # cause probe (exp/perf_f32_fold_probe.py) measured f32+fold_tail at
    # 7.04 ms vs 13.65 unfolded on the same session — the fold is a ~1.94x
    # win in BOTH dtypes and the r3 artifact was chip degradation mid-bench.
    # So: probe chip health before this half too, and re-measure once if the
    # f32/bf16 ratio lands outside the plausibility window (they measure
    # within ~2% of each other on a stable chip — the frame is format-bound,
    # not MXU-bound).
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.materialize import get_active_subnet

    eval_detail = {}
    try:
        deadline = time.time() + 300
        while True:
            deploy_health = probed_matmul_tflops(jax, jnp, n=20)
            if deploy_health > 30 or time.time() > deadline:
                break
            time.sleep(60)

        sub_cfg = uniform_subnet(space, 7, 6, 2, 2)
        lr_hw = (184, 320)  # 180 rounded up to sublane-friendly 184

        # ms/frame via the library's relay-immune timer (scan-chained,
        # carry-folded, slope-timed, adaptive low-signal rescue) — one
        # implementation of the methodology, not a bench-local copy
        from ofa_sr_tpu.search.latency import measure_latency_device

        def frame_ms_scan(sub_fn, x):
            return measure_latency_device(sub_fn, x, n_small=8, n_big=24)

        xf = jnp.asarray(np.random.RandomState(1).rand(1, *lr_hw, 3),
                         jnp.float32)

        def measure_pair():
            subnet = get_active_subnet(net, params, state, sub_cfg)
            f32_ms = frame_ms_scan(subnet, xf)
            # serving dtype: the same folded subnet with bf16 weights +
            # activations (output cast back to f32) — the AOT-export
            # serving configuration (VERDICT r2 item 10). params carry
            # python-int metadata leaves (ks/mid): cast arrays only.
            sub16 = get_active_subnet(net, params, state, sub_cfg)
            sub16.params = jax.tree.map(
                lambda a: (a.astype(jnp.bfloat16)
                           if hasattr(a, "astype") else a),
                sub16.params)
            bf16_ms = frame_ms_scan(
                lambda v: sub16(v).astype(jnp.float32),
                xf.astype(jnp.bfloat16))
            return f32_ms, bf16_ms

        f32_ms, bf16_ms = measure_pair()
        retried = False
        if not (0.5 < f32_ms / bf16_ms < 2.0):  # r3 failure mode: one half
            time.sleep(60)                       # hit a degraded-chip window
            f32_b, bf16_b = measure_pair()
            f32_ms, bf16_ms = min(f32_ms, f32_b), min(bf16_ms, bf16_b)
            retried = True

        from ofa_sr_tpu.search.flops import s4_subnet_flops
        e_macs = s4_subnet_flops(sub_cfg, space,
                                 hr_size=(lr_hw[0] * 4, lr_hw[1] * 4))
        e_flops = 2 * float(e_macs)
        eval_detail = {
            "envelope": "materialized ks7/e6/d2/pd2 subnet, 720p frame "
                        "(LR 320x184), bs=1, frames scan-chained in-device, "
                        "slope-timed, fold_tail (output conv folded through "
                        "the last pixel_shuffle — measured 1.94x in BOTH "
                        "dtypes, exp/perf_f32_fold_probe.py)",
            "frame_ms_best": round(bf16_ms, 3),
            "frames_per_sec": round(1000 / bf16_ms, 2),
            "serving_dtype": "bf16 (weights+activations, f32 output)",
            "vs_bf16_sol": round((e_flops / (bf16_ms / 1000))
                                 / PEAK_FLOPS["bf16"], 4),
            "deploy_health_tflops": round(deploy_health, 1),
            "plausibility_retry": retried,
            "f32": {
                "frame_ms_best": round(f32_ms, 3),
                "frames_per_sec": round(1000 / f32_ms, 2),
            },
        }
    except Exception as e:  # eval bench is auxiliary — never sink the bench
        eval_detail = dict(eval_detail)  # keep whatever finished
        eval_detail["error"] = f"{type(e).__name__}: {e}"[:160]

    imgs_per_sec = bs / (best_ms / 1000)
    # masked execution pays max kernel/expand inside each *executed* block;
    # elastic depth compiles to lax.switch, so gated-out blocks truly skip.
    # Under dw_switch the depthwise is ALSO branched to the sampled
    # (ks x width), so the executed-FLOPs account must not bill the dw at
    # max shape — that would overstate achieved TF/s.
    from ofa_sr_tpu.models.arch import SubnetConfig
    from ofa_sr_tpu.search.flops import _conv_macs, s4_subnet_flops
    exec_macs = []
    for cfg in cfgs:
        full = SubnetConfig(ks=tuple([7] * len(cfg.ks)),
                            e=tuple([6] * len(cfg.e)), d=cfg.d,
                            pixel_d=cfg.pixel_d)
        macs = s4_subnet_flops(full, space, hr_size=hr)
        lh = lw = hr // (2 ** cfg.pixel_d)
        mid_max = space.mid_channels(max(space.expand_list))
        bi = 0
        for si in range(space.n_stages):
            for i in range(space.max_depth):
                if i < cfg.d[si]:
                    macs -= _conv_macs(lh, lw, mid_max, mid_max,
                                       max(space.ks_list), groups=mid_max)
                    mid = space.mid_channels(cfg.e[bi])
                    # dw_opts align=128 rounds the executed branch width up
                    # to the lane tile (capped at the bank width) — bill the
                    # width that actually runs (_dw_mid_candidates).
                    mid = min(-(-mid // 128) * 128, mid_max)
                    macs += _conv_macs(lh, lw, mid, mid, cfg.ks[bi],
                                       groups=mid)
                bi += 1
        exec_macs.append(macs)
    flops_step = bs * 3 * 2 * float(np.mean(exec_macs))  # 3x fwd, 2 flops/MAC
    achieved = flops_step / (best_ms / 1000)
    sol_imgs_per_sec = PEAK_FLOPS["bf16"] / (flops_step / bs)

    print(json.dumps({
        "metric": "supernet_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / sol_imgs_per_sec, 4),
        "detail": {
            "envelope": "bs16 96px DIV2K supernet step, 1 subnet/step, "
                        "bf16 compute (f32 master/BN/loss), "
                        "remat=all_save_bn, dw_switch, device-side scan "
                        "of %d steps/dispatch" % n_inner,
            "step_ms_best": round(best_ms, 3),
            "step_ms_median": round(median_ms, 3),
            "window_spread_ms": [round(x, 3) for x in window_ms],
            "dispatch_rtt_ms": round(rtt, 2),
            "probed_matmul_tflops": round(peak_probe, 1),
            "vs_probed_peak": round(
                (flops_step / (best_ms / 1000)) / (peak_probe * 1e12), 4),
            "timing": "value-fetch terminated (readiness through the relay "
                      "can report early)",
            "warm_loss": round(warm_loss, 5),
            "achieved_tflops": round(achieved / 1e12, 2),
            "speed_of_light_imgs_per_sec": round(sol_imgs_per_sec, 1),
            "vs_baseline_meaning": "fraction of bf16 MXU speed-of-light for "
                                   "the executed (sampled-subnet) conv FLOPs",
            # r3's vs_probed_peak (0.1175) and r4+'s are computed under
            # DIFFERENT FLOPs denominators — the step got FASTER r3->r4
            # (23.19 -> 22.58 ms) while the ratio fell, because r4 stopped
            # billing the dw at max shape. Don't read the ratio delta across
            # that boundary as a perf regression (DESIGN.md §7.1).
            "accounting": "executed-flops-v2 (r4+): dw billed at sampled "
                          "ks x lane-aligned width, not max shape; r1-r3 "
                          "BENCH ratios use v1 and are not comparable. "
                          "r5+: probed peak is RTT-immune slope-timed "
                          "(r1-r4 single-window probes read low on "
                          "slow-relay sessions)",
            "multi_subnet_kd": multi_detail,
            "deployment": eval_detail,
        },
    }))


def main_with_retry(retries=2):
    """Run the bench in a subprocess and retry on failure.

    The relayed chip intermittently wedges (every dispatch fails
    FAILED_PRECONDITION) and only a fresh process recovers it (r2
    NOTES); since the driver runs this file exactly once per round, the
    outer process supervises: forward the child's stdout (the one JSON
    line) on success, otherwise wait and retry."""
    import os
    import subprocess
    import sys
    import time as _t

    for attempt in range(retries + 1):
        try:
            # a wedged chip can hang a dispatch rather than fail it; bound the
            # child so the retry actually fires (advisor r2)
            # the r4 bench carries three envelopes (1-subnet train,
            # 4-subnet+KD train, deployment), each with its own relay
            # compile — budget accordingly
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env={**os.environ, "OFA_BENCH_INNER": "1"},
                               capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired as e:
            sys.stderr.write("bench attempt %d timed out after %ds\n"
                             % (attempt, e.timeout))
            if attempt < retries:
                _t.sleep(90)
            continue
        json_lines = [l for l in r.stdout.splitlines()
                      if l.startswith('{"metric"')]
        if r.returncode == 0 and json_lines:
            print(json_lines[-1])
            return 0
        sys.stderr.write("bench attempt %d failed (rc=%d): %s\n"
                         % (attempt, r.returncode, r.stderr[-400:]))
        if attempt < retries:
            _t.sleep(90)
    return 1


if __name__ == "__main__":
    import os as _os
    import sys as _sys
    if _os.environ.get("OFA_BENCH_INNER"):
        main()
    else:
        _sys.exit(main_with_retry())
