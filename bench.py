"""Benchmark: supernet training throughput on one TPU chip.

Measures the reference training envelope (BASELINE.md: supernet progressive
shrinking on DIV2K — batch 16, 96px HR patches, Adam, one sampled subnet per
step with the deterministic seed contract) as images/sec/chip through the
single compiled masked-execution train step.

vs_baseline is the fraction of the speed-of-light throughput implied by the
analytic conv FLOPs of the *max* subnet (what masked execution executes) and
the chip's peak matmul rate — i.e. an MFU-style number; 1.0 would mean the
convs run at peak MXU utilization with zero overhead.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


# v5e peak: ~197 TFLOP/s bf16, ~98.5 TFLOP/s fp32.
PEAK_FLOPS = {"bf16": 197e12, "f32": 98.5e12}


def conv_flops(h, w, cin, cout, k, groups=1):
    return 2 * h * w * (cin // groups) * cout * k * k


def s4_max_step_flops(hr=96, pixel_d=2, width=64, max_mid=384, d=4, k=5,
                      n_stages=4, dw_k=7):
    """Analytic MACs*2 of one fwd at max config (masked execution cost);
    train step ~= 3x fwd (fwd + 2x bwd)."""
    lr_hw = hr // (2 ** pixel_d)
    f = conv_flops(lr_hw, lr_hw, 3, width, k)                 # first conv
    per_block = (conv_flops(lr_hw, lr_hw, width, max_mid, 1)
                 + conv_flops(lr_hw, lr_hw, max_mid, max_mid, dw_k, groups=max_mid)
                 + conv_flops(lr_hw, lr_hw, max_mid, width, 1))
    f += n_stages * d * per_block
    f += 2 * conv_flops(lr_hw, lr_hw, width, width, k)        # final convs
    hw = lr_hw
    for _ in range(pixel_d):                                   # shuffle head
        f += conv_flops(hw, hw, width, 4 * width, k)
        hw *= 2
    f += conv_flops(hw, hw, width, 3, k)                       # output conv
    return 3 * f  # fwd + bwd


def main():
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet, subnet_seed
    from ofa_sr_tpu.train import SRTrainer

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5)
    opt_state = trainer.init_opt_state(params)
    step = trainer.make_train_step(n_subnets=1, donate=False)

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
    archs = [(c.to_device(space),) for c in cfgs]

    # warmup / compile
    for i in range(3):
        params, state, opt_state, m = step(
            params, state, opt_state, batch, archs[i % 8], jnp.asarray(1e-4))
    jax.block_until_ready(m["loss"])

    # windowed timing (the chip is behind a network relay; take the best
    # window to suppress relay jitter)
    window, n_windows = 16, 4
    best_dt = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for i in range(window):
            params, state, opt_state, m = step(
                params, state, opt_state, batch, archs[i % 8],
                jnp.asarray(1e-4))
        jax.block_until_ready(m["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt, n_steps = best_dt, window

    imgs_per_sec = bs * n_steps / dt
    # masked execution pays max kernel/expand inside each *executed* block;
    # elastic depth compiles to lax.switch, so gated-out blocks truly skip.
    # Executed FLOPs per sampled arch = closed form at (k=7, e=6, sampled d,
    # sampled pixel_d); train step ~= 3x forward.
    from ofa_sr_tpu.models.arch import SubnetConfig
    from ofa_sr_tpu.search.flops import s4_subnet_flops
    exec_macs = []
    for cfg in cfgs:
        full = SubnetConfig(ks=tuple([7] * len(cfg.ks)),
                            e=tuple([6] * len(cfg.e)), d=cfg.d,
                            pixel_d=cfg.pixel_d)
        exec_macs.append(s4_subnet_flops(full, space, hr_size=hr))
    flops_step = bs * 3 * 2 * float(np.mean(exec_macs))  # 3x fwd, 2 flops/MAC
    achieved = flops_step * n_steps / dt
    # default TPU conv precision is bf16 multiply / f32 accumulate -> the
    # speed-of-light denominator is the bf16 MXU peak
    sol_imgs_per_sec = PEAK_FLOPS["bf16"] / (flops_step / bs)

    print(json.dumps({
        "metric": "supernet_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / sol_imgs_per_sec, 4),
        "detail": {
            "envelope": "bs16 96px DIV2K supernet step, 1 subnet/step",
            "step_ms": round(1000 * dt / n_steps, 3),
            "achieved_tflops": round(achieved / 1e12, 2),
            "speed_of_light_imgs_per_sec": round(sol_imgs_per_sec, 1),
            "vs_baseline_meaning": "fraction of bf16 MXU speed-of-light for "
                                   "the executed (sampled-subnet) conv FLOPs",
        },
    }))


if __name__ == "__main__":
    main()
