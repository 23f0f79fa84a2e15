"""Full train-step timing ladder across precision x remat configurations.

Runs the bench envelope (bs16, 96px HR, 1 subnet/step, scan of 8 inner steps)
for each variant and prints ms/step, value-fetch terminated. OOM/compile
failures are recorded, not fatal. Probe relay health first
(exp/relay_probe.py) — numbers from a degraded session are meaningless.

Usage: python exp/perf_step_variants.py [variant ...]
  variants: f32-rematTrue f32-rematpair f32-rematall f32-rematFalse
            bf16-rematTrue bf16-rematpair bf16-rematall bf16-rematFalse
            (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import json
import sys
import time

import numpy as np

VARIANTS = {
    "f32-rematTrue": (None, True),
    "f32-rematpair": (None, "pair"),
    "f32-rematall": (None, "all"),
    "f32-rematFalse": (None, False),
    "bf16-rematTrue": ("bf16", True),
    "bf16-rematpair": ("bf16", "pair"),
    "bf16-rematall": ("bf16", "all"),
    "bf16-rematFalse": ("bf16", False),
    "f32-rematallbn": ("f32", "all_save_bn"),
    "bf16-rematallbn": ("bf16", "all_save_bn"),
    # ks_switch: sampled ks executes only its own k x k depthwise taps
    "f32-rematall-ks": ("f32", "all", True),
    "bf16-rematall-ks": ("bf16", "all", True),
    # s2d: trunk in space-to-depth layout (ops/s2d.py)
    "f32-rematallbn-s2d": ("f32", "all_save_bn", False, True),
    "bf16-rematallbn-s2d": ("bf16", "all_save_bn", False, True),
    "bf16-rematall-s2d": ("bf16", "all", False, True),
    # dw_switch: depthwise branched over (ks x mid width) — the sampled
    # subnet's dw runs only its own taps and channels (models/layers.py)
    "f32-rematallbn-dws": ("f32", "all_save_bn", False, False, True),
    "bf16-rematallbn-dws": ("bf16", "all_save_bn", False, False, True),
    "bf16-rematallbn-ks": ("bf16", "all_save_bn", True),
    # remat ladder under dw_switch: with the dw stack sliced to the sampled
    # (ks x width), the remat recompute mix changes — the r3 trace put
    # dw fwd *recompute* at ~3 ms/step of the 26 ms bf16-allbn step, so
    # remat=False (no recompute at all; activations are small at bs16/96px)
    # may now beat all_save_bn
    "bf16-rematFalse-dws": ("bf16", False, False, False, True),
    "bf16-rematpair-dws": ("bf16", "pair", False, False, True),
    "bf16-rematall-dws": ("bf16", "all", False, False, True),
    # dwp: dw_switch="project" — the switch branch also swallows dw-BN,
    # act, and the project 1x1, so the seam materializes 64-ch buffers
    # instead of 384-ch and the project contracts only the mk prefix
    "bf16-rematallbn-dwp": ("bf16", "all_save_bn", False, False, "project"),
    "f32-rematallbn-dwp": ("f32", "all_save_bn", False, False, "project"),
}


def main():
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import (OFAMobileNetS4, SearchSpace, sample_subnet,
                                   subnet_seed)
    from ofa_sr_tpu.train import SRTrainer

    names = sys.argv[1:] or list(VARIANTS)
    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))

    bs, hr = 16, 96
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(bs, hr, hr, 3), jnp.float32),
        "x2": jnp.asarray(rng.rand(bs, hr // 2, hr // 2, 3), jnp.float32),
        "x4": jnp.asarray(rng.rand(bs, hr // 4, hr // 4, 3), jnp.float32),
    }
    cfgs = [sample_subnet(space, seed=subnet_seed(0, 50, i, 0))
            for i in range(8)]
    # equal-n walls carry +RTT/n_inner per step on both sides of an A/B —
    # the bias cancels in the difference, but on a slow-relay session
    # (RTT ~200 ms) raise n_inner so RTT *jitter* stays small vs the signal
    n_inner = int(os.environ.get("OFA_N_INNER", "8"))
    batches = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_inner,) + a.shape), batch)
    stacked = (jax.tree.map(
        lambda *xs: jnp.stack([xs[i % 8] for i in range(n_inner)]),
        *[c.to_device(space) for c in cfgs]),)
    lrs = jnp.full((n_inner,), 1e-4, jnp.float32)

    out = {}
    for name in names:
        cd, remat, *rest = VARIANTS[name]
        dtype = jnp.bfloat16 if cd == "bf16" else None
        trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5,
                            compute_dtype=dtype, remat=remat,
                            ks_switch=bool(rest and rest[0]),
                            s2d=bool(len(rest) > 1 and rest[1]),
                            dw_switch=(rest[2] if len(rest) > 2 else False))
        opt_state = trainer.init_opt_state(params)
        step = trainer.make_scan_train_step(n_subnets=1, donate=False)
        try:
            t0 = time.perf_counter()
            p, s, o, m = step(params, state, opt_state, batches, stacked, lrs)
            warm = float(np.asarray(m["loss"]))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                p, s, o, m = step(p, s, o, batches, stacked, lrs)
                _ = float(np.asarray(m["loss"]))
                _ = float(np.asarray(jnp.sum(jax.tree.leaves(p)[0])))
                best = min(best, (time.perf_counter() - t0) / n_inner)
            out[name] = {"step_ms": round(best * 1000, 3),
                         "compile_s": round(compile_s, 1),
                         "loss": round(warm, 5)}
        except Exception as e:
            out[name] = f"ERR {type(e).__name__}: {e}"[:200]
        print(name, "->", out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
