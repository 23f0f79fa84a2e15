"""Hardware validation + benchmark of the Pallas kernels vs their XLA
compositions. Run on the real chip (probe health first: exp/relay_probe.py).

For each kernel: correctness vs the XLA reference at deployment shapes, then
value-fetch-terminated timing of both. Prints one JSON line. If a kernel
faults the device, run each separately (env PALLAS_ONLY=mbconv|tail) so one
fault doesn't block the other's numbers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import json
import os
import time

import numpy as np

os.environ["OFA_SR_TPU_PALLAS"] = "1"


def timed(fn, *args, n=20, reps=3):
    import jax.numpy as jnp
    y = fn(*args)
    _ = float(np.asarray(jnp.sum(y.astype(jnp.float32))))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(*args)
        _ = float(np.asarray(jnp.sum(y.astype(jnp.float32))))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e6


def main():
    import jax
    import jax.numpy as jnp

    only = os.environ.get("PALLAS_ONLY", "")
    out = {}
    rng = np.random.RandomState(0)

    if only in ("", "mbconv"):
        from ofa_sr_tpu.ops.pallas.mbconv import (fused_mbconv_infer,
                                                  mbconv_reference)
        # deployment shape: 720p pd2 subnet block (LR 320x184), e6 mid=384
        c, m, ks = 64, 384, 7
        x = jnp.asarray(rng.rand(1, 184, 320, c), jnp.float32)
        w = dict(
            ib_w=jnp.asarray(rng.randn(c, m) * 0.1, jnp.float32),
            ib_b=jnp.asarray(rng.randn(m) * 0.1, jnp.float32),
            dw_w=jnp.asarray(rng.randn(ks, ks, m) * 0.1, jnp.float32),
            dw_b=jnp.asarray(rng.randn(m) * 0.1, jnp.float32),
            pl_w=jnp.asarray(rng.randn(m, c) * 0.1, jnp.float32),
            pl_b=jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
        )
        args = (x, w["ib_w"], w["ib_b"], w["dw_w"], w["dw_b"], w["pl_w"],
                w["pl_b"])
        ref_fn = jax.jit(lambda *a: mbconv_reference(*a))
        try:
            got = fused_mbconv_infer(*args)
            ref = ref_fn(*args)
            err = float(jnp.max(jnp.abs(got - ref)))
            out["mbconv"] = {
                "max_abs_err": err,
                "pallas_us": round(timed(fused_mbconv_infer, *args), 1),
                "xla_us": round(timed(ref_fn, *args), 1),
            }
        except Exception as e:
            out["mbconv"] = f"ERR {type(e).__name__}: {e}"[:200]
        print("mbconv ->", out["mbconv"], flush=True)

    if only in ("", "tail"):
        from ofa_sr_tpu.ops.pallas.shuffle_tail import (fused_shuffle_tail,
                                                        shuffle_tail_reference)
        x = jnp.asarray(rng.rand(1, 184, 320, 64), jnp.float32)
        w = jnp.asarray(rng.randn(5, 5, 64, 256) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(256) * 0.1, jnp.float32)
        ref_fn = jax.jit(lambda xx, ww, bb: shuffle_tail_reference(xx, ww, bb))
        try:
            got = fused_shuffle_tail(x, w, b)
            ref = ref_fn(x, w, b)
            err = float(jnp.max(jnp.abs(got - ref)))
            out["shuffle_tail"] = {
                "max_abs_err": err,
                "pallas_us": round(timed(fused_shuffle_tail, x, w, b), 1),
                "xla_us": round(timed(ref_fn, x, w, b), 1),
            }
        except Exception as e:
            out["shuffle_tail"] = f"ERR {type(e).__name__}: {e}"[:200]
        print("shuffle_tail ->", out["shuffle_tail"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
