"""Account for every millisecond of the bench train step (VERDICT r3 item 1).

Runs the exact bench envelope (bs16 96px, 1 subnet/step, remat per flag)
for one scan dispatch under jax.profiler.trace, parses the device timeline
(the round-2 recipe that works through the relay: *.trace.json.gz
traceEvents, pid = the TPU device row, thread 'XLA Ops', drop
while/cond/call containers — leaf sum ~= wall), and prints:
  - the top-N ops by total device time,
  - a category rollup (conv fusions / BN-stat reductions / elementwise /
    copies / other),
  - leaf-sum vs value-fetch wall time, so the dispatch/gap overhead is
    explicit.

Usage (real chip; run exp/relay_probe.py first):
  python exp/perf_trace_account.py [--remat all_save_bn] [--dtype f32]
                                   [--inner 8] [--top 25]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np


def build_step(dtype, remat, n_inner, dw_switch=False, dw_opts=None):
    import jax
    import jax.numpy as jnp

    from ofa_sr_tpu.models import (OFAMobileNetS4, SearchSpace, sample_subnet,
                                   subnet_seed)
    from ofa_sr_tpu.train import SRTrainer

    space = SearchSpace()
    net = OFAMobileNetS4(space)
    params, state = net.init(jax.random.PRNGKey(0))
    trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5,
                        remat=remat, dw_switch=dw_switch, dw_opts=dw_opts,
                        compute_dtype=jnp.bfloat16 if dtype == "bf16" else None)
    opt_state = trainer.init_opt_state(params)

    bs, hr = 16, 96
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(bs, hr, hr, 3), jnp.float32),
        "x2": jnp.asarray(rng.rand(bs, hr // 2, hr // 2, 3), jnp.float32),
        "x4": jnp.asarray(rng.rand(bs, hr // 4, hr // 4, 3), jnp.float32),
    }
    cfgs = [sample_subnet(space, seed=subnet_seed(0, 50, i, 0))
            for i in range(8)]
    if dw_opts and dw_opts.get("live"):
        # a live-narrowed step only compiles branches for the live lists —
        # clamp sampled archs into them (the race scripts sample compatible
        # archs the same way)
        import dataclasses
        live_ks, live_e = dw_opts["live"]
        clamp = lambda v, allowed: (v if allowed is None or v in allowed
                                    else min(allowed, key=lambda a_: abs(a_ - v)))
        cfgs = [dataclasses.replace(
                    c, ks=tuple(clamp(k, live_ks) for k in c.ks),
                    e=tuple(clamp(e, live_e) for e in c.e)) for c in cfgs]
    scan_step = trainer.make_scan_train_step(n_subnets=1, donate=False)
    batches = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_inner,) + a.shape), batch)
    stacked = (jax.tree.map(
        lambda *xs: jnp.stack([xs[i % 8] for i in range(n_inner)]),
        *[c.to_device(space) for c in cfgs]),)
    lrs = jnp.full((n_inner,), 1e-4, jnp.float32)

    def dispatch(p, s, o):
        return scan_step(p, s, o, batches, stacked, lrs)

    return dispatch, (params, state, opt_state)


def _shapes(long_name):
    import re
    return [tuple(int(x) for x in s.split(","))
            for s in re.findall(r"(?:bf16|f32|s32)\[([\d,]+)\]", long_name)]


def _conv_class(long_name):
    """Classify a convolution fusion by its kernel-shaped operand.

    The trace's `long_name` is the HLO instruction text: output shape on
    the left of '=', operand shapes in the arg list. The kernel operand
    is the 4-D (kh, kw, cin, cout) one with kh==kw<=7; an output shaped
    like a kernel marks a weight-grad conv. (Depthwise shows up as
    kernel (k,k,1,C) fwd / (k,k,C,1) dgrad.)"""
    ss = _shapes(long_name)
    if not ss:
        return "conv ?"
    out, opnds = ss[0], ss[1:]
    if len(out) == 4 and out[0] <= 7 and out[1] <= 7 and out[0] == out[1]:
        dw = " dw" if 1 in (out[2], out[3]) else ""
        return "wgrad%s %s" % (dw, "x".join(map(str, out)))
    kshape = next((s for s in opnds
                   if len(s) == 4 and s[0] <= 7 and s[1] <= 7
                   and s[0] == s[1]), None)
    if kshape is None:
        return "conv ? out=%s" % (out,)
    dw = " dw" if 1 in (kshape[2], kshape[3]) else ""
    act = next((s for s in opnds if s != kshape and len(s) == 4), None)
    return "fwd/dgrad%s k=%s act=%s" % (
        dw, "x".join(map(str, kshape)),
        "x".join(map(str, act)) if act else "?")


def parse_trace(trace_dir, top_n=25):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise RuntimeError("no trace file under %s" % trace_dir)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # pid of the TPU device row, tid of its 'XLA Ops' thread
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name" and "args" in e}
    dev_pids = [p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n]
    rows = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Ops" not in tname:
            continue
        name = e.get("name", "")
        # containers double-count their leaves ('conditional' included —
        # missing it inflated the first r3 rollup by 42%)
        if name.split(".")[0] in ("while", "cond", "call", "body",
                                  "condition", "conditional"):
            continue
        a = e.get("args", {})
        rows.append((name, e.get("ts", 0.0), e.get("dur", 0),
                     a.get("hlo_category", "?"), a.get("long_name", ""),
                     float(a.get("model_flops", 0) or 0),
                     float(a.get("bytes_accessed", 0) or 0)))
    if not rows:
        raise RuntimeError("no XLA Ops leaf events found")

    # device busy = interval union; idle = span - busy (the honest
    # "is there a scheduling gap" number)
    iv = sorted((ts, ts + d) for _, ts, d, _, _, _, _ in rows)
    busy, (cs, ce) = 0.0, iv[0]
    for s, e2 in iv[1:]:
        if s > ce:
            busy += ce - cs
            cs, ce = s, e2
        else:
            ce = max(ce, e2)
    busy += ce - cs
    span = max(e2 for _, e2 in iv) - iv[0][0]

    # rollup: hlo_category, with convolution fusions split by kernel class
    cats = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # us, n, flops, bytes
    for name, ts, d, cat, ln, fl, by in rows:
        key = _conv_class(ln) if cat == "convolution fusion" else cat
        c = cats[key]
        c[0] += d
        c[1] += 1
        c[2] += fl
        c[3] += by

    total = defaultdict(lambda: [0, 0])
    for name, ts, d, cat, ln, fl, by in rows:
        total[name][0] += d
        total[name][1] += 1
    ops = sorted(total.items(), key=lambda kv: -kv[1][0])
    return ops[:top_n], dict(cats), busy, span


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="all_save_bn")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dw_switch", nargs="?", const="dw", default="off",
                    choices=["off", "dw", "project"],
                    help="bare flag or 'dw' = dw-only branching; "
                         "'project' = branch dw+BN+act+project (dwp) — "
                         "same form as the main CLIs (cli/common.py)")
    ap.add_argument("--trace_dir", default="/tmp/ofa_trace")
    ap.add_argument("--dw_align", type=int, default=0,
                    help="lane-tile width alignment for the dw branch set "
                         "(the adopted bench config is 128; 0 = off)")
    ap.add_argument("--dw_live_e", type=str, default="",
                    help="comma list, e.g. '4,6': narrow the dw branch "
                         "grid to these expand ratios (what a shrink "
                         "stage's step compiles via set_constraint)")
    a = ap.parse_args()
    remat = a.remat if a.remat in ("pair", "all", "all_save_bn") else \
        (a.remat == "True")

    dw_opts = {}
    if a.dw_align:
        dw_opts["align"] = a.dw_align
    if a.dw_live_e:
        dw_opts["live"] = (None, tuple(int(x)
                                       for x in a.dw_live_e.split(",")))
    dws = {"off": False, "dw": True, "project": "project"}[a.dw_switch]
    dispatch, (p, s, o) = build_step(a.dtype, remat, a.inner,
                                     dw_switch=dws, dw_opts=dw_opts or None)
    p, s, o, m = dispatch(p, s, o)  # compile + warm
    _ = float(np.asarray(m["loss"]))

    # honest wall per step (value-fetch, one dispatch)
    t0 = time.perf_counter()
    p, s, o, m = dispatch(p, s, o)
    _ = float(np.asarray(m["loss"]))
    wall_ms = (time.perf_counter() - t0) * 1000 / a.inner

    os.makedirs(a.trace_dir, exist_ok=True)
    with jax.profiler.trace(a.trace_dir):
        p, s, o, m = dispatch(p, s, o)
        _ = float(np.asarray(m["loss"]))

    ops, cats, busy, span = parse_trace(a.trace_dir, a.top)
    n = a.inner
    print(json.dumps({
        "config": {"dtype": a.dtype, "remat": a.remat, "inner": n},
        "wall_ms_per_step (value-fetch, incl. +RTT/n)": round(wall_ms, 3),
        "device_busy_ms_per_step": round(busy / 1e3 / n, 3),
        "device_span_ms_per_step": round(span / 1e3 / n, 3),
        "device_idle_ms_per_step": round((span - busy) / 1e3 / n, 3),
        "categories": {
            k: {"ms_per_step": round(v[0] / 1e3 / n, 3),
                "count_per_step": round(v[1] / n, 1),
                "tflops": round(v[2] / (v[0] / 1e6) / 1e12, 2) if v[0] else 0,
                "GBps": round(v[3] / (v[0] / 1e6) / 1e9, 1) if v[0] else 0}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1][0])
            if v[0] / 1e3 / n >= 0.02},
        "top_ops": [{"op": nm[:90],
                     "ms_per_step": round(d / 1e3 / n, 3),
                     "count": c} for nm, (d, c) in ops],
    }, indent=2))


if __name__ == "__main__":
    main()
