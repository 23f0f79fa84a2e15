"""Latency estimation: lookup tables + on-device measurement.

Reference: LatencyTable/LatencyEstimator (tutorial/latency_table.py:7-166,
per-device YAML LUTs keyed by layer type + shapes, downloaded) and
measure_net_latency (pytorch_utils.py:135-186, warmup + timed loop). Here:
- `LatencyTable` reads the same key format from a local YAML/JSON file;
- `measure_latency` times a jitted callable on the actual device (the TPU
  replaces the reference's mobile-phone tables as the deployment target);
- `build_latency_table` measures each elastic block choice once and writes
  a table, the TPU analogue of building a per-device LUT.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Optional

import numpy as np


class LatencyTable:
    """Key format mirrors the reference query keys, e.g.
    'expanded_conv-input:56x56x24-output:56x56x24-expand:3-kernel:3-...'.
    Values are latency in ms. Backed by a plain dict loaded from JSON/YAML."""

    def __init__(self, table: Optional[dict] = None, path: Optional[str] = None):
        if table is None and path is not None:
            table = _load_table(path)
        self.table = table or {}

    @staticmethod
    def repr_shape(shape):
        if isinstance(shape, (list, tuple)):
            return "x".join(str(s) for s in shape)
        return str(shape)

    def query(self, l_type: str, input_shape, output_shape, **kwargs):
        infos = ["%s" % l_type,
                 "input:%s" % self.repr_shape(input_shape),
                 "output:%s" % self.repr_shape(output_shape)]
        for key, value in kwargs.items():
            if value is not None:
                infos.append("%s:%s" % (key, value))
        key = "-".join(infos)
        return self.table[key]

    def set(self, l_type, input_shape, output_shape, latency_ms, **kwargs):
        infos = ["%s" % l_type,
                 "input:%s" % self.repr_shape(input_shape),
                 "output:%s" % self.repr_shape(output_shape)]
        for key, value in kwargs.items():
            if value is not None:
                infos.append("%s:%s" % (key, value))
        self.table["-".join(infos)] = latency_ms

    def save(self, path):
        with open(path, "w") as f:
            json.dump(self.table, f, indent=2)


def _load_table(path):
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # minimal YAML (flat 'key: value' lines) without a yaml dependency
        table = {}
        for line in text.splitlines():
            if ":" in line and not line.strip().startswith("#"):
                k, _, v = line.rpartition(":")
                try:
                    table[k.strip()] = float(v)
                except ValueError:
                    pass
        return table


def measure_latency(fn: Callable, *args, warmup=3, iters=20):
    """Median wall-clock of a jitted callable, ms (measure_net_latency
    semantics: warmup then timed loop, pytorch_utils.py:135-186).

    NB this is the END-TO-END per-call number: on a remote-attached device
    it includes the dispatch round-trip, and `block_until_ready` through a
    relay can report before execution completes (NOTES_ROUND2). For the
    device-compute latency use `measure_latency_device`."""
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.median(times))


def measure_latency_device(fn: Callable, x, n_small=16, n_big=48, reps=3,
                           min_signal_s=0.02, max_rounds=3):
    """Device-compute latency of `fn(x)` in ms: invocations chained inside
    one `lax.scan` dispatch (per-dispatch RTT amortized), the carry folded
    into the input so XLA cannot hoist the body, terminated by a value
    fetch, and slope-timed between two scan lengths so the remaining
    constant (dispatch + fetch transfer) cancels — the bench.py / relay
    methodology (an empty scan body "measures" RTT/n; readiness through
    the relay can report early).

    Adaptive: if the wall difference between the two windows is below
    `min_signal_s` (the slope signal would drown in relay jitter — a ~µs
    block body at n=12 produced NEGATIVE LUT entries on hardware), scale
    both scan lengths up and re-measure, up to `max_rounds` times."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def runner(n):
        @jax.jit
        def run():
            def body(c, _):
                y = fn(x + c.astype(x.dtype))
                return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-30, None
            out, _ = lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=n)
            return out
        return run

    for round_i in range(max_rounds):
        walls = {}
        for n in (n_small, n_big):
            run = runner(n)
            _ = float(np.asarray(run()))  # compile + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(np.asarray(run()))
                best = min(best, time.perf_counter() - t0)
            walls[n] = best
        signal = walls[n_big] - walls[n_small]
        if signal >= min_signal_s:
            return signal / (n_big - n_small) * 1000
        if round_i == max_rounds - 1:
            if signal <= 0:
                # returning a clamped 0.0 would poison a latency LUT
                # (blocks priced as free satisfy any search constraint)
                raise RuntimeError(
                    "measure_latency_device: no usable slope after %d "
                    "adaptive rounds (signal %.4fs at n=%d/%d) — relay "
                    "jitter dominates; retry on a healthier session"
                    % (max_rounds, signal, n_small, n_big))
            return signal / (n_big - n_small) * 1000
        # cap the per-round jump: a one-off negative signal on an ~ms body
        # must not explode the next round into minutes of chained work
        scale = min(16, max(2, int(np.ceil(
            min_signal_s * 1.5 / max(signal, 1e-4)))))
        n_small, n_big = n_small * scale, n_big * scale


def filter_slope_samples(samples, *, floor_ms=0.0, max_spread=3.0):
    """Drop non-physical slope-timing samples (a committed r4 artifact
    carried a -134.373 ms "measurement" — DW_SEAM_RACE_r04.json): a
    non-positive slope means the small window outran the big one, i.e. the
    harness hiccuped (relay stall mid-window), and a sample further than
    `max_spread`x from the median of the positive samples is a jitter
    outlier. Pure function; returns (kept, rejected), both sorted."""
    pos = [s for s in samples if s > floor_ms]
    rejected = [s for s in samples if s <= floor_ms]
    if not pos:
        return [], sorted(rejected)
    med = float(np.median(pos))
    lo, hi = med / max_spread, med * max_spread
    kept = [s for s in pos if lo <= s <= hi]
    rejected += [s for s in pos if not (lo <= s <= hi)]
    return sorted(kept), sorted(rejected)


def select_slope_vs_wall(slopes, walls, *, lo_frac=0.6):
    """Pick the best slope-timed step given the scan-amortized walls.

    A wall (= big-window wall / steps-in-window) already dilutes the
    constant dispatch+fetch RTT over many steps, so the true per-step
    time cannot sit below ~`lo_frac`x of the smallest wall; a slope
    under that bound is RTT variance in the window pair, not the chip
    (an r5 cls run published a 5.2 ms "step" next to 24.8 ms walls
    before this guard). Returns (best_ms, ok_slopes, rejected_slopes);
    falls back to the smallest wall (a conservative upper bound on the
    step) when every slope is rejected. Pure function."""
    walls = sorted(walls)
    slopes = sorted(slopes)
    ok = [t for t in slopes if t > lo_frac * walls[0]]
    rejected = [t for t in slopes if t not in ok]
    best = ok[0] if ok else walls[0]
    return best, ok, rejected


def sample_slopes(window_fn, *, n_small, n_big, reps=3, max_attempts=None,
                  floor_ms=0.0, max_spread=3.0):
    """Collect `reps` guarded slope samples from paired timing windows.

    `window_fn(k)` = wall-clock ms of k chained dispatches (value-fetch
    terminated). One sample = (window_fn(n_big) - window_fn(n_small)) /
    (n_big - n_small), the per-dispatch slope with the constant dispatch +
    fetch cost cancelled. Garbage samples (filter_slope_samples) are
    resampled up to `max_attempts` (default 2*reps+2) total pairs; raises
    if nothing survives so a race can never headline a non-physical
    number. Returns (kept, rejected) in ms, both sorted."""
    if max_attempts is None:
        max_attempts = 2 * reps + 2
    raw = []
    kept, rejected = [], []
    for _ in range(max_attempts):
        t_small = window_fn(n_small)
        t_big = window_fn(n_big)
        raw.append((t_big - t_small) / (n_big - n_small))
        kept, rejected = filter_slope_samples(raw, floor_ms=floor_ms,
                                              max_spread=max_spread)
        if len(kept) >= reps:
            break
    if not kept:
        raise RuntimeError(
            "sample_slopes: all %d slope samples were non-physical "
            "(%s) — harness/relay is broken; do not publish this window"
            % (len(raw), [round(s, 3) for s in raw]))
    return kept, rejected


def build_latency_table(net, params, state, space, hr_size=96,
                        batch_size=1, iters=10, device_timing=True):
    """Measure each materialized uniform subnet corner on the device and
    record it — a compact TPU latency LUT over (ks, e, d, pixel_d).

    `device_timing=True` (default) records device-compute latency
    (`measure_latency_device`, relay-immune); False records the per-call
    end-to-end wall (`measure_latency`, includes dispatch RTT)."""
    import jax
    import jax.numpy as jnp

    from ..models.arch import uniform_subnet
    from ..models.materialize import get_active_subnet

    table = LatencyTable()
    rng = np.random.RandomState(0)
    for pd in space.pixel_d_list:
        lr = hr_size // (2 ** pd)
        x = jnp.asarray(rng.rand(batch_size, lr, lr, 3), jnp.float32)
        for k in space.ks_list:
            for e in space.expand_list:
                for d in space.depth_list:
                    cfg = uniform_subnet(space, k, e, d, pd,
                                         n_trunks=net.n_trunks)
                    sub = get_active_subnet(net, params, state, cfg)
                    if device_timing:
                        ms = measure_latency_device(sub, x)
                    else:
                        ms = measure_latency(jax.jit(sub), x, warmup=2,
                                             iters=iters)
                    table.set("sr_subnet", [lr, lr, 3],
                              [hr_size, hr_size, 3], ms,
                              kernel=k, expand=e, depth=d, pixel_d=pd)
    return table


def build_block_latency_table(net, params, state, space, hr_size=96,
                              batch_size=1, trunk_stages=None):
    """Additive per-layer TPU latency LUT — the reference's LUT shape
    (tutorial/latency_table.py keys one entry per layer type + shapes) with
    device-measured values: one 'expanded_conv' entry per (kernel, expand,
    resolution) for the trunk MBConv, plus one 'sr_head_tail' entry per
    pixel_d for everything outside the trunk (stem, final convs, shuffle
    tail) measured as whole-subnet latency minus the blocks' sum.

    latency(cfg) ~= head_tail[pd] + sum_blocks blk[ks_i, e_i, res(pd)].
    Additivity across XLA fusion boundaries is approximate — callers should
    spot-check (exp/tpu_latency_search.py measures the additivity error on
    sampled configs)."""
    import jax.numpy as jnp

    from ..models.arch import uniform_subnet
    from ..models.materialize import get_active_subnet

    table = LatencyTable()
    rng = np.random.RandomState(0)
    w = space.width
    d_min, d_max = min(space.depth_list), max(space.depth_list)
    # stages that actually execute: get_active_subnet here is always
    # mode='sr', which runs exactly space.n_stages trunk stages for BOTH
    # S4 (its only trunk) and X4 (decoder only) — so that's the default;
    # a multiplied n_trunks default would double-subtract block time on
    # X4 and zero-poison the head/tail entry
    n_stages_total = (trunk_stages if trunk_stages is not None
                      else space.n_stages)
    for pd in space.pixel_d_list:
        lr = hr_size // (2 ** pd)
        xb = jnp.asarray(rng.rand(batch_size, lr, lr, w), jnp.float32)
        blk_ms = {}
        for k in space.ks_list:
            for e in space.expand_list:
                cfg = uniform_subnet(space, k, e, d_max, pd,
                                     n_trunks=getattr(net, "n_trunks", 1))
                sub = get_active_subnet(net, params, state, cfg)
                bp = sub.params["dec_stages"][0][0]
                ms = measure_latency_device(lambda t, bp=bp: sub._mbconv(bp, t),
                                            xb)
                blk_ms[(k, e)] = ms
                table.set("expanded_conv", [lr, lr, w], [lr, lr, w], ms,
                          kernel=k, expand=e)
        # head+tail remainder: whole minimal subnet minus its blocks' sum
        k0, e0 = min(space.ks_list), min(space.expand_list)
        cfg = uniform_subnet(space, k0, e0, d_min, pd,
                             n_trunks=getattr(net, "n_trunks", 1))
        sub = get_active_subnet(net, params, state, cfg)
        x = jnp.asarray(rng.rand(batch_size, lr, lr, 3), jnp.float32)
        whole = measure_latency_device(sub, x)
        ht = max(whole - n_stages_total * d_min * blk_ms[(k0, e0)], 0.0)
        table.set("sr_head_tail", [lr, lr, 3],
                  [hr_size, hr_size, 3], ht, pixel_d=pd)
    return table


def lut_efficiency_fn(table: LatencyTable, space, hr_size=96, n_trunks=1,
                      stage_range=None):
    """cfg -> estimated latency in ms from an additive per-block LUT
    (build_block_latency_table) — plugs into EvolutionFinder as the
    efficiency constraint, the reference's LatencyEstimator.predict_efficiency
    role with TPU-measured values.

    `stage_range=(lo, hi)` restricts the billed stages (cfg.d indices).
    Default: the LAST trunk's stages — the LUT is built in 'sr' mode,
    where S4 runs its only trunk and X4 runs only the decoder (the last
    trunk), so encoder genes cost nothing and must not be billed."""
    w = space.width
    lo_s, hi_s = stage_range or (space.n_stages * (n_trunks - 1),
                                 space.n_stages * n_trunks)

    def fn(cfg):
        lr = hr_size // (2 ** cfg.pixel_d)
        ms = table.query("sr_head_tail", [lr, lr, 3],
                         [hr_size, hr_size, 3], pixel_d=cfg.pixel_d)
        for si in range(lo_s, hi_s):
            for i in range(cfg.d[si]):
                bi = si * space.max_depth + i
                ms += table.query("expanded_conv", [lr, lr, w],
                                  [lr, lr, w], kernel=cfg.ks[bi],
                                  expand=cfg.e[bi])
        return ms
    return fn
