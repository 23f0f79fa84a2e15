"""Profiling utilities (SURVEY.md §5.1).

The reference's surface: hook-based FLOPs profiler (broken for dynamic nets,
flops_counter.py:43), closed-form conv FLOPs/params (pytorch_utils.py:72-124),
and warmup+loop latency measurement (measure_net_latency,
pytorch_utils.py:135-186). Here:

- `get_net_info`: params + closed-form FLOPs for a subnet config (general,
  not singleton-only) — also dumped to net_info.txt by the run managers;
- `measure_net_latency`: jitted-callable wall-clock (search/latency.py);
- `trace`: context manager around jax.profiler for a real TPU timeline
  (xplane protos viewable in TensorBoard / xprof) — the tracer the
  reference never had.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import numpy as np

from ..search.flops import count_params, s4_subnet_flops, s4_subnet_params
from ..search.latency import measure_latency as measure_net_latency  # re-export


def get_net_info(net, params, cfg=None, hr_size=96):
    """{'param_count', 'subnet_params', 'subnet_macs'} for an SR supernet.

    `cfg` (SubnetConfig) selects the subnet for the closed forms; omitted ->
    the max subnet."""
    from ..models.arch import max_subnet
    info = {"param_count": count_params(params)}
    space = net.space
    if cfg is None:
        cfg = max_subnet(space, net.n_trunks)
    if net.n_trunks == 1:
        info["subnet_params"] = s4_subnet_params(cfg, space, net.CONV_KS)
        info["subnet_macs"] = s4_subnet_flops(cfg, space, hr_size, net.CONV_KS)
    return info


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ofa_sr_tpu_trace"):
    """Capture a device timeline: `with profile.trace(dir): step(...)`."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
