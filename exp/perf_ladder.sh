#!/bin/sh
# The healthy-chip perf runbook: run this the moment exp/relay_probe.py says
# healthy (the relayed chip can degrade again within the hour). Outputs land
# in exp/out_<timestamp>/.
set -x
cd "$(dirname "$0")/.."
out="exp/out_$(date +%H%M%S)"
mkdir -p "$out"
timeout 300 python exp/relay_probe.py          | tee "$out/probe.json"
timeout 1200 python exp/perf_op_profile.py     | tee "$out/op_profile.json"
timeout 2400 python exp/perf_step_variants.py  | tee "$out/step_variants.json"
timeout 1200 python exp/pallas_hw_bench.py     | tee "$out/pallas_hw.json"
timeout 1800 python bench.py                   | tee "$out/bench.json"
timeout 300 python exp/relay_probe.py          | tee "$out/probe_after.json"
