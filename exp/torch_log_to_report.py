"""Salvage a torch-oracle curriculum half from its stdout log.

run_torch_curriculum (exp/curriculum.py) prints each finished phase as
`torch <phase> done: {'K5-E3-D2-PD1': 27.413, ...}` — the full results dict.
If the process is cut off before its report.json is written (it ran the old
pre-write_partial code, or the container dies), this tool reconstructs a
partial torch half from those lines, shaped exactly like a
report_partial_torch.json, so merge_curriculum_reports.py --out works.

The config block is copied from the finished jax half (the two halves are
launched with identical dataset/schedule flags; side-local keys are
overwritten), and the bicubic baseline is RECOMPUTED from --data_root so the
merge's same-data check stays honest.

Run: python exp/torch_log_to_report.py LOG JAX_REPORT --out F.json
"""

from __future__ import annotations

import argparse
import ast
import json
import re
import types

_LINE = re.compile(r"^torch (\w+) done: (\{.*\})\s*$")


def parse_log(path: str) -> dict:
    results = {}
    with open(path) as f:
        for line in f:
            m = _LINE.match(line)
            if m:
                results[m.group(1)] = ast.literal_eval(m.group(2))
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log")
    ap.add_argument("jax_report", help="finished jax half (config source)")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    with open(a.jax_report) as f:
        jr = json.load(f)
    results = parse_log(a.log)
    if not results:
        raise SystemExit("no 'torch <phase> done:' lines in %s" % a.log)

    cfg = dict(jr["config"])
    cfg["skip_jax"], cfg["skip_torch"] = True, False

    from curriculum import bicubic_baseline  # noqa: E402 (sibling module)
    ns = types.SimpleNamespace(data_root=cfg["data_root"], crop=cfg["crop"],
                               bs=cfg["bs"])
    partial = {"config": cfg, "baseline_bicubic": bicubic_baseline(ns),
               "torch": results, "partial": True,
               "salvaged_from_log": a.log}
    with open(a.out, "w") as f:
        json.dump(partial, f, indent=2)
    print(json.dumps({k: sorted(results)
                      for k in ("phases_recovered",)}, indent=2))


if __name__ == "__main__":
    main()
