"""Merge the two halves of a split curriculum run into one report.

The convergence curriculum (exp/curriculum.py) can run its jax half and its
torch-oracle half as separate processes (--skip_torch / --skip_jax) sharing
one --data_root and the same seeded inits — on this container the jax half
runs on the TPU while the torch half runs nice-19 on the single CPU. Each
half writes a report.json containing only its own side. This tool joins
them: it checks the halves actually describe the same experiment (same
dataset config, same schedules, identical bicubic baselines), recomputes
delta_jax_minus_torch exactly as curriculum.py main() would have
(exp/curriculum.py:608-614), and adds a headline block answering the round-4
question directly: does the trained model beat bicubic?

Run: python exp/merge_curriculum_reports.py JAX_REPORT TORCH_REPORT [--out F]
"""

from __future__ import annotations

import argparse
import json

# config keys that may legitimately differ between the two halves
_SIDE_LOCAL = {"out", "skip_torch", "skip_jax", "compile_cache", "data_root",
               "jax_resume_report", "torch_resume_report", "mirror_dir"}


def merge(jr: dict, tr: dict) -> dict:
    for k in set(jr["config"]) | set(tr["config"]):
        if k in _SIDE_LOCAL:
            continue
        if jr["config"].get(k) != tr["config"].get(k):
            raise SystemExit("config mismatch on %r: jax=%r torch=%r" %
                             (k, jr["config"].get(k), tr["config"].get(k)))
    # Same data ⇒ same bicubic PSNR up to backend float accumulation (the
    # jax half may run on TPU, the torch half on CPU): 0.01 dB tolerance,
    # anything larger means the halves saw different datasets.
    for s in ("x2", "x4"):
        if abs(jr["baseline_bicubic"][s] - tr["baseline_bicubic"][s]) > 0.01:
            raise SystemExit("bicubic baselines differ — the halves did not "
                             "see the same data: %r vs %r" %
                             (jr["baseline_bicubic"], tr["baseline_bicubic"]))
    out = {"config": {k: v for k, v in jr["config"].items()
                      if k not in ("skip_torch", "skip_jax")},
           "baseline_bicubic": jr["baseline_bicubic"],
           "jax": jr["jax"], "jax_sec": jr.get("jax_sec"),
           "torch": tr["torch"], "torch_sec": tr.get("torch_sec")}
    if jr.get("partial") or tr.get("partial"):
        # a half written incrementally by curriculum.write_partial (run cut
        # off mid-curriculum): merge the phases both halves reached, list
        # the rest instead of failing
        out["partial"] = True
        out["phases_missing_torch"] = sorted(set(jr["jax"]) - set(tr["torch"]))
        out["phases_missing_jax"] = sorted(set(tr["torch"]) - set(jr["jax"]))
    deltas = {}
    for phase in out["jax"]:
        if phase not in out["torch"]:
            if out.get("partial"):
                continue
            raise SystemExit("phase %r missing from torch half" % phase)
        deltas[phase] = {k: round(out["jax"][phase][k]
                                  - out["torch"][phase][k], 3)
                         for k in out["jax"][phase]}
    out["delta_jax_minus_torch"] = deltas

    # the round-4 headline: trained-vs-bicubic margins (VERDICT r3
    # missing #1 — "teacher beats bicubic x2, a supernet corner beats
    # bicubic x4, torch oracle still within tolerance")
    bic = out["baseline_bicubic"]
    teacher = max(out["jax"]["teacher"].values())
    # Best 4x (PD2) corner over ALL supernet phases: every phase checkpoint
    # is a real trained supernet, and the reference's own progressive
    # shrinking degrades the max corner through late phases (its published
    # flow picks deployment subnets by search over the whole history, not
    # the last phase blindly). The final phase's own PD2 number is reported
    # alongside so the cross-phase pick is transparent.
    x4 = {(ph, k): v for ph, corners in out["jax"].items() if ph != "teacher"
          for k, v in corners.items() if k.endswith("PD2")}
    best = max(x4, key=x4.get) if x4 else None
    # the last *supernet* phase reached in curriculum order (the alphabetical
    # fallback once picked 'teacher' — not a supernet — on a partial merge)
    _ORDER = ["pretrain", "kernel", "depth", "expand", "pixelshuffle_depth"]
    reached = [ph for ph in _ORDER if ph in out["jax"]]
    final_phase = reached[-1] if reached else "teacher"
    final_pd2 = {k: v for k, v in out["jax"][final_phase].items()
                 if k.endswith("PD2")}
    flat = [d for ph in deltas.values() for d in ph.values()]
    out["headline"] = {
        "teacher_psnr_x2": teacher,
        "bicubic_x2": bic["x2"],
        "teacher_margin_db": round(teacher - bic["x2"], 3),
        "best_corner": best[1] if best else None,
        "best_corner_phase": best[0] if best else None,
        "best_corner_psnr_x4": round(x4[best], 3) if best else None,
        "bicubic_x4": bic["x4"],
        "corner_margin_db": round(x4[best] - bic["x4"], 3) if best else None,
        "final_phase": final_phase,
        "final_phase_best_pd2_psnr": (round(max(final_pd2.values()), 3)
                                      if final_pd2 else None),
        "oracle_delta_mean_db": (round(sum(flat) / len(flat), 3)
                                 if flat else None),
        "oracle_delta_max_abs_db": (round(max(abs(d) for d in flat), 3)
                                    if flat else None),
    }
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("jax_report")
    ap.add_argument("torch_report")
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()
    with open(a.jax_report) as f:
        jr = json.load(f)
    with open(a.torch_report) as f:
        tr = json.load(f)
    merged = merge(jr, tr)
    text = json.dumps(merged, indent=2)
    if a.out:
        with open(a.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
