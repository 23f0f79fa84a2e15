"""exp/merge_curriculum_reports.merge — the tool that joins the split
curriculum halves into the committed CURRICULUM artifact. Pure-dict logic,
so it gets a real unit test: headline margins, cross-backend baseline
tolerance, partial-half behavior, config mismatch refusal."""

import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "merge_curriculum_reports",
    os.path.join(os.path.dirname(__file__), "..", "exp",
                 "merge_curriculum_reports.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
merge = _mod.merge


def _report(side, phases, *, bic_x4=24.16, partial=False):
    r = {"config": {"n_train": 128, "crop": 48, "out": "/tmp/%s" % side,
                    "skip_torch": side == "jax", "skip_jax": side == "torch"},
         "baseline_bicubic": {"x2": 26.689, "x4": bic_x4},
         side: phases}
    if partial:
        r["partial"] = True
    return r


JAX_PHASES = {
    "teacher": {"K5-E3-D2-PD1": 27.37},
    "pretrain": {"K7-E6-D4-PD2": 24.9},
    "pixelshuffle_depth": {"K7-E6-D4-PD1": 25.0, "K7-E6-D4-PD2": 23.1},
}
TORCH_PHASES = {
    "teacher": {"K5-E3-D2-PD1": 27.36},
    "pretrain": {"K7-E6-D4-PD2": 24.92},
    "pixelshuffle_depth": {"K7-E6-D4-PD1": 25.03, "K7-E6-D4-PD2": 23.12},
}


def test_merge_headline_margins_and_best_corner_across_phases():
    out = merge(_report("jax", JAX_PHASES), _report("torch", TORCH_PHASES))
    h = out["headline"]
    assert h["teacher_margin_db"] == pytest.approx(27.37 - 26.689, abs=1e-3)
    # best PD2 corner is the pretrain phase's, not the (regressed) final one
    assert h["best_corner_phase"] == "pretrain"
    assert h["best_corner_psnr_x4"] == pytest.approx(24.9)
    assert h["corner_margin_db"] == pytest.approx(24.9 - 24.16, abs=1e-3)
    assert h["final_phase"] == "pixelshuffle_depth"
    assert h["final_phase_best_pd2_psnr"] == pytest.approx(23.1)
    # deltas are jax - torch per corner
    d = out["delta_jax_minus_torch"]["teacher"]["K5-E3-D2-PD1"]
    assert d == pytest.approx(0.01, abs=1e-6)
    assert "partial" not in out


def test_merge_tolerates_cross_backend_baseline_rounding():
    out = merge(_report("jax", JAX_PHASES, bic_x4=24.161),
                _report("torch", TORCH_PHASES, bic_x4=24.16))
    assert out["headline"]["corner_margin_db"] is not None


def test_merge_rejects_different_datasets():
    with pytest.raises(SystemExit, match="bicubic baselines differ"):
        merge(_report("jax", JAX_PHASES, bic_x4=25.0),
              _report("torch", TORCH_PHASES, bic_x4=24.16))


def test_merge_rejects_config_mismatch():
    jr = _report("jax", JAX_PHASES)
    jr["config"]["crop"] = 96
    with pytest.raises(SystemExit, match="config mismatch"):
        merge(jr, _report("torch", TORCH_PHASES))


def test_merge_partial_half_lists_missing_phases():
    jax_half = {"teacher": JAX_PHASES["teacher"]}
    out = merge(_report("jax", jax_half, partial=True),
                _report("torch", TORCH_PHASES))
    assert out["partial"] is True
    assert out["phases_missing_jax"] == ["pixelshuffle_depth", "pretrain"]
    # headline still computes what it can; corners absent from the jax half
    assert out["headline"]["teacher_margin_db"] is not None
    assert out["headline"]["best_corner"] is None


def test_merge_partial_final_phase_is_last_supernet_phase_reached():
    jax_half = {"teacher": JAX_PHASES["teacher"],
                "pretrain": JAX_PHASES["pretrain"]}
    out = merge(_report("jax", jax_half, partial=True),
                _report("torch", TORCH_PHASES))
    # NOT 'teacher' (alphabetical last, but not a supernet phase)
    assert out["headline"]["final_phase"] == "pretrain"
    assert out["headline"]["final_phase_best_pd2_psnr"] == 24.9
