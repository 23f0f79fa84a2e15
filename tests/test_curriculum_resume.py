"""exp/curriculum._resumable_results — the jax-half resume logic that lets a
curriculum run continue after a /tmp wipe (committed report survives, the
checkpoints do not) or a mid-run restart (the out-dir's own partial report).
Pure file/dict logic, so it gets a real unit test: precedence, missing and
unreadable inputs."""

import importlib.util
import json
import os
import types

_spec = importlib.util.spec_from_file_location(
    "curriculum",
    os.path.join(os.path.dirname(__file__), "..", "exp", "curriculum.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
_resumable_results = _mod._resumable_results


def _args(out, resume=None):
    return types.SimpleNamespace(out=str(out), jax_resume_report=resume)


def test_no_inputs_means_nothing_resumable(tmp_path):
    assert _resumable_results(_args(tmp_path)) == {}


def test_committed_report_phases_are_trusted(tmp_path):
    rep = tmp_path / "CURRICULUM.json"
    rep.write_text(json.dumps(
        {"jax": {"teacher": {"K5-E3-D2-PD1": 27.37}}, "torch": {}}))
    done = _resumable_results(_args(tmp_path, str(rep)))
    assert done == {"teacher": {"K5-E3-D2-PD1": 27.37}}


def test_out_dir_partial_overrides_resume_report(tmp_path):
    # a fresh in-run partial (this container, checkpoints intact) must win
    # over the stale committed number for the same phase
    rep = tmp_path / "CURRICULUM.json"
    rep.write_text(json.dumps(
        {"jax": {"teacher": {"K5-E3-D2-PD1": 27.0},
                 "pretrain": {"K7-E6-D4-PD2": 24.0}}}))
    (tmp_path / "report_partial_jax.json").write_text(json.dumps(
        {"jax": {"pretrain": {"K7-E6-D4-PD2": 24.9}}, "partial": True}))
    done = _resumable_results(_args(tmp_path, str(rep)))
    assert done["teacher"] == {"K5-E3-D2-PD1": 27.0}
    assert done["pretrain"] == {"K7-E6-D4-PD2": 24.9}


def test_unreadable_report_is_skipped_not_fatal(tmp_path):
    rep = tmp_path / "broken.json"
    rep.write_text("{not json")
    (tmp_path / "report_partial_jax.json").write_text(json.dumps(
        {"jax": {"teacher": {"K5-E3-D2-PD1": 27.37}}}))
    done = _resumable_results(_args(tmp_path, str(rep)))
    assert done == {"teacher": {"K5-E3-D2-PD1": 27.37}}


def test_report_without_jax_half_contributes_nothing(tmp_path):
    rep = tmp_path / "torch_only.json"
    rep.write_text(json.dumps({"torch": {"teacher": {"K5-E3-D2-PD1": 27.36}}}))
    assert _resumable_results(_args(tmp_path, str(rep))) == {}
