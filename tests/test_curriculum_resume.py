"""exp/curriculum resume logic — lets a curriculum run continue after a
/tmp wipe (committed report survives, the checkpoints do not) or a mid-run
restart (the out-dir's own partial report). Pure file/dict logic, so it gets
a real unit test: precedence, missing/unreadable inputs, the per-phase
config gate (ADVICE r4: a differently-configured run must not donate its
numbers), and the PHASE_DONE completion sentinel (ADVICE r4 medium: a
checkpoint *directory* existing never proves the phase finished)."""

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
_phase_complete = _mod._phase_complete
_mark_phase_complete = _mod._mark_phase_complete

# every config key any phase's resume gate inspects
_CFG = dict(n_train=64, n_val=8, img=192, crop=96, bs=16, style="sharp",
            clip_grad_norm=0.0, seed=0, teacher_epochs=40, teacher_lr=1e-3,
            pretrain_epochs=98, pretrain_lr=1e-3, phase_epochs=4,
            phase_lr=2.5e-4, kd_ratio=0.0, sandwich=False, gate_frequency=0)


def _args(out, resume=None, **over):
    cfg = dict(_CFG, **over)
    return types.SimpleNamespace(out=str(out), jax_resume_report=resume,
                                 **cfg)


def _report(phases, **cfg_over):
    return json.dumps({"config": dict(_CFG, **cfg_over), "jax": phases,
                       "torch": {}})


def test_no_inputs_means_nothing_resumable(tmp_path):
    assert _resumable_results(_args(tmp_path)) == {}


def test_committed_report_phases_are_trusted(tmp_path):
    rep = tmp_path / "CURRICULUM.json"
    rep.write_text(_report({"teacher": {"K5-E3-D2-PD1": 27.37}}))
    done = _resumable_results(_args(tmp_path, str(rep)))
    assert done == {"teacher": {"K5-E3-D2-PD1": 27.37}}


def test_out_dir_partial_overrides_resume_report(tmp_path):
    # a fresh in-run partial (this container, checkpoints intact) must win
    # over the stale committed number for the same phase
    rep = tmp_path / "CURRICULUM.json"
    rep.write_text(_report({"teacher": {"K5-E3-D2-PD1": 27.0},
                            "pretrain": {"K7-E6-D4-PD2": 24.0}}))
    (tmp_path / "report_partial_jax.json").write_text(
        _report({"pretrain": {"K7-E6-D4-PD2": 24.9}}))
    done = _resumable_results(_args(tmp_path, str(rep)))
    assert done["teacher"] == {"K5-E3-D2-PD1": 27.0}
    assert done["pretrain"] == {"K7-E6-D4-PD2": 24.9}


def test_unreadable_report_is_skipped_not_fatal(tmp_path):
    rep = tmp_path / "broken.json"
    rep.write_text("{not json")
    (tmp_path / "report_partial_jax.json").write_text(
        _report({"teacher": {"K5-E3-D2-PD1": 27.37}}))
    done = _resumable_results(_args(tmp_path, str(rep)))
    assert done == {"teacher": {"K5-E3-D2-PD1": 27.37}}


def test_report_without_jax_half_contributes_nothing(tmp_path):
    rep = tmp_path / "torch_only.json"
    rep.write_text(json.dumps({"config": dict(_CFG),
                               "torch": {"teacher": {"K5-E3-D2-PD1": 27.36}}}))
    assert _resumable_results(_args(tmp_path, str(rep))) == {}


# ---- the per-phase config gate (ADVICE r4 low: _resumable_results trusted
# any report without comparing its config to the current run's) -------------

def test_config_mismatch_refuses_that_phase(tmp_path):
    rep = tmp_path / "CURRICULUM.json"
    rep.write_text(_report({"teacher": {"K5-E3-D2-PD1": 27.37},
                            "pretrain": {"K7-E6-D4-PD2": 24.9}},
                           pretrain_epochs=10))  # differs from current 98
    done = _resumable_results(_args(tmp_path, str(rep)))
    # teacher's keys don't include pretrain_epochs -> still donated
    assert done == {"teacher": {"K5-E3-D2-PD1": 27.37}}


def test_data_config_mismatch_refuses_every_phase(tmp_path):
    rep = tmp_path / "CURRICULUM.json"
    rep.write_text(_report({"teacher": {"K5-E3-D2-PD1": 27.37},
                            "pretrain": {"K7-E6-D4-PD2": 24.9}},
                           style="lowpass"))
    assert _resumable_results(_args(tmp_path, str(rep))) == {}


def test_key_missing_from_old_report_compares_against_default(tmp_path):
    # r4 reports predate --kd_ratio; they must stay resumable for a run at
    # the default (0.0) and be refused for a kd_ratio>0 run
    raw = json.loads(_report({"kernel": {"K3-E6-D4-PD2": 24.5}}))
    del raw["config"]["kd_ratio"]
    rep = tmp_path / "CURRICULUM.json"
    rep.write_text(json.dumps(raw))
    _mod._ARG_DEFAULTS.update(_CFG)
    try:
        assert "kernel" in _resumable_results(_args(tmp_path, str(rep)))
        assert _resumable_results(
            _args(tmp_path, str(rep), kd_ratio=0.5)) == {}
    finally:
        _mod._ARG_DEFAULTS.clear()


# ---- the PHASE_DONE completion sentinel (ADVICE r4 medium) -----------------

def test_phase_dir_alone_is_not_complete(tmp_path):
    # SRRunManager makedirs checkpoint/ before any save — an interrupted
    # phase leaves exactly this state and must NOT count as done
    os.makedirs(tmp_path / "checkpoint")
    assert not _phase_complete(str(tmp_path))


def test_checkpoint_without_sentinel_is_not_complete(tmp_path):
    # training saved at least once but grid_eval never ran (killed mid-eval)
    os.makedirs(tmp_path / "checkpoint")
    (tmp_path / "checkpoint" / "latest.txt").write_text("epoch_3")
    assert not _phase_complete(str(tmp_path))


def test_sentinel_plus_checkpoint_is_complete(tmp_path):
    os.makedirs(tmp_path / "checkpoint")
    (tmp_path / "checkpoint" / "latest.txt").write_text("epoch_3")
    _mark_phase_complete(str(tmp_path), "kernel", {"K3-E6-D4-PD2": 24.5})
    assert _phase_complete(str(tmp_path))
    with open(tmp_path / "PHASE_DONE.json") as f:
        assert json.load(f)["task"] == "kernel"
