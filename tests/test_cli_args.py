"""CLI argument surface: the perf flags' value mapping (cli/common.py)."""

import argparse

import pytest

from ofa_sr_tpu.cli import common as c


@pytest.mark.parametrize("argv,want", [
    (["--dw_switch"], True),            # bare flag = dw-only branching
    (["--dw_switch", "dw"], True),
    (["--dw_switch", "project"], "project"),
    ([], None),                          # absent -> not in kwargs
])
def test_dw_switch_value_mapping(argv, want):
    p = argparse.ArgumentParser()
    c.add_perf_args(p)
    kw = c.perf_config_kw(p.parse_args(argv))
    assert kw.get("dw_switch") == want


def test_dw_switch_rejects_unknown_value():
    p = argparse.ArgumentParser()
    c.add_perf_args(p)
    with pytest.raises(SystemExit):
        p.parse_args(["--dw_switch", "True"])


def test_dw_align_maps_into_run_config():
    p = argparse.ArgumentParser()
    c.add_perf_args(p)
    kw = c.perf_config_kw(p.parse_args(["--dw_switch", "--dw_align", "128"]))
    assert kw["dw_align"] == 128
    # absent / 0 -> not in kwargs (RunConfig default 0 = off)
    kw = c.perf_config_kw(p.parse_args([]))
    assert "dw_align" not in kw
    from ofa_sr_tpu.train.run_manager import RunConfig
    assert RunConfig(**kw, dw_switch=True).dw_align == 0
    assert RunConfig(dw_switch=True, dw_align=128).dw_align == 128
