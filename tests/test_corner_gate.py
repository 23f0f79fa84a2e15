"""Per-corner best gating (RunConfig.corner_gate): best_<corner>.ckpt
snapshots + corner_best.json provenance. Gating is observation-only — it
must never touch the rolling checkpoint or latest.txt."""

import json
import os

import jax
import pytest

from ofa_sr_tpu.models import OFAMobileNetX4, SearchSpace
from ofa_sr_tpu.train.checkpoint import load_checkpoint
from ofa_sr_tpu.train.run_manager import RunConfig, SRRunManager


def _manager(tmp_path, gate=True):
    net = OFAMobileNetX4(SearchSpace(ks_list=[3], expand_list=[3],
                                     depth_list=[2], pixel_d_list=[1],
                                     n_stages=1, width=8))
    rm = SRRunManager.__new__(SRRunManager)
    rm.net = net
    rm.run_config = RunConfig(corner_gate=gate)
    rm.path = str(tmp_path)  # save_path property -> <path>/checkpoint
    rm.params, rm.state = net.init(jax.random.PRNGKey(0))
    rm.write_log = lambda *a, **k: None
    return rm


def test_snapshots_and_provenance(tmp_path):
    rm = _manager(tmp_path)
    rm.gate_corners([("K3-E3-D2-PD1", 20.0)], where="epoch 5")
    f = os.path.join(str(tmp_path), "checkpoint", "best_K3-E3-D2-PD1.ckpt")
    assert os.path.exists(f)
    book = json.load(open(os.path.join(str(tmp_path), "checkpoint", "corner_best.json")))
    assert book["K3-E3-D2-PD1"] == {"psnr": 20.0, "where": "epoch 5"}

    # a worse value must not overwrite the snapshot or the record
    first = os.path.getmtime(f)
    rm.gate_corners([("K3-E3-D2-PD1", 19.0)], where="epoch 10")
    book = json.load(open(os.path.join(str(tmp_path), "checkpoint", "corner_best.json")))
    assert book["K3-E3-D2-PD1"]["where"] == "epoch 5"
    assert os.path.getmtime(f) == first

    # a better value updates both
    rm.gate_corners([("K3-E3-D2-PD1", 21.5)], where="stage 2 end")
    book = json.load(open(os.path.join(str(tmp_path), "checkpoint", "corner_best.json")))
    assert book["K3-E3-D2-PD1"] == {"psnr": 21.5, "where": "stage 2 end"}


def test_snapshot_is_loadable_weights(tmp_path):
    rm = _manager(tmp_path)
    rm.gate_corners([("K3-E3-D2-PD1", 20.0)], where="warmstart")
    raw = load_checkpoint(
        os.path.join(str(tmp_path), "checkpoint", "best_K3-E3-D2-PD1.ckpt"))
    assert set(raw) == {"params", "state"}


def test_noop_when_disabled(tmp_path):
    rm = _manager(tmp_path, gate=False)
    rm.gate_corners([("K3-E3-D2-PD1", 20.0)], where="epoch 5")
    assert not os.path.exists(os.path.join(str(tmp_path), "checkpoint"))


def test_never_touches_latest(tmp_path):
    rm = _manager(tmp_path)
    rm.gate_corners([("A", 1.0), ("B", 2.0)], where="epoch 1")
    assert not os.path.exists(os.path.join(str(tmp_path), "checkpoint", "latest.txt"))
