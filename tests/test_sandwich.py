"""Sandwich rule (RunConfig.sandwich_rule): k=0 pins the max corner within
the stage constraints; k >= 1 draws are bit-identical to the non-sandwich
run (the reference's per-k seed contract, progressive_shrinking.py:161-165,
reseeds every k independently, so skipping the k=0 draw must not shift
them)."""

import pytest

from ofa_sr_tpu.models import OFAMobileNetX4, SearchSpace
from ofa_sr_tpu.models.arch import uniform_subnet
from ofa_sr_tpu.train.run_manager import RunConfig


class _FakeProvider:
    train = None
    valid = None
    test = None
    n_classes = 0


def _manager(sandwich, dyn_bs=4):
    # SRRunManager builds jitted steps lazily; sample_archs is pure host
    # logic, so a bare object with the needed attrs is enough
    from ofa_sr_tpu.train.run_manager import SRRunManager

    net = OFAMobileNetX4(SearchSpace())
    rm = SRRunManager.__new__(SRRunManager)
    rm.net = net
    rm.run_config = RunConfig(dynamic_batch_size=dyn_bs,
                              sandwich_rule=sandwich)
    return rm


@pytest.mark.parametrize("cons,expect", [
    ({}, (7, 6, 4, 2)),
    ({"depth_candidates": [4, 3]}, (7, 6, 4, 2)),
    ({"expand_candidates": [6, 4]}, (7, 6, 4, 2)),
    ({"pixel_d_candidates": [2, 1]}, (7, 6, 4, 2)),
])
def test_k0_is_max_within_constraints(cons, expect):
    rm = _manager(True)
    _, descs = rm.sample_archs(3, 50, 7, constraints=cons)
    sp = rm.net.space
    want = uniform_subnet(sp, *expect, n_trunks=rm.net.n_trunks)
    assert descs[0] == want


def test_k_ge_1_sequence_unchanged():
    cons = {"depth_candidates": [4, 3]}
    rm = _manager(True)
    _, base = _manager(False).sample_archs(2, 40, 5, constraints=cons)
    _, sand = rm.sample_archs(2, 40, 5, constraints=cons)
    assert sand[1:] == base[1:]
    # k=0 is the deterministic max corner, not the k=0 random draw
    want = uniform_subnet(rm.net.space, 7, 6, 4, 2, n_trunks=rm.net.n_trunks)
    assert sand[0] == want


def test_disabled_below_two_subnets():
    # with a single sample the rule would erase elasticity — it must not
    # engage at dynamic_batch_size=1
    _, base = _manager(False, dyn_bs=1).sample_archs(2, 40, 5)
    _, sand = _manager(True, dyn_bs=1).sample_archs(2, 40, 5)
    assert sand == base


def test_fixed_cfg_wins():
    rm = _manager(True)
    fixed = uniform_subnet(rm.net.space, 3, 3, 2, 1,
                           n_trunks=rm.net.n_trunks)
    _, descs = rm.sample_archs(0, 10, 0, fixed_cfg=fixed)
    assert all(d == fixed for d in descs)


def test_torch_side_mirrors_jax_side():
    """The curriculum's torch half pins max(spec lists); the jax half pins
    max within constraints. Stage candidate lists are largest-first
    prefixes, so both resolve to the same corner — lock that equivalence."""
    sp = SearchSpace()
    for stage_cands in ([4, 3], [4, 3, 2]):
        rm = _manager(True)
        _, descs = rm.sample_archs(1, 30, 2,
                                   constraints={"depth_candidates":
                                                stage_cands})
        spec_max = uniform_subnet(sp, max(sp.ks_list), max(sp.expand_list),
                                  max(sp.depth_list), max(sp.pixel_d_list),
                                  n_trunks=2)
        assert descs[0] == spec_max
