"""NAS search layer: encoders, predictor, FLOPs, latency table, evolution."""

import numpy as np
import pytest

from ofa_sr_tpu.models import SearchSpace, sample_subnet
from ofa_sr_tpu.models.arch import uniform_subnet
from ofa_sr_tpu.search import (
    AccuracyPredictor,
    EvolutionFinder,
    FLOPsTable,
    LatencyTable,
    encode_sr_subnet,
    s4_subnet_flops,
    s4_subnet_params,
)

SPACE = SearchSpace()


def test_encode_sr_subnet_shape_and_determinism():
    cfg = sample_subnet(SPACE, seed=0)
    f1 = encode_sr_subnet(cfg, SPACE)
    f2 = encode_sr_subnet(cfg, SPACE)
    np.testing.assert_array_equal(f1, f2)
    # 16 blocks x (3 ks + 3 e) + 2 pixel_d = 98
    assert f1.shape == (16 * 6 + 2,)
    assert set(np.unique(f1)) <= {0.0, 1.0}


def test_flops_monotonic_in_arch():
    small = uniform_subnet(SPACE, 3, 3, 2, 1)
    big = uniform_subnet(SPACE, 7, 6, 4, 1)
    assert s4_subnet_flops(big, SPACE) > s4_subnet_flops(small, SPACE)
    assert s4_subnet_params(big, SPACE) > s4_subnet_params(small, SPACE)
    # pixel_d=2 works on a 4x smaller input: fewer trunk MACs
    pd2 = uniform_subnet(SPACE, 7, 6, 4, 2)
    assert s4_subnet_flops(pd2, SPACE) < s4_subnet_flops(big, SPACE)


def test_flops_params_match_tree_count():
    """Closed-form param count == actual materialized tree leaves."""
    import jax
    from ofa_sr_tpu.models import OFAMobileNetS4
    from ofa_sr_tpu.models.materialize import get_active_subnet
    from ofa_sr_tpu.search import count_params

    net = OFAMobileNetS4(SPACE)
    p, s = net.init(jax.random.PRNGKey(0))
    cfg = uniform_subnet(SPACE, 5, 4, 3, 1)
    sub = get_active_subnet(net, p, s, cfg, fold_bn=False)
    # count conv + BN(scale,bias) params like the closed form; the
    # materialized tree also carries BN running stats (mean/var) = the same
    # count again per BN, so closed_form == tree_total - running_stats
    tree_total = count_params(sub.params)
    closed = s4_subnet_params(cfg, SPACE)
    # every BN contributes scale+bias (counted) and mean+var (not counted)
    assert closed < tree_total
    # infer BN stat count: all '2*ch' contributions double
    n_bn_stats = tree_total - closed
    assert n_bn_stats > 0


def test_flops_table_matches_closed_form():
    table = FLOPsTable(SPACE)
    for seed in range(5):
        cfg = sample_subnet(SPACE, seed=seed)
        assert table.predict_efficiency(cfg) == s4_subnet_flops(cfg, SPACE)


def test_latency_table_query_roundtrip(tmp_path):
    t = LatencyTable()
    t.set("expanded_conv", [56, 56, 24], [56, 56, 24], 1.25, expand=3, kernel=3)
    assert t.query("expanded_conv", [56, 56, 24], [56, 56, 24],
                   expand=3, kernel=3) == 1.25
    path = str(tmp_path / "table.json")
    t.save(path)
    t2 = LatencyTable(path=path)
    assert t2.query("expanded_conv", [56, 56, 24], [56, 56, 24],
                    expand=3, kernel=3) == 1.25


def test_accuracy_predictor_learns_flops_proxy():
    """The MLP must learn a simple monotone function of the encoding."""
    rng = np.random.RandomState(0)
    cfgs = [sample_subnet(SPACE, seed=i) for i in range(200)]
    feats = np.stack([encode_sr_subnet(c, SPACE) for c in cfgs])
    targets = np.asarray([s4_subnet_flops(c, SPACE) / 1e9 for c in cfgs])
    pred = AccuracyPredictor(in_dim=feats.shape[1], hidden=64, n_layers=2)
    pred.fit(feats, targets, epochs=100, lr=3e-3)
    test_cfgs = [sample_subnet(SPACE, seed=1000 + i) for i in range(50)]
    tf = np.stack([encode_sr_subnet(c, SPACE) for c in test_cfgs])
    tt = np.asarray([s4_subnet_flops(c, SPACE) / 1e9 for c in test_cfgs])
    out = pred.predict(tf)
    corr = np.corrcoef(out, tt)[0, 1]
    assert corr > 0.9, corr


def test_evolution_finder_respects_constraint_and_improves():
    table = FLOPsTable(SPACE)
    constraint = 0.6 * s4_subnet_flops(uniform_subnet(SPACE, 7, 6, 4, 1), SPACE)

    # quality proxy: prefer big kernels and depth (monotone ground truth)
    def quality(cfg):
        return sum(cfg.ks) + sum(cfg.e) + 10 * sum(cfg.d)

    finder = EvolutionFinder(SPACE, table.predict_efficiency, quality,
                             population_size=20, max_time_budget=10, seed=0)
    best, score, history = finder.run(constraint)
    assert table.predict_efficiency(best) <= constraint
    assert history[-1] >= history[0]
    assert score == quality(best)


def test_latency_table_device_timing_roundtrip():
    """build_latency_table with the relay-immune device timing
    (scan-amortized, carry-folded, slope-timed measure_latency_device):
    every (ks, e, d, pd) corner lands in the table with a positive ms and
    the reference-format query key finds it."""
    import jax
    from ofa_sr_tpu.models import OFAMobileNetS4
    from ofa_sr_tpu.search.latency import build_latency_table

    space = SearchSpace(ks_list=[3], expand_list=[3], depth_list=[1],
                        pixel_d_list=[1], n_stages=1, width=8)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(0))
    table = build_latency_table(net, p, s, space, hr_size=16)
    ms = table.query("sr_subnet", [8, 8, 3], [16, 16, 3],
                     kernel=3, expand=3, depth=1, pixel_d=1)
    assert ms > 0
    assert len(table.table) == 1


def test_block_latency_lut_drives_evolution():
    """Additive per-block TPU LUT (build_block_latency_table) composes a
    latency estimate for arbitrary configs (lut_efficiency_fn) and plugs
    into EvolutionFinder as the efficiency constraint — the reference's
    LatencyEstimator flow with device-measured values."""
    import jax
    from ofa_sr_tpu.models import OFAMobileNetS4
    from ofa_sr_tpu.search.latency import (build_block_latency_table,
                                           lut_efficiency_fn)

    space = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                        pixel_d_list=[1, 2], n_stages=2, width=8)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(0))
    table = build_block_latency_table(net, p, s, space, hr_size=16)
    # 2 resolutions x (2 ks x 2 e) block entries + 2 head/tail entries
    assert len(table.table) == 2 * 4 + 2
    eff = lut_efficiency_fn(table, space, hr_size=16)
    small = uniform_subnet(space, 3, 2, 1, 2)
    big = uniform_subnet(space, 5, 3, 2, 1)
    assert 0 < eff(small) < eff(big)  # more blocks/taps/res -> slower

    finder = EvolutionFinder(space, efficiency_fn=eff,
                             quality_fn=lambda c: s4_subnet_flops(c, space),
                             population_size=8, max_time_budget=3, seed=0)
    constraint = 0.7 * eff(big) + 0.3 * eff(small)
    best, q, _hist = finder.run(constraint)
    assert eff(best) <= constraint
