"""dw_switch execution mode == masked execution (forward, BN state, grads).

dw_switch branches the depthwise conv (and only it) over the sampled
(kernel size, middle width): the selected branch runs k x k taps on the
first mk channels and zero-pads the output back to the bank width
(models/layers.py _dw_switched). Equivalence basis:
- channels >= mid of the depthwise input are exactly zero (the BN mask
  re-zeroed them after the expand 1x1), and depthwise is per-channel, so
  dropping zero channels and zero-padding the output equals the
  full-width conv;
- the tap argument is ks_switch's (a k x k kernel at pad k//2 equals the
  zero-embedded max-ks kernel at pad max_ks//2);
- mk is the smallest candidate >= mid, so runtime widths off the
  candidate grid (cls width_mult) stay exact with less savings.

dw_switch="project" (dwp) additionally pulls dw-BN, act, and the project
1x1 into the branch (_dwp_switched): the switch seam then carries the
block-width projection instead of the bank-width dw activation, and the
project contracts only the mk prefix. Extra equivalence basis: masked BN
over the mk prefix updates/normalizes exactly the channels the full-width
masked BN does (per-channel stats are independent; suffix running stats
are gated by the mask in both paths), and the sliced project equals the
masked full-width project because channels >= mid are zero post-mask.
Blocks with SE / elastic out_ch / spatial masks fall back to dw-only
branching.

Motivation: the r3 device trace measured the max-shape dw stack at 54%
of the production train step (DESIGN.md §7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
from ofa_sr_tpu.train import SRTrainer

SMALL = SearchSpace(ks_list=[3, 5, 7], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=2, width=8)


@pytest.mark.parametrize("mode", [True, "project"])
def test_dw_switch_matches_masked_forward_and_state(mode):
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    seen = set()
    for seed in range(8):
        cfg = sample_subnet(SMALL, seed=seed)
        seen.update(zip(cfg.ks, cfg.e))
        arch = cfg.to_device(SMALL)
        net.dw_switch = False
        y0, s0 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        net.dw_switch = mode
        y1, s1 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    net.dw_switch = False
    assert len({k for k, _ in seen}) > 1 and len({e for _, e in seen}) > 1, \
        "samples never exercised multiple (ks, e) options"


@pytest.mark.parametrize("mode", [True, "project"])
def test_dw_switch_off_grid_width_uses_ceiling_branch(mode):
    """A runtime mid between candidates (the cls width_mult case) must take
    the smallest candidate >= mid and stay exact vs masking."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 3).astype(np.float32))
    cfg = sample_subnet(SMALL, seed=3)
    arch = cfg.to_device(SMALL)
    # candidates are make_divisible(8*e, 8) = {16, 24}; force mid=20
    arch = dict(arch)
    arch["mid"] = jnp.full_like(arch["mid"], 20)
    net.dw_switch = False
    y0, _ = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=False)
    net.dw_switch = mode
    y1, _ = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=False)
    net.dw_switch = False
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", [True, "project"])
def test_dw_switch_cls_mbv3_exact(mode):
    """MBV3 (SE blocks, strided stages, per-block in_ch) under dw_switch ==
    masked execution; candidates derive from each block's own weight shapes
    (_dw_mid_candidates). Under "project" the SE blocks fall back to
    dw-only branching (the SE gate needs the dw activation)."""
    from ofa_sr_tpu.models.ofa_cls import OFAMobileNetV3
    net = OFAMobileNetV3()
    p, s = net.init(jax.random.PRNGKey(0))
    arch = net.arch_to_device(net.sample_arch(seed=3))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    net.dw_switch = False
    y0, _ = net.apply(p, s, x, arch, training=True)
    net.dw_switch = mode
    y1, _ = net.apply(p, s, x, arch, training=True)
    net.dw_switch = False
    # mathematically exact; float reassociation only (the sliced dw's
    # reduction tiling differs from the masked full-width conv's),
    # amplified through 20 blocks + global pooling: measured 2.3e-6 abs
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)


def test_dw_live_narrowing_exact():
    """dw_opts['live'] (shrink-phase set_constraint lists threaded into the
    branch enumeration, layers._dw_live_lists): archs sampled under the same
    constraint lists execute exactly as masked, with fewer compiled
    branches. Covers ks-narrowing (index remap), e-narrowing (fewer mids),
    and both together."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(4).rand(2, 8, 8, 3), jnp.float32)
    for live_ks, live_e in [((5, 7), None), (None, (3,)), ((3, 5), (2, 3)),
                            ((7,), (3,))]:
        ks_c = list(live_ks) if live_ks else None
        e_c = list(live_e) if live_e else None
        for seed in range(4):
            cfg = sample_subnet(SMALL, seed=seed, ks_candidates=ks_c,
                                expand_candidates=e_c)
            arch = cfg.to_device(SMALL)
            net.dw_switch = False
            net.dw_opts = None
            y0, s0 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d,
                               training=True)
            net.dw_switch = True
            net.dw_opts = {"live": (live_ks, live_e)}
            y1, s1 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d,
                               training=True)
            net.dw_switch = False
            net.dw_opts = None
            np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                       rtol=1e-5, atol=1e-5)
            for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-5)


def test_dw_seam_and_align_exact():
    """The 'dus' seam and lane-aligned width candidates are numerically
    identical to the default pad seam (and to masked execution): a branch
    with mk >= mid is exact because channels >= mid are zero. align=32 at
    width 8 collapses the {16, 24} candidates to {24} — the off-candidate
    branch case."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(5).rand(2, 8, 8, 3), jnp.float32)
    for opts in ({"seam": "dus"}, {"align": 32}, {"seam": "dus", "align": 16}):
        for seed in range(3):
            cfg = sample_subnet(SMALL, seed=seed)
            arch = cfg.to_device(SMALL)
            net.dw_switch = False
            net.dw_opts = None
            y0, _ = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d,
                              training=False)
            net.dw_switch = True
            net.dw_opts = opts
            y1, _ = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d,
                              training=False)
            net.dw_switch = False
            net.dw_opts = None
            np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                       rtol=1e-5, atol=1e-5)


def test_run_manager_applies_dw_live_and_stays_exact(tmp_path):
    """SRRunManager.train(constraints=...) with dw_switch narrows the
    compiled branch set (_apply_dw_live) without changing a single update:
    one constrained training step (expand_candidates=[3]) produces the same
    params as the full-branch dw_switch step, and the eval step (which
    strips the narrowing) still validates a FULL-space corner exactly."""
    from ofa_sr_tpu.data.providers import SyntheticSRProvider
    from ofa_sr_tpu.train import RunConfig, SRRunManager

    provider = SyntheticSRProvider(n_train=2, n_valid=1, hr_size=8,
                                   train_batch_size=2)
    results = {}
    for name, dws, cons in (("masked", False, None),
                            ("dw_full", True, None),
                            ("dw_live", True, {"expand_candidates": [3]})):
        rc = RunConfig(n_epochs=1, base_lr=1e-2, image_size=8,
                       train_batch_size=2, dw_switch=dws,
                       validation_frequency=10, print_frequency=100,
                       manual_seed=0)
        rm = SRRunManager(str(tmp_path / name), OFAMobileNetS4(SMALL), rc,
                          provider)
        rm.train(constraints=cons)
        results[name] = rm
    # constrained sampling changes the archs, so compare dw_live against a
    # masked run under the SAME constraints instead of against dw_full
    rc = RunConfig(n_epochs=1, base_lr=1e-2, image_size=8,
                   train_batch_size=2, dw_switch=False,
                   validation_frequency=10, print_frequency=100,
                   manual_seed=0)
    rm_ref = SRRunManager(str(tmp_path / "masked_cons"), OFAMobileNetS4(SMALL),
                          rc, provider)
    rm_ref.train(constraints={"expand_candidates": [3]})
    live = results["dw_live"]
    assert live.trainer.net.dw_opts == {"live": (None, (3,))}
    # the sliced dw's reduction tiling differs from the masked full-width
    # conv's at the ULP level (same basis as test_dw_switch_cls_mbv3_exact);
    # an epoch of Adam amplifies that through the sqrt(v) normalizer —
    # measured max drift 2e-4 on one element of 1600 after 1 epoch
    for a, b in zip(jax.tree.leaves(live.params),
                    jax.tree.leaves(rm_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)
    # eval with the narrowing active, on an arch OUTSIDE the live e list:
    # make_eval_step strips 'live', so this must match the masked manager's
    # validate bit-for-bit given identical params
    from ofa_sr_tpu.models.arch import uniform_subnet
    cfg = uniform_subnet(SMALL, 7, 2, 2, 1)  # e=2 not in live (3,)
    l_live, p_live = live.validate(cfg)
    rm_ref.params, rm_ref.state = live.params, live.state
    l_ref, p_ref = rm_ref.validate(cfg)
    assert abs(p_live - p_ref) < 1e-4 and abs(l_live - l_ref) < 1e-6


def test_dw_switch_trainer_gradients_match():
    net_a = OFAMobileNetS4(SMALL)
    p, s = net_a.init(jax.random.PRNGKey(1))
    batch = {
        "image": jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 3), jnp.float32),
        "x2": jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 3), jnp.float32),
        "x4": jnp.asarray(np.random.RandomState(3).rand(2, 4, 4, 3), jnp.float32),
    }
    arch = (sample_subnet(SMALL, seed=5).to_device(SMALL),)

    results = []
    for dws in (False, True, "project"):
        net = OFAMobileNetS4(SMALL)
        tr = SRTrainer(net, opt_type="sgd", weight_decay=0.0, dw_switch=dws)
        opt = tr.init_opt_state(p)
        step = tr.make_train_step(n_subnets=1, donate=False)
        p1, _, _, m = step(p, s, opt, batch, arch, jnp.asarray(1e-2))
        results.append((p1, float(m["loss"])))
    for other in results[1:]:
        assert abs(results[0][1] - other[1]) < 1e-6
        for a, b in zip(jax.tree.leaves(results[0][0]),
                        jax.tree.leaves(other[0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
