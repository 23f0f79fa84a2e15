"""s2d execution mode == masked execution (forward, BN state, grads).

s2d re-lays the LR trunk stream (B,H,W,C) -> (B,H/2,W/2,4C) and executes
every MBConv in that layout (ops/s2d.py): block-diagonal 1x1s (4x-deep MXU
contractions), phase-pair depthwise convs (same MACs), BN moments over
phases-folded-to-spatial (identical value set). Equivalence basis is in the
ops/s2d.py module docstring; these tests pin it numerically at full-model
and trainer granularity, like tests/test_ks_switch.py does for ks_switch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
from ofa_sr_tpu.ops.conv import depthwise_conv2d
from ofa_sr_tpu.ops.s2d import depthwise_s2d, s2d, un_s2d
from ofa_sr_tpu.train import SRTrainer

SMALL = SearchSpace(ks_list=[3, 5, 7], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=2, width=8)


def test_s2d_roundtrip_and_depthwise_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 12, 16, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(un_s2d(s2d(x))), np.asarray(x))
    for k in (3, 5, 7):
        w = jnp.asarray(rng.randn(k, k, 1, 5).astype(np.float32))
        ref = depthwise_conv2d(x, w)
        got = un_s2d(depthwise_s2d(s2d(x), w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_s2d_matches_masked_forward_and_state():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    seen_pd = set()
    for seed in range(6):
        cfg = sample_subnet(SMALL, seed=seed)
        seen_pd.add(cfg.pixel_d)
        arch = cfg.to_device(SMALL)
        net.s2d = False
        y0, s0 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        net.s2d = True
        y1, s1 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    net.s2d = False
    assert seen_pd == {1, 2}


def test_s2d_odd_spatial_falls_back():
    """Odd LR dims can't relayout; the forward silently uses the masked
    path (the guard in OFAMobileNetS4.apply)."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 7, 9, 3).astype(np.float32))
    cfg = sample_subnet(SMALL, seed=0)
    arch = cfg.to_device(SMALL)
    net.s2d = True
    y1, _ = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=False)
    net.s2d = False
    y0, _ = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_s2d_trainer_gradients_match():
    net_a = OFAMobileNetS4(SMALL)
    p, s = net_a.init(jax.random.PRNGKey(1))
    batch = {
        "image": jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 3), jnp.float32),
        "x2": jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 3), jnp.float32),
        "x4": jnp.asarray(np.random.RandomState(3).rand(2, 4, 4, 3), jnp.float32),
    }
    arch = (sample_subnet(SMALL, seed=5).to_device(SMALL),)

    results = []
    for use_s2d in (False, True):
        net = OFAMobileNetS4(SMALL)
        tr = SRTrainer(net, opt_type="sgd", weight_decay=0.0, s2d=use_s2d)
        opt = tr.init_opt_state(p)
        step = tr.make_train_step(n_subnets=1, donate=False)
        p1, _, _, m = step(p, s, opt, batch, arch, jnp.asarray(1e-2))
        results.append((p1, float(m["loss"])))
    assert abs(results[0][1] - results[1][1]) < 1e-6
    for a, b in zip(jax.tree.leaves(results[0][0]),
                    jax.tree.leaves(results[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
