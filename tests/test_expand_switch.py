"""expand_switch (sliced-branch) execution == masked execution."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
from ofa_sr_tpu.train import SRTrainer

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=2, width=8)


def test_expand_switch_matches_masked_forward_and_state():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    for seed in range(4):
        cfg = sample_subnet(SMALL, seed=seed)
        arch = cfg.to_device(SMALL)
        net.expand_switch = False
        y0, s0 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        net.expand_switch = True
        y1, s1 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    net.expand_switch = False


def test_expand_switch_with_ks_switch_matches_masked():
    """advisor r2: ks_switch must stay exact inside the sliced-expand
    branches (it used to be silently dropped there)."""
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.RandomState(4).rand(2, 8, 8, 3).astype(np.float32))
    for seed in range(3):
        cfg = sample_subnet(SMALL, seed=seed)
        arch = cfg.to_device(SMALL)
        net.expand_switch = net.ks_switch = False
        y0, s0 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        net.expand_switch = net.ks_switch = True
        y1, s1 = net.apply(p, s, x, arch, pixel_d=cfg.pixel_d, training=True)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    net.expand_switch = net.ks_switch = False


def test_expand_switch_trainer_gradients_match():
    net_a = OFAMobileNetS4(SMALL)
    p, s = net_a.init(jax.random.PRNGKey(1))
    batch = {
        "image": jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 3), jnp.float32),
        "x2": jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 3), jnp.float32),
        "x4": jnp.asarray(np.random.RandomState(3).rand(2, 4, 4, 3), jnp.float32),
    }
    arch = (sample_subnet(SMALL, seed=5).to_device(SMALL),)

    results = []
    for es in (False, True):
        net = OFAMobileNetS4(SMALL)
        tr = SRTrainer(net, opt_type="sgd", weight_decay=0.0,
                       expand_switch=es)
        opt = tr.init_opt_state(p)
        step = tr.make_train_step(n_subnets=1, donate=False)
        p1, _, _, m = step(p, s, opt, batch, arch, jnp.asarray(1e-2))
        results.append((p1, float(m["loss"])))
    assert abs(results[0][1] - results[1][1]) < 1e-6
    for a, b in zip(jax.tree.leaves(results[0][0]), jax.tree.leaves(results[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
