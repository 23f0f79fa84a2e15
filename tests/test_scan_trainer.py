"""Device-side scan trainer == sequential steps."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
from ofa_sr_tpu.train import SRTrainer

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=1, width=8)


def test_scan_matches_sequential_steps():
    net = OFAMobileNetS4(SMALL)
    p0, s0 = net.init(jax.random.PRNGKey(0))
    tr = SRTrainer(net, opt_type="sgd", weight_decay=0.0)
    opt0 = tr.init_opt_state(p0)

    n_inner, bs = 3, 2
    rng = np.random.RandomState(0)
    batches = {
        "image": jnp.asarray(rng.rand(n_inner, bs, 16, 16, 3), jnp.float32),
        "x2": jnp.asarray(rng.rand(n_inner, bs, 8, 8, 3), jnp.float32),
        "x4": jnp.asarray(rng.rand(n_inner, bs, 4, 4, 3), jnp.float32),
    }
    cfgs = [sample_subnet(SMALL, seed=i) for i in range(n_inner)]
    arch_stack = jax.tree.map(lambda *a: jnp.stack(a),
                              *[c.to_device(SMALL) for c in cfgs])
    lrs = jnp.full((n_inner,), 1e-2, jnp.float32)

    scan_step = tr.make_scan_train_step(n_subnets=1, donate=False)
    p1, s1, o1, m1 = scan_step(p0, s0, opt0, batches, (arch_stack,), lrs)

    step = tr.make_train_step(n_subnets=1, donate=False)
    p2, s2, o2 = p0, s0, opt0
    losses = []
    for i in range(n_inner):
        b = jax.tree.map(lambda x: x[i], batches)
        a = (jax.tree.map(lambda x: x[i], arch_stack),)
        p2, s2, o2, m = step(p2, s2, o2, b, a, lrs[i])
        losses.append(float(m["loss"]))

    assert abs(float(m1["loss"]) - float(np.mean(losses))) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
