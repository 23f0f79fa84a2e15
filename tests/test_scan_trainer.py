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


def test_scan_with_touched_matches_plain_steps():
    """Scan steps with stacked touched masks == sequential plain steps with
    the same per-step masks (torch-exact optimizer semantics on the
    device-side multi-step path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
    from ofa_sr_tpu.train import SRTrainer
    from ofa_sr_tpu.train.touched import sr_touched_mask

    space = SearchSpace(ks_list=[3, 5], expand_list=[3, 4], depth_list=[1, 2],
                        pixel_d_list=[1], n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(0))
    tr = SRTrainer(net, opt_type="adam", weight_decay=3e-5)
    o = tr.init_opt_state(p)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32),
             "x2": jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)}
    n = 3
    cfgs = [sample_subnet(space, seed=i) for i in range(n)]
    archs = [c.to_device(space) for c in cfgs]
    toucheds = [sr_touched_mask(net, p, [c]) for c in cfgs]

    step = tr.make_train_step(n_subnets=1, donate=False)
    pp, ss, oo = p, s, o
    for i in range(n):
        pp, ss, oo, _ = step(pp, ss, oo, batch, (archs[i],),
                             jnp.asarray(1e-3), toucheds[i])

    scan = tr.make_scan_train_step(n_subnets=1, donate=False)
    batches = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape),
                           batch)
    stacked_archs = (jax.tree.map(lambda *xs: jnp.stack(xs), *archs),)
    stacked_touched = jax.tree.map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *toucheds)
    lrs = jnp.full((n,), 1e-3, jnp.float32)
    p2, s2, o2, _ = scan(p, s, o, batches, stacked_archs, lrs,
                         stacked_touched)

    for a, b in zip(jax.tree.leaves(pp), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_scan_kd_matches_plain_kd_steps():
    """KD on the scan path (VERDICT r2 §6): scan steps with a teacher ==
    sequential plain KD steps — the curriculum's KD phases can use the
    dispatch-amortized production mode."""
    teacher_space = SearchSpace(ks_list=[5], expand_list=[3], depth_list=[2],
                                pixel_d_list=[1], n_stages=1, width=8)
    teacher = OFAMobileNetS4(teacher_space)
    tp, ts = teacher.init(jax.random.PRNGKey(7))
    t_cfg = sample_subnet(teacher_space, seed=0)
    t_arch = t_cfg.to_device(teacher_space)

    net = OFAMobileNetS4(SMALL)
    p0, s0 = net.init(jax.random.PRNGKey(1))

    n_inner, bs = 3, 2
    rng = np.random.RandomState(1)
    batches = {
        "image": jnp.asarray(rng.rand(n_inner, bs, 16, 16, 3), jnp.float32),
        "x2": jnp.asarray(rng.rand(n_inner, bs, 8, 8, 3), jnp.float32),
        "x4": jnp.asarray(rng.rand(n_inner, bs, 4, 4, 3), jnp.float32),
    }
    cfgs = [sample_subnet(SMALL, seed=i + 10) for i in range(n_inner)]
    arch_stack = jax.tree.map(lambda *a: jnp.stack(a),
                              *[c.to_device(SMALL) for c in cfgs])
    lrs = jnp.full((n_inner,), 1e-2, jnp.float32)
    teacher_kw = dict(teacher_params=tp, teacher_state=ts,
                      teacher_arch=t_arch, teacher_pixel_d=1)

    tr = SRTrainer(net, opt_type="sgd", weight_decay=0.0, kd_ratio=1.0,
                   teacher_net=teacher)
    opt0 = tr.init_opt_state(p0)

    scan_step = tr.make_scan_train_step(n_subnets=1, donate=False,
                                        **teacher_kw)
    p1, s1, o1, m1 = scan_step(p0, s0, opt0, batches, (arch_stack,), lrs)

    step = tr.make_train_step(n_subnets=1, donate=False, **teacher_kw)
    p2, s2, o2 = p0, s0, opt0
    losses = []
    for i in range(n_inner):
        b = jax.tree.map(lambda x: x[i], batches)
        a = (jax.tree.map(lambda x: x[i], arch_stack),)
        p2, s2, o2, m = step(p2, s2, o2, b, a, lrs[i])
        losses.append(float(m["loss"]))

    # KD actually contributed: the KD-less trajectory differs
    tr_plain = SRTrainer(net, opt_type="sgd", weight_decay=0.0)
    plain_step = tr_plain.make_train_step(n_subnets=1, donate=False)
    p3, _, _, m3 = plain_step(
        p0, s0, tr_plain.init_opt_state(p0),
        jax.tree.map(lambda x: x[0], batches),
        (jax.tree.map(lambda x: x[0], arch_stack),), lrs[0])
    assert abs(float(m3["loss"]) - losses[0]) > 1e-4

    assert abs(float(m1["loss"]) - float(np.mean(losses))) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
