"""Classification universe: MBV3/Proxyless supernets, trainer, run manager."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ofa_sr_tpu.data.cls_providers import SyntheticClsProvider
from ofa_sr_tpu.models.ofa_cls import (
    ElasticClassifierNet,
    OFAMobileNetV3,
    OFAProxylessNASNets,
    StageSpec,
)
from ofa_sr_tpu.train.cls_run_manager import ClsRunManager
from ofa_sr_tpu.train.cls_trainer import (
    ClsTrainer,
    cross_entropy,
    soft_target_ce,
    topk_accuracy,
)
from ofa_sr_tpu.train.run_manager import RunConfig


def _tiny_net(**kw):
    defaults = dict(n_classes=10,
                    stage_specs=[StageSpec(16, 2, "relu", False, 2),
                                 StageSpec(24, 2, "h_swish", True, 2)],
                    first_conv_width=8, first_conv_act="h_swish",
                    first_block_act="relu", final_expand_width=64,
                    feature_mix_width=96, ks_list=[3, 5], expand_list=[2, 3],
                    depth_list=[1, 2])
    defaults.update(kw)
    net = ElasticClassifierNet(**defaults)
    net._first_block_out = net.first_conv_width
    return net


def _x(b=2, s=32, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, s, s, 3).astype(np.float32))


def test_mbv3_forward_shapes():
    net = OFAMobileNetV3(n_classes=1000)
    p, s = net.init(jax.random.PRNGKey(0))
    arch = net.arch_to_device(net.max_arch())
    logits, _ = net.apply(p, s, _x(2, 32), arch, training=False)
    assert logits.shape == (2, 1000)


def test_proxyless_forward_shapes():
    net = OFAProxylessNASNets(n_classes=1000)
    p, s = net.init(jax.random.PRNGKey(1))
    arch = net.arch_to_device(net.max_arch())
    logits, _ = net.apply(p, s, _x(1, 32), arch, training=False)
    assert logits.shape == (1, 1000)


def test_cls_one_compile_many_subnets():
    net = _tiny_net()
    p, s = net.init(jax.random.PRNGKey(2))
    calls = {"n": 0}

    def fwd(pp, ss, x, arch):
        calls["n"] += 1
        return net.apply(pp, ss, x, arch, training=False)[0]

    jf = jax.jit(fwd)
    for seed in range(3):
        arch = net.arch_to_device(net.sample_arch(seed=seed))
        jf(p, s, _x(), arch).block_until_ready()
    assert calls["n"] == 1


def test_cls_depth_and_width_change_output():
    net = _tiny_net()
    p, s = net.init(jax.random.PRNGKey(3))
    x = _x()
    from ofa_sr_tpu.models.ofa_cls import ClsArch
    n = net.n_blocks
    a_max = net.max_arch()
    a_small = ClsArch(tuple([3] * n), tuple([2] * n), tuple([1, 1]))
    y1, _ = net.apply(p, s, x, net.arch_to_device(a_max))
    y2, _ = net.apply(p, s, x, net.arch_to_device(a_small))
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, 8)
    for sm in (0.0, 0.1):
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), sm))
        ref = float(F.cross_entropy(torch.from_numpy(logits),
                                    torch.from_numpy(labels),
                                    label_smoothing=sm))
        assert abs(ours - ref) < 1e-5


def test_soft_target_ce_and_topk():
    rng = np.random.RandomState(1)
    logits = rng.randn(6, 5).astype(np.float32)
    soft = np.abs(rng.randn(6, 5).astype(np.float32))
    soft /= soft.sum(1, keepdims=True)
    ours = float(soft_target_ce(jnp.asarray(logits), jnp.asarray(soft)))
    ref = float(torch.mean(torch.sum(
        -torch.from_numpy(soft) * F.log_softmax(torch.from_numpy(logits), 1), 1)))
    assert abs(ours - ref) < 1e-5

    labels = np.argmax(logits, 1)
    assert float(topk_accuracy(jnp.asarray(logits), jnp.asarray(labels), 1)) == 100.0


def test_cls_trainer_reduces_loss():
    net = _tiny_net()
    p, s = net.init(jax.random.PRNGKey(4))
    tr = ClsTrainer(net, opt_type="sgd", weight_decay=0.0, label_smoothing=0.0)
    opt = tr.init_opt_state(p)
    step = tr.make_train_step(n_subnets=2)
    rng = np.random.RandomState(2)
    batch = {"image": jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 10, 8))}
    archs = tuple(net.arch_to_device(net.sample_arch(seed=i)) for i in range(2))
    key = jax.random.PRNGKey(0)
    l0 = None
    for i in range(15):
        p, s, opt, m = step(p, s, opt, batch, archs, jnp.asarray(0.1),
                            jax.random.fold_in(key, i))
        if l0 is None:
            l0 = float(m["loss"])
    assert float(m["loss"]) < l0


def test_cls_run_manager_end_to_end(tmp_path):
    net = _tiny_net()
    cfg = RunConfig(n_epochs=1, base_lr=0.05, opt_type="sgd",
                    train_batch_size=16, print_frequency=1,
                    validation_frequency=1)
    prov = SyntheticClsProvider(n_train=32, n_test=16, image_size=32,
                                train_batch_size=16, test_batch_size=16)
    rm = ClsRunManager(str(tmp_path), net, cfg, prov)
    best = rm.train()
    assert np.isfinite(best)
    loss, top1, top5 = rm.validate()
    assert 0 <= top1 <= 100 and top5 >= top1
    # canonical OFA eval path: BN recalibration on a subnet
    rm.reset_running_statistics(net.sample_arch(seed=0), n_images=16,
                                batch_size=8)


def test_cls_kd_teacher_path(tmp_path):
    teacher = _tiny_net()
    tp, ts = teacher.init(jax.random.PRNGKey(5))
    net = _tiny_net()
    cfg = RunConfig(n_epochs=1, base_lr=0.05, opt_type="sgd", kd_ratio=1.0,
                    kd_type="ce", train_batch_size=16, print_frequency=1)
    prov = SyntheticClsProvider(n_train=16, n_test=16, image_size=32,
                                train_batch_size=16, test_batch_size=16)
    rm = ClsRunManager(str(tmp_path), net, cfg, prov,
                       teacher=(teacher, tp, ts, teacher.max_arch()))
    best = rm.train()
    assert np.isfinite(best)


def test_cls_trainer_bf16_close_to_f32():
    """Mixed-precision cls step: runs, master params stay f32, loss within
    tolerance of the f32 step."""
    net = _tiny_net()
    p, s = net.init(jax.random.PRNGKey(5))
    rng = np.random.RandomState(3)
    batch = {"image": jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 10, 8))}
    arch = net.arch_to_device(net.sample_arch(seed=1))
    key = jax.random.PRNGKey(0)
    losses = {}
    for cd in (None, jnp.bfloat16):
        tr = ClsTrainer(net, opt_type="sgd", weight_decay=0.0,
                        label_smoothing=0.0, compute_dtype=cd)
        opt = tr.init_opt_state(p)
        step = tr.make_train_step(n_subnets=1)
        p1, _, _, m = step(p, s, opt, batch, (arch,), jnp.asarray(0.1), key)
        losses[cd] = float(m["loss"])
        for leaf in jax.tree.leaves(p1):
            assert leaf.dtype == jnp.float32
    assert abs(losses[None] - losses[jnp.bfloat16]) < 0.05 * max(
        1.0, abs(losses[None]))


def test_cls_scan_matches_sequential_steps():
    """ClsTrainer.make_scan_train_step == sequential make_train_step calls
    (same per-step rngs/archs/touched), incl. KD."""
    from ofa_sr_tpu.train.touched import cls_touched_mask

    teacher = _tiny_net()
    tp, ts = teacher.init(jax.random.PRNGKey(9))
    t_arch = teacher.arch_to_device(teacher.max_arch())

    net = _tiny_net()
    p0, s0 = net.init(jax.random.PRNGKey(3))
    tr = ClsTrainer(net, opt_type="sgd", weight_decay=3e-5, kd_ratio=0.5,
                    teacher_net=teacher)
    opt0 = tr.init_opt_state(p0)
    teacher_kw = dict(teacher_params=tp, teacher_state=ts,
                      teacher_arch=t_arch)

    n = 3
    rng = np.random.RandomState(0)
    batches = {
        "image": jnp.asarray(rng.rand(n, 2, 16, 16, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 10, (n, 2)), jnp.int32),
    }
    cfgs = [net.sample_arch(seed=i) for i in range(n)]
    archs = [net.arch_to_device(c) for c in cfgs]
    toucheds = [cls_touched_mask(net, p0, [c]) for c in cfgs]
    rngs = jnp.stack([jax.random.PRNGKey(100 + i) for i in range(n)])
    lrs = jnp.full((n,), 1e-2, jnp.float32)

    step = tr.make_train_step(n_subnets=1, **teacher_kw)
    pp, ss, oo = p0, s0, opt0
    losses = []
    for i in range(n):
        b = jax.tree.map(lambda x: x[i], batches)
        pp, ss, oo, m = step(pp, ss, oo, b, (archs[i],), lrs[i], rngs[i],
                             toucheds[i])
        losses.append(float(m["loss"]))

    scan = tr.make_scan_train_step(n_subnets=1, **teacher_kw)
    stacked_archs = (jax.tree.map(lambda *xs: jnp.stack(xs), *archs),)
    stacked_touched = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *toucheds)
    p2, s2, o2, m2 = scan(p0, s0, opt0, batches, stacked_archs, lrs, rngs,
                          stacked_touched)

    assert abs(float(m2["loss"]) - float(np.mean(losses))) < 1e-5
    for a, b in zip(jax.tree.leaves(pp), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(ss), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
