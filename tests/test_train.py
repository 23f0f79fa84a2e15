"""Trainer: LR schedule golden values, torch-optimizer parity, train step
behaviour, and the 8-device data-parallel mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
from ofa_sr_tpu.models.arch import max_subnet, uniform_subnet
from ofa_sr_tpu.parallel import make_mesh, shard_batch, shard_params
from ofa_sr_tpu.train import SRTrainer, lr_at_step, make_optimizer, no_decay_mask

SMALL = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                    pixel_d_list=[1, 2], n_stages=2, width=8)


def _batch(b=2, hr=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.rand(b, hr, hr, 3).astype(np.float32)),
        "x2": jnp.asarray(rng.rand(b, hr // 2, hr // 2, 3).astype(np.float32)),
        "x4": jnp.asarray(rng.rand(b, hr // 4, hr // 4, 3).astype(np.float32)),
    }


def test_lr_schedule_cosine_and_warmup():
    # cosine: lr(0,0) == init, midpoint == init/2, reference formula
    assert abs(lr_at_step(1e-3, 0, 0, 100, 10) - 1e-3) < 1e-12
    mid = lr_at_step(1e-3, 5, 0, 100, 10)
    assert abs(mid - 0.5e-3) < 1e-9
    # warmup_lr=-1 resolves to init -> constant during warmup
    w = lr_at_step(1e-3, 0, 3, 100, 10, warmup_epochs=5, warmup_lr=-1)
    assert abs(w - 1e-3) < 1e-12
    # explicit warmup_lr: linear ramp, T_cur = e*nB + b + 1
    w0 = lr_at_step(1e-3, 0, 0, 100, 10, warmup_epochs=2, warmup_lr=0.0)
    assert abs(w0 - (1.0 / 200) * 1e-3) < 1e-12


def test_adam_matches_torch_including_weight_decay():
    """Our chain (add_decayed_weights -> scale_by_adam -> scale(-1)) * lr must
    reproduce torch.optim.Adam with param-group weight_decay."""
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    params = {"conv": {"w": jnp.asarray(w0)}}
    wd, lr = 3e-5, 1e-3

    tx = make_optimizer("adam", weight_decay=wd)
    opt_state = tx.init(params)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([{"params": [wt], "weight_decay": wd}], lr=lr)

    p = params
    for i in range(5):
        g_np = rng.randn(4, 3).astype(np.float32)
        g = {"conv": {"w": jnp.asarray(g_np)}}
        updates, opt_state = tx.update(g, opt_state, p)
        p = jax.tree.map(lambda a, u: a + lr * u, p, updates)

        wt.grad = torch.from_numpy(g_np.copy())
        topt.step()

    np.testing.assert_allclose(np.asarray(p["conv"]["w"]),
                               wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_sgd_nesterov_matches_torch():
    rng = np.random.RandomState(1)
    w0 = rng.randn(5).astype(np.float32)
    params = {"w": jnp.asarray(w0)}
    lr, mom = 0.03, 0.9

    tx = make_optimizer("sgd", weight_decay=0.0, momentum=mom, nesterov=True)
    opt_state = tx.init(params)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([wt], lr=lr, momentum=mom, nesterov=True)

    p = params
    for i in range(4):
        g_np = rng.randn(5).astype(np.float32)
        updates, opt_state = tx.update({"w": jnp.asarray(g_np)}, opt_state, p)
        p = jax.tree.map(lambda a, u: a + lr * u, p, updates)
        wt.grad = torch.from_numpy(g_np.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(p["w"]), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_no_decay_mask_structure():
    net = OFAMobileNetS4(SMALL)
    p, _ = net.init(jax.random.PRNGKey(0))
    mask = no_decay_mask(p)
    # conv kernels decay
    assert mask["dec_first_conv_block"]["conv"]["w"] is True
    # BN params do not
    assert mask["dec_first_conv_block"]["bn"]["scale"] is False
    assert mask["blocks"][0]["point_linear"]["bn"]["bias"] is False
    # kernel-transform matrices DO decay (reference quirk)
    assert mask["blocks"][0]["depth_conv"]["kt"]["5to3"] is True


def test_train_step_multi_subnet_reduces_loss():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(0))
    trainer = SRTrainer(net, opt_type="adam", weight_decay=3e-5)
    opt = trainer.init_opt_state(p)
    step = trainer.make_train_step(n_subnets=2, donate=False)

    batch = _batch()
    archs = tuple(sample_subnet(SMALL, seed=i, n_trunks=1).to_device(SMALL)
                  for i in range(2))
    p1, s1, opt1, m1 = step(p, s, opt, batch, archs, jnp.asarray(1e-2))
    loss0 = float(m1["loss"])
    for _ in range(24):
        p1, s1, opt1, m1 = step(p1, s1, opt1, batch, archs, jnp.asarray(1e-2))
    _, _, _, m_final = step(p1, s1, opt1, batch, archs, jnp.asarray(0.0))
    assert float(m_final["loss"]) < 0.5 * loss0, (float(m_final["loss"]), loss0)
    assert np.isfinite(float(m_final["psnr"]))


def test_train_step_pixel_d_branches_one_compile():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(1))
    trainer = SRTrainer(net)
    opt = trainer.init_opt_state(p)
    step = trainer.make_train_step(n_subnets=1, donate=False)
    batch = _batch()
    a1 = uniform_subnet(SMALL, 3, 2, 2, 1).to_device(SMALL)
    a2 = uniform_subnet(SMALL, 3, 2, 2, 2).to_device(SMALL)
    r1 = step(p, s, opt, batch, (a1,), jnp.asarray(1e-3))
    r2 = step(p, s, opt, batch, (a2,), jnp.asarray(1e-3))
    # different pixel_d must give different outputs through different branches
    assert abs(float(r1[3]["loss"]) - float(r2[3]["loss"])) > 0
    assert step._cache_size() == 1


def test_frozen_bn_mode_keeps_running_stats():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(2))
    trainer = SRTrainer(net, bn_frozen=True)
    opt = trainer.init_opt_state(p)
    step = trainer.make_train_step(n_subnets=1, donate=False)
    arch = max_subnet(SMALL).to_device(SMALL)
    _, s1, _, _ = step(p, s, opt, _batch(), (arch,), jnp.asarray(1e-3))
    m0 = np.asarray(s["blocks"][0]["depth_conv"]["bn"]["mean"])
    m1 = np.asarray(s1["blocks"][0]["depth_conv"]["bn"]["mean"])
    np.testing.assert_array_equal(m0, m1)


def test_data_parallel_mesh_matches_single_device():
    """Sharded global-batch step == unsharded step (the psum is exact)."""
    assert jax.device_count() >= 8
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(3))
    # SGD: the update is linear in the gradient, so tolerances are
    # meaningful (Adam's first step is ~sign(g), which amplifies benign
    # reduction-order noise on near-zero grads into +-2lr param diffs).
    trainer = SRTrainer(net, opt_type="sgd", weight_decay=0.0)
    opt = trainer.init_opt_state(p)
    step = trainer.make_train_step(n_subnets=1, donate=False)
    batch = _batch(b=8)
    arch = max_subnet(SMALL).to_device(SMALL)

    p_ref, _, _, m_ref = step(p, s, opt, batch, (arch,), jnp.asarray(1e-2))

    mesh = make_mesh()
    p_sh = shard_params(p, mesh)
    s_sh = shard_params(s, mesh)
    opt_sh = shard_params(opt, mesh)
    arch_sh = shard_params(arch, mesh)
    batch_sh = shard_batch(batch, mesh)
    p_dp, _, _, m_dp = step(p_sh, s_sh, opt_sh, batch_sh, (arch_sh,),
                            jnp.asarray(1e-2))

    # sharded reduction order differs -> small float noise
    assert abs(float(m_ref["loss"]) - float(m_dp["loss"])) < 1e-5
    l_ref = jax.tree.leaves(p_ref)
    l_dp = jax.tree.leaves(p_dp)
    for a, b in zip(l_ref, l_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_eval_step():
    net = OFAMobileNetS4(SMALL)
    p, s = net.init(jax.random.PRNGKey(4))
    trainer = SRTrainer(net)
    ev = trainer.make_eval_step()
    out = ev(p, s, _batch(), max_subnet(SMALL).to_device(SMALL))
    assert out["output"].shape == (2, 16, 16, 3)
    assert np.isfinite(float(out["psnr"]))


def test_touched_kernel_transform_masks():
    """The touched masks must gate the kernel-transform matrices by the
    executed kernel sizes: ks=7 touches none, ks=5 touches 7to5, ks=3
    touches both; depth-skipped blocks are fully untouched."""
    import jax
    import numpy as np

    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    from ofa_sr_tpu.models.arch import SubnetConfig
    from ofa_sr_tpu.train.touched import sr_touched_mask

    space = SearchSpace(ks_list=[3, 5, 7], expand_list=[3], depth_list=[1, 2],
                        pixel_d_list=[1, 2], n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    p, _ = net.init(jax.random.PRNGKey(0))
    n = space.blocks_per_trunk
    cfg = SubnetConfig(ks=(7, 3, 5, 3), e=(3,) * n, d=(2, 1), pixel_d=1)
    t = sr_touched_mask(net, p, [cfg])

    kt0 = t["blocks"][0]["depth_conv"]["kt"]
    assert kt0 == {"7to5": False, "5to3": False}          # ks=7
    kt1 = t["blocks"][1]["depth_conv"]["kt"]
    assert kt1 == {"7to5": True, "5to3": True}            # ks=3
    kt2 = t["blocks"][2]["depth_conv"]["kt"]
    assert kt2 == {"7to5": True, "5to3": False}           # ks=5
    # stage 1 depth=1: block 3 never executes -> fully untouched
    assert not any(jax.tree.leaves(t["blocks"][3]))
    # shuffle head: pixel_d=1 -> second shuffle block untouched
    assert all(jax.tree.leaves(t["shuffle_blocks"][0]))
    assert not any(jax.tree.leaves(t["shuffle_blocks"][1]))
    # mask tree structure matches the params tree (TorchOpt tree.map works)
    jax.tree.map(lambda a, b: None, p, t)


def test_remat_modes_same_gradients():
    """All remat modes are pure scheduling: loss and gradients must agree
    (to float tolerance — rematerialization reorders fusions) across
    False/True/'pair'/'all'."""
    net = OFAMobileNetS4(SMALL)
    params, state = net.init(jax.random.PRNGKey(0))
    batch = _batch()
    arch = uniform_subnet(SMALL, ks=5, e=3, d=2, pixel_d=1).to_device(SMALL)

    outs = []
    for remat in (False, True, "pair", "all"):
        tr = SRTrainer(net, opt_type="adam", weight_decay=3e-5, remat=remat)

        @jax.jit
        def lossgrad(p):
            (loss, (st, _)), g = jax.value_and_grad(
                tr._subnet_loss, has_aux=True)(p, state, batch, arch, None)
            return loss, g, st
        outs.append(lossgrad(params))

    loss0, g0, st0 = outs[0]
    for loss, g, st in outs[1:]:
        assert abs(float(loss) - float(loss0)) < 1e-6
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(st0), jax.tree.leaves(st)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_bf16_compute_dtype_close_to_f32():
    """Mixed precision: bf16 step runs, loss stays close to f32, params are
    updated in f32 (master copies), and the selective cast keeps BN params +
    kernel-transform matrices in f32."""
    from ofa_sr_tpu.train.train_step import cast_params_for_compute

    net = OFAMobileNetS4(SMALL)
    params, state = net.init(jax.random.PRNGKey(0))
    batch = _batch()
    arch = uniform_subnet(SMALL, ks=3, e=2, d=2, pixel_d=1).to_device(SMALL)

    cast = cast_params_for_compute(params, jnp.bfloat16)

    def check(path, a):
        keys = [getattr(k, "key", None) for k in path]
        if "bn" in keys or "kt" in keys:
            assert a.dtype == jnp.float32, path
        else:
            assert a.dtype == jnp.bfloat16, path
    jax.tree_util.tree_map_with_path(check, cast)

    losses = {}
    for cd in (None, jnp.bfloat16):
        tr = SRTrainer(net, opt_type="adam", weight_decay=3e-5,
                       compute_dtype=cd, remat=False)
        step = tr.make_train_step(n_subnets=1, donate=False)
        o = tr.init_opt_state(params)
        p, s, o, m = step(params, state, o, batch, (arch,), jnp.float32(1e-3))
        losses[cd] = float(m["loss"])
        for leaf in jax.tree.leaves(p):
            assert leaf.dtype == jnp.float32  # master params stay f32
    assert abs(losses[None] - losses[jnp.bfloat16]) < 0.02 * max(
        1.0, abs(losses[None]))
