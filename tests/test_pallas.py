"""Pallas fused MBConv vs the XLA composition (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.ops.pallas.mbconv import fused_mbconv_infer, mbconv_reference


def _weights(c, m, ks, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        ib_w=jnp.asarray(rng.randn(c, m).astype(np.float32) * 0.1),
        ib_b=jnp.asarray(rng.randn(m).astype(np.float32) * 0.1),
        dw_w=jnp.asarray(rng.randn(ks, ks, m).astype(np.float32) * 0.1),
        dw_b=jnp.asarray(rng.randn(m).astype(np.float32) * 0.1),
        pl_w=jnp.asarray(rng.randn(m, c).astype(np.float32) * 0.1),
        pl_b=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
    )


def test_fused_mbconv_matches_reference_all_kernels():
    rng = np.random.RandomState(1)
    c, m = 8, 16
    x = jnp.asarray(rng.randn(2, 16, 16, c).astype(np.float32))
    for ks in (3, 5, 7):
        w = _weights(c, m, ks, seed=ks)
        ref = mbconv_reference(x, **w)
        got = fused_mbconv_infer(x, w["ib_w"], w["ib_b"], w["dw_w"],
                                 w["dw_b"], w["pl_w"], w["pl_b"],
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_fused_mbconv_multi_strip_and_chunk():
    """Shapes that force n_t > 1 row strips (halo from neighbor blocks) and
    width > 128 (multiple W chunks inside the kernel)."""
    from ofa_sr_tpu.ops.pallas.mbconv import _pick_tile, _strip_rows
    rng = np.random.RandomState(4)
    c, m, ks = 8, 16, 5
    h, w_ = 64, 256
    assert _strip_rows(h, w_, c, ks // 2) < h      # multiple strips
    assert _pick_tile(w_, lo=8, hi=128) < w_       # multiple chunks
    x = jnp.asarray(rng.randn(1, h, w_, c).astype(np.float32))
    w = _weights(c, m, ks, seed=11)
    ref = mbconv_reference(x, **w)
    got = fused_mbconv_infer(x, w["ib_w"], w["ib_b"], w["dw_w"], w["dw_b"],
                             w["pl_w"], w["pl_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_mbconv_no_residual():
    rng = np.random.RandomState(2)
    c, m, ks = 8, 16, 5
    x = jnp.asarray(rng.randn(1, 24, 24, c).astype(np.float32))
    w = _weights(c, m, ks)
    ref = mbconv_reference(x, residual=False, **w)
    got = fused_mbconv_infer(x, w["ib_w"], w["ib_b"], w["dw_w"], w["dw_b"],
                             w["pl_w"], w["pl_b"], residual=False,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_mbconv_fallback_on_odd_shapes():
    """Prime spatial dims don't tile -> the XLA fallback must kick in."""
    rng = np.random.RandomState(3)
    c, m, ks = 8, 16, 3
    x = jnp.asarray(rng.randn(1, 7, 13, c).astype(np.float32))
    w = _weights(c, m, ks)
    ref = mbconv_reference(x, **w)
    got = fused_mbconv_infer(x, w["ib_w"], w["ib_b"], w["dw_w"], w["dw_b"],
                             w["pl_w"], w["pl_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_shuffle_tail_interpret():
    """conv5x5+BN-folded-bias+PixelShuffle(2) fused kernel == XLA
    composition (interpret mode; HW execution is benchmarked separately)."""
    import jax.numpy as jnp
    import numpy as np

    from ofa_sr_tpu.ops.pallas.shuffle_tail import (
        fused_shuffle_tail,
        shuffle_tail_reference,
    )
    rng = np.random.RandomState(7)
    # h=32 forces two row strips (t=16), exercising the shifted-view halo
    for h, w_ in ((12, 16), (6, 8), (32, 16)):
        x = jnp.asarray(rng.rand(2, h, w_, 64), jnp.float32)
        w = jnp.asarray(rng.randn(5, 5, 64, 256) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(256) * 0.1, jnp.float32)
        y_ref = shuffle_tail_reference(x, w, b)
        y_pal = fused_shuffle_tail(x, w, b, interpret=True)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)


def test_materialized_subnet_pallas_tail_fallback():
    """use_pallas=True on CPU routes through the dispatcher's XLA fallback
    and matches the plain materialized subnet exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace
    from ofa_sr_tpu.models.arch import uniform_subnet
    from ofa_sr_tpu.models.materialize import get_active_subnet

    space = SearchSpace(ks_list=[3, 5], expand_list=[3], depth_list=[2],
                        pixel_d_list=[1, 2], n_stages=2, width=16)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(3))
    cfg = uniform_subnet(space, 5, 3, 2, 2)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 8, 8, 3), np.float32)
    # fold_tail=False: use_pallas disables the fold, and this test pins the
    # pallas DISPATCHER fallback (not the fold) — compare like with like
    y1 = get_active_subnet(net, p, s, cfg, fold_tail=False)(x)
    y2 = get_active_subnet(net, p, s, cfg, use_pallas=True)(x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


# ---------------------------------------------------------------------------
# Pallas BN statistics (ops/pallas/bn_stats.py, ops/pallas/bn.py)
# ---------------------------------------------------------------------------

def test_bn_moments_pallas_matches_xla():
    from ofa_sr_tpu.ops.norm import batch_moments
    from ofa_sr_tpu.ops.pallas.bn_stats import bn_moments_pallas
    rng = np.random.RandomState(0)
    for shape in [(16, 12, 12, 64), (2, 7, 5, 64), (3, 9, 9, 256),
                  (2, 6, 6, 384)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        m0, v0 = batch_moments(x)
        m1, v1 = bn_moments_pallas(x, interpret=True)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                   rtol=1e-5, atol=1e-5)


def test_bn_train_fused_forward_and_grads_match():
    """bn_train_fused == the XLA training branch of batch_norm: outputs and
    gradients wrt (x, scale, bias), including the lane-folded C=64 case."""
    from ofa_sr_tpu.ops.norm import batch_norm, bn_init
    from ofa_sr_tpu.ops.pallas.bn import bn_train_fused
    rng = np.random.RandomState(1)
    for c in (64, 256):
        x = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
        params, state = bn_init(c)
        params = {"scale": params["scale"] * 1.3 + 0.1,
                  "bias": params["bias"] + 0.2}

        def loss_xla(x, sc, bi):
            y, _ = batch_norm(x, {"scale": sc, "bias": bi}, state,
                              training=True)
            return jnp.sum(y * y)

        def loss_pl(x, sc, bi):
            y, m, v = bn_train_fused(x, sc, bi, 1e-5, True)
            return jnp.sum(y * y)

        a0 = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
            x, params["scale"], params["bias"])
        a1 = jax.value_and_grad(loss_pl, argnums=(0, 1, 2))(
            x, params["scale"], params["bias"])
        np.testing.assert_allclose(a0[0], a1[0], rtol=1e-5)
        for g0, g1 in zip(a0[1], a1[1]):
            np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                       rtol=1e-4, atol=1e-4)


def test_batch_norm_pallas_env_path(monkeypatch):
    """batch_norm with OFA_SR_TPU_PALLAS_BN=interpret matches the default
    path: output, updated state, masked channels."""
    from ofa_sr_tpu.ops import norm
    rng = np.random.RandomState(2)
    c = 64
    x = jnp.asarray(rng.randn(2, 6, 6, c).astype(np.float32))
    params, state = norm.bn_init(c)
    mask = jnp.asarray((np.arange(c) < 40).astype(np.float32))
    y0, s0 = norm.batch_norm(x, params, state, training=True, mask=mask)
    monkeypatch.setenv("OFA_SR_TPU_PALLAS_BN", "interpret")
    y1, s1 = norm.batch_norm(x, params, state, training=True, mask=mask)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(s0[k]), np.asarray(s1[k]),
                                   rtol=1e-5, atol=1e-6)


def test_trainer_step_with_pallas_bn(monkeypatch):
    """A full SRTrainer step under remat='all_save_bn' with the Pallas BN
    path (interpret) matches the XLA path: loss and updated params."""
    from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet
    from ofa_sr_tpu.train import SRTrainer
    space = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1, 2],
                        pixel_d_list=[1], n_stages=2, width=8)
    net = OFAMobileNetS4(space)
    p, s = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32),
        "x2": jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32),
        "x4": jnp.asarray(rng.rand(2, 4, 4, 3), jnp.float32),
    }
    arch = (sample_subnet(space, seed=3).to_device(space),)
    res = []
    for env in ("", "interpret"):
        monkeypatch.setenv("OFA_SR_TPU_PALLAS_BN", env)
        tr = SRTrainer(OFAMobileNetS4(space), opt_type="sgd",
                       weight_decay=0.0, remat="all_save_bn")
        opt = tr.init_opt_state(p)
        step = tr.make_train_step(n_subnets=1, donate=False)
        p1, s1, _, m = step(p, s, opt, batch, arch, jnp.asarray(1e-2))
        res.append((p1, s1, float(m["loss"])))
    assert abs(res[0][2] - res[1][2]) < 1e-6
    for a, b in zip(jax.tree.leaves(res[0][0]), jax.tree.leaves(res[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(res[0][1]), jax.tree.leaves(res[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
