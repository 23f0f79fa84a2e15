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
    y1 = get_active_subnet(net, p, s, cfg)(x)
    y2 = get_active_subnet(net, p, s, cfg, use_pallas=True)(x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
