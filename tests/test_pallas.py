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
