"""Fast-tier smoke for the dw_switch execution mode (one forward/state case;
the full exactness matrix — modes x widths x grads x cls — lives in the slow
module tests/test_dw_switch.py).

The space is the smallest one that still exercises a real (ks x width)
lax.switch: 2 kernel sizes x 2 widths = 4 branches, one stage, depth 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ofa_sr_tpu.models import OFAMobileNetS4, SearchSpace, sample_subnet

TINY = SearchSpace(ks_list=[3, 5], expand_list=[2, 3], depth_list=[1],
                   pixel_d_list=[1], n_stages=1, width=8)


def test_dw_live_lists_resolver():
    """Host-side branch-set resolution (layers._dw_live_lists): live-list
    narrowing, ks index remap, align rounding, bank-width capping."""
    from ofa_sr_tpu.models.layers import _dw_live_lists, mbconv_init

    space = SearchSpace(ks_list=[3, 5, 7], expand_list=[3, 4, 6],
                        depth_list=[2], pixel_d_list=[1], n_stages=1,
                        width=64)
    p, _ = mbconv_init(jax.random.PRNGKey(0), space)

    ks, mids, remap = _dw_live_lists(p, space, None)
    assert ks == [3, 5, 7] and mids == [192, 256, 384] and remap is None

    ks, mids, remap = _dw_live_lists(p, space, ((5, 7), (4, 6)))
    assert ks == [5, 7] and mids == [256, 384]
    assert list(np.asarray(remap)) == [1, 2]
    # global ks_idx 1 (ks=5) -> local 0; 2 (ks=7) -> local 1
    assert int(jnp.searchsorted(remap, 1)) == 0
    assert int(jnp.searchsorted(remap, 2)) == 1

    # align=128 rounds {192,256,384} -> {256,384}; capped at the bank width
    ks, mids, _ = _dw_live_lists(p, space, None, align=128)
    assert mids == [256, 384]
    ks, mids, _ = _dw_live_lists(p, space, None, align=512)
    assert mids == [384]


def test_dw_switch_smoke_forward_and_state():
    net = OFAMobileNetS4(TINY)
    p, s = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3),
                    jnp.float32)
    cfg = sample_subnet(TINY, seed=1)
    arch = cfg.to_device(TINY)
    net.dw_switch = False
    y0, s0 = net.apply(p, s, x, arch, pixel_d=1, training=True)
    net.dw_switch = True
    y1, s1 = net.apply(p, s, x, arch, pixel_d=1, training=True)
    net.dw_switch = False
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
