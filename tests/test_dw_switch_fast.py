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
